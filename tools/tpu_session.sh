#!/bin/bash
# The round-3 hardware measurement session, scripted (CLAUDE.md measure-
# first list).  Run ALONE on the TPU host — no concurrent load (see the
# measurement-discipline notes in CLAUDE.md).  Logs everything under
# $OUT (default /tmp/tpu_session_<ts>).
#
#   bash tools/tpu_session.sh
#
# Order:
#   1. probe        one small matmul (fail fast if the relay is down)
#   2. ab_packed    packed head/FPN level grid, mnet b8 @640
#   3. ab_tail      decode/NMS tail knob grid
#   4. vit tests    RSFD_TEST_TPU=1 flash-attention parity on chip
#   5. bench        full bench.py (self-tunes the packed config)
#
# After: flip pipeline/detection.py packed defaults to ab_packed's winner,
# re-run bench if the winner differed from what it auto-picked, update
# CLAUDE.md / README numbers.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_session_$(date +%s)}
mkdir -p "$OUT"
echo "logging to $OUT"

run() {
  name=$1; shift
  echo "=== $name: $* (started $(date -u +%H:%M:%SZ))"
  if timeout "${STEP_TIMEOUT:-3600}" "$@" >"$OUT/$name.log" 2>&1; then
    echo "=== $name OK"
  else
    echo "=== $name FAILED (rc $?) — tail:"
    tail -5 "$OUT/$name.log"
  fi
}

run probe python -c "
import jax, jax.numpy as jnp
print(jax.devices())
x = jnp.ones((256, 256)); (x @ x).block_until_ready()
print('probe ok')"
grep -q "probe ok" "$OUT/probe.log" || { echo "TPU unreachable; aborting"; exit 1; }

run ab_packed python tools/ab_packed.py
run ab_tail python tools/ab_tail.py
run ab_scrfd python tools/ab_scrfd.py
run vit_tpu_tests env RSFD_TEST_TPU=1 python -m pytest \
    tests/test_vit_fused_attention.py tests/test_nms_pallas.py -q
run bench python bench.py

echo "=== summary"
for f in "$OUT"/*.log; do
  echo "--- $f"; tail -8 "$f"
done
