#!/bin/bash
# Round-5 hardware session, scripted in PRIORITY ORDER (see CLAUDE.md).
# Run ALONE on the TPU host — kill any background suite/training first
# (measurement discipline: 1 CPU core, concurrent load depresses numbers).
#
#   bash tools/tpu_session_r5.sh
#
# Order (evidence first, fragile last — the round-5 b16 TRACE capture is
# what wedged the relay on 2026-08-20, so it runs at the very end):
#   1. probe        fresh-compile probe (fail fast if the relay is down)
#   2. bench        full bench.py -> BENCH_LAST_GOOD.json, then COMMIT IT
#                   (the 2026-08-20 09:31Z refresh was lost with /tmp on a
#                   host reprovision because it was never committed)
#   3. fixture640   train the production-shape fixture on TPU (~15 min),
#                   eval the 640 collage gate, commit the npz if APs pass
#   4. ab_r50_batch exec-only b8/b16 stage-cut grid (VERDICT #7) — timing
#                   only, no trace capture
#   5. b16 trace    profile_detect --batch 16 (OPTIONAL, riskiest last)
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/tpu_session_r5_$(date +%s)}
mkdir -p "$OUT"
echo "logging to $OUT"

run() {
  name=$1; shift
  echo "=== $name: $* (started $(date -u +%H:%M:%SZ))"
  if timeout "${STEP_TIMEOUT:-3600}" "$@" >"$OUT/$name.log" 2>&1; then
    echo "=== $name OK"
    return 0
  else
    echo "=== $name FAILED (rc $?) — tail:"
    tail -5 "$OUT/$name.log"
    return 1
  fi
}

run probe python -c "
import jax, jax.numpy as jnp, numpy as np
print(jax.devices())
x = jnp.asarray(np.random.rand(300, 300).astype(np.float32))
print('sum', float((x @ x).sum()))
print('probe ok')"
grep -q "probe ok" "$OUT/probe.log" || { echo "TPU unreachable; aborting"; exit 1; }

if run bench python bench.py; then
  tail -1 "$OUT/bench.log"
  # Persist the capture of record IN GIT immediately (round-4 lesson).
  git add BENCH_LAST_GOOD.json && \
    git commit -m "bench: round-5 hardware capture (BENCH_LAST_GOOD refresh)" || true
fi

if [ ! -f tests/fixtures/trained_real640.npz ] || [ "${FORCE_FIXTURE:-0}" = 1 ]; then
  STEP_TIMEOUT=5400 run fixture640 python tools/make_fixture_640.py
  tail -8 "$OUT/fixture640.log"
fi

run ab_r50_batch python tools/ab_r50_batch.py --batches 8,16
tail -20 "$OUT/ab_r50_batch.log"

if [ "${SKIP_TRACE:-0}" != 1 ]; then
  run b16_trace python tools/profile_detect.py --backbone resnet50 \
      --batch 16 --stem s4d --cast-bf16
  tail -30 "$OUT/b16_trace.log"
fi

echo "=== summary"
for f in "$OUT"/*.log; do
  echo "--- $f"; tail -4 "$f"
done
