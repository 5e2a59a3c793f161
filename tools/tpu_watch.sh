#!/bin/bash
# TPU relay health watcher (CLAUDE.md relay gotchas).  Probes the EXEC and
# COMPILE paths separately every INTERVAL seconds, with distinct inputs each
# probe so the relay's response cache can't fake a pass (the 2026-08-19
# degraded-mode incident: cached executables still ran while fresh compiles
# hung, and shortly before wedging it replayed responses without executing).
#
#   bash tools/tpu_watch.sh &        # logs to /tmp/tpu_status.log
#
# When BOTH paths pass: touches /tmp/tpu_ok (mtime = last healthy probe).
# When unhealthy: removes /tmp/tpu_ok.  Consumers poll the marker file;
# nothing here runs benchmarks (keep the TPU free for the measuring session).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_status.log}
OK=/tmp/tpu_ok
INTERVAL=${INTERVAL:-300}

probe() {
  # Fresh python each probe: the compile cache is per-process, so a new
  # process genuinely exercises the remote-compile path.  Distinct random
  # inputs + a probe-unique graph shape defeat both relay caches.
  timeout "${PROBE_TIMEOUT:-240}" python - "$1" <<'EOF'
import sys, time
import numpy as np
import jax, jax.numpy as jnp

salt = int(sys.argv[1]) % 7  # vary the graph so compile is genuinely fresh
n = 128 + 8 * salt
t0 = time.time()
dev = jax.devices()
print(f"devices ok ({time.time()-t0:.1f}s): {dev}", flush=True)

# exec path: two distinct inputs through one graph; outputs must differ
a = jnp.asarray(np.random.rand(n, n).astype(np.float32))
b = jnp.asarray(np.random.rand(n, n).astype(np.float32))
f = jax.jit(lambda x: (x @ x).sum())
t0 = time.time()
ra, rb = float(f(a)), float(f(b))
assert ra != rb, "replay: identical outputs for distinct inputs"
print(f"exec ok ({time.time()-t0:.1f}s)", flush=True)

# compile path: a salt-shaped graph this process never compiled
g = jax.jit(lambda x: jnp.tanh(x @ x.T + salt).mean())
t0 = time.time()
float(g(a))
print(f"compile ok ({time.time()-t0:.1f}s)", flush=True)
print("HEALTHY", flush=True)
EOF
}

i=0
while true; do
  i=$((i + 1))
  ts=$(date -u +%Y-%m-%dT%H:%M:%SZ)
  out=$(probe "$i" 2>&1)
  if grep -q HEALTHY <<<"$out"; then
    echo "$ts probe $i HEALTHY" >>"$LOG"
    touch "$OK"
  else
    echo "$ts probe $i DOWN: $(tail -1 <<<"$out")" >>"$LOG"
    rm -f "$OK"
  fi
  sleep "$INTERVAL"
done
