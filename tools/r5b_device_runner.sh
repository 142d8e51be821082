#!/bin/bash
# Round-5 final device batch: parity gate -> bench table -> traces -> headline.
# Sequential on purpose (single-tenant TPU; killing mid-compile wedges the
# compile service — CLAUDE.md). Every stage appends to /tmp/xr_r5b/.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_xr
mkdir -p /tmp/xr_r5b
LOG=/tmp/xr_r5b/runner.log
say() { echo "[r5b $(date +%H:%M:%S)] $*" >> "$LOG"; }

# ---- 1. compile-free health gate (safe to timeout-kill) -------------------
say "health gate"
ok=0
for i in $(seq 1 30); do
  if timeout 120 python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
x = jax.device_put(jnp.arange(8.0), d[0])
assert float(jax.device_get(x)[3]) == 3.0
print("health ok:", d)
EOF
  then ok=1; break; fi
  say "health attempt $i failed; sleeping 120s"
  sleep 120
done
if [ "$ok" != 1 ]; then say "BACKEND DOWN — aborting"; exit 1; fi

# ---- 2. small warm compile (huge timeout; never kill mid-compile) ---------
say "warm compile probe"
python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
a = jnp.ones((512, 512))
print("matmul ok:", float(jax.jit(lambda x: (x @ x).sum())(a)))
EOF

# ---- 3. device parity suite (the correctness gate) -------------------------
say "device parity suite"
XR_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu -q \
  > /tmp/xr_r5b/suite.log 2>&1
say "suite rc=$? tail: $(tail -1 /tmp/xr_r5b/suite.log)"

# ---- 4. full bench table (new defaults: ymask on, z gates off) -------------
say "bench_all"
python tools/bench_all.py --frames 20 > /tmp/xr_r5b/bench_all.log 2>&1
say "bench_all rc=$?"

# ---- 5. fresh per-op traces for attribution/extrapolation ------------------
say "traces"
python tools/profile_frame.py config3 --frames 8 --out /tmp/xr_r5b/prof_c3 \
  > /tmp/xr_r5b/trace_c3.log 2>&1
say "trace c3 rc=$?"
python tools/profile_frame.py config5 --frames 4 --out /tmp/xr_r5b/prof_c5 \
  > /tmp/xr_r5b/trace_c5.log 2>&1
say "trace c5 rc=$?"

# ---- 6. headline (leaves the driver's program cache warm) ------------------
say "bench.py"
python bench.py > /tmp/xr_r5b/bench_headline.log 2>&1
say "bench rc=$? tail: $(tail -1 /tmp/xr_r5b/bench_headline.log)"
say "DONE"
