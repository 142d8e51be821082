#!/bin/bash
# Round-5 device batch: parity gate -> bench table -> zorder A/Bs -> traces.
# Sequential on purpose (single-tenant TPU; killing mid-compile wedges the
# compile service — CLAUDE.md). Every stage appends to /tmp/xr_r5/.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_xr
mkdir -p /tmp/xr_r5
LOG=/tmp/xr_r5/runner.log
say() { echo "[r5 $(date +%H:%M:%S)] $*" >> "$LOG"; }

# ---- 1. compile-free health gate (safe to timeout-kill) -------------------
say "health gate"
ok=0
for i in $(seq 1 60); do
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
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
a = jnp.ones((512, 512))
print("matmul ok:", float(jax.jit(lambda x: (x @ x).sum())(a)))
EOF

# ---- 3. device parity suite (the correctness gate) -------------------------
say "device parity suite"
XR_TEST_PLATFORM=tpu python -m pytest tests/ -m tpu -q \
  > /tmp/xr_r5/suite.log 2>&1
say "suite rc=$? tail: $(tail -1 /tmp/xr_r5/suite.log)"

# ---- 4. full bench table ----------------------------------------------------
say "bench_all"
python tools/bench_all.py --frames 20 > /tmp/xr_r5/bench_all.log 2>&1
say "bench_all rc=$?"

# ---- 5. bin_zorder A/Bs (axis is bit-exact; parity-tested on CPU) ----------
say "A/B batch"
python tools/bench_variant.py --preset config5 --frames 8 \
  --set bin_zorder=True >> /tmp/xr_r5/ab.log 2>&1
say "ab c5 zorder rc=$?"
python tools/bench_variant.py --preset config3 --frames 12 \
  --set z_earlyout=True bin_zorder=True >> /tmp/xr_r5/ab.log 2>&1
say "ab c3 eo+zorder rc=$?"
python tools/bench_variant.py --preset config6 --frames 8 \
  --set bin_zorder=True >> /tmp/xr_r5/ab.log 2>&1
say "ab c6 zorder rc=$?"
# interleaved baselines (the tunnel's ±5-20% noise band needs brackets)
python tools/bench_variant.py --preset config5 --frames 8 \
  >> /tmp/xr_r5/ab.log 2>&1
say "ab c5 baseline rc=$?"
python tools/bench_variant.py --preset config3 --frames 12 \
  >> /tmp/xr_r5/ab.log 2>&1
say "ab c3 baseline rc=$?"

# ---- 6. fresh per-op traces for attribution/extrapolation ------------------
say "traces"
python tools/profile_frame.py config3 --frames 8 --out /tmp/xr_r5/prof_c3 \
  > /tmp/xr_r5/trace_c3.log 2>&1
say "trace c3 rc=$?"
python tools/profile_frame.py config5 --frames 4 --out /tmp/xr_r5/prof_c5 \
  > /tmp/xr_r5/trace_c5.log 2>&1
say "trace c5 rc=$?"

# ---- 7. headline (leaves the driver's program cache warm) ------------------
say "bench.py"
python bench.py > /tmp/xr_r5/bench_headline.log 2>&1
say "bench rc=$? tail: $(tail -1 /tmp/xr_r5/bench_headline.log)"
say "DONE"
