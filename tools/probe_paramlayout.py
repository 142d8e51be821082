import os, sys, time, collections
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental.layout import Format, Layout
from tools.profile_frame import parse

R, K, N = 458751, 13, 2073600
rng = np.random.default_rng(0)
tab_np = rng.integers(0, 1 << 30, size=(R, K)).astype(np.uint32)
idx_np = rng.integers(0, R, size=(N,)).astype(np.int32)

def consume(row):
    acc = row[:, 0]
    for c in range(1, K):
        acc = acc ^ (row[:, c] >> np.uint32(c))
    return acc

def f(tab, idx):
    return consume(tab[idx])

dev = jax.devices()[0]
tab = jax.device_put(jnp.asarray(tab_np))
idx = jax.device_put(jnp.asarray(idx_np))

which = sys.argv[1]
if which == "default":
    jf, args = jax.jit(f), (tab, idx)
else:
    fmt_rm = Format(Layout((1, 0)), jax.sharding.SingleDeviceSharding(dev))
    jf = jax.jit(f, in_shardings=(fmt_rm, None))
    args = (jax.device_put(tab_np, fmt_rm), idx)

r = jf(*args); jax.block_until_ready(r)
outdir = f"/tmp/xr_probe_trace_{which}"
with jax.profiler.trace(outdir):
    for _ in range(20):
        r = jf(*args)
    jax.block_until_ready(r)
print(f"=== {which} ===")
parse(outdir, 20, 10)
