"""Probe: Mosaic take_along_axis(axis=1) with EQUAL arr/idx shapes.

Round-2 attempts failed with shape-mismatch asserts when idx was narrower
than the table. Hypothesis: Mosaic supports the equal-shape form (a
permutation-width lane gather). If true and fast, per-pixel record/texture
fetch can move inside a Pallas kernel (tables VMEM-resident), killing the
padded gather materializations + relayout copies.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def bench(width, subl, dtype, iters=20):
    W = (width + 127) // 128 * 128
    S = subl
    rng = np.random.default_rng(0)
    tab_np = rng.integers(0, 1 << 20, size=(S, W)).astype(np.uint32)
    idx_np = rng.integers(0, width, size=(1, W)).astype(np.int32)
    tab = jnp.asarray(tab_np).astype(dtype)
    idx = jnp.asarray(idx_np)

    def k(idx_ref, tab_ref, out_ref):
        ii = jnp.broadcast_to(idx_ref[:], (S, W))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], ii, axis=1)

    @jax.jit
    def run(i, t):
        return pl.pallas_call(
            k,
            in_specs=[
                pl.BlockSpec((1, W), lambda: (0, 0)),
                pl.BlockSpec((S, W), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec((S, W), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((S, W), dtype),
        )(i, t)

    try:
        out = np.asarray(run(idx, tab))
    except Exception as e:  # noqa: BLE001
        print(f"W={W} S={S} {dtype.__name__}: FAILED {type(e).__name__} {str(e)[:200]}")
        return
    ref = np.take_along_axis(tab_np.astype(out.dtype), np.broadcast_to(idx_np, (S, W)), axis=1)
    ok = np.array_equal(out, ref)
    # time it
    r = run(idx, tab); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(idx, tab)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    ns_elem = dt * 1e9 / (S * W)
    print(f"W={W} S={S} {dtype.__name__}: ok={ok} {dt*1e3:.3f} ms "
          f"({ns_elem:.3f} ns/elem)", flush=True)

if __name__ == "__main__":
    bench(8192, 8, jnp.uint32)
    bench(8192, 16, jnp.uint32)
    bench(75616, 16, jnp.uint32)
    bench(75616, 32, jnp.float32)
