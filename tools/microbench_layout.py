"""Reproduce + fix the config5 gather layout flip (PERF.md round 2).

At C≈1.25M rows XLA lays a concat-built record table out column-major and
the (2M, K) gathers reading it become strided writes, 5-30x slower than at
config3 scale (C≈75k). Variants probe which construction keeps row-major.
Run on the TPU; each variant is its own small jit.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NPIX = 1920 * 1080
K = 18


def timed(fn, *args, iters=10, name=""):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1e3:9.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def consumers(rec, lam):
    # mimic the shading consumers: one whole-table transpose into
    # column-major use (reduction over a small trailing axis)
    a = rec[:, : K - 3].reshape(-1, 3, K // 3 - 1 + (1 if K % 3 else 0))
    r = (lam[..., None] * a).sum(axis=-2)
    return r.sum() + rec[:, K - 1].sum()


def make_fns(C):
    def build_cols(src):
        # column-major-ish producers, like _project_snap outputs
        cols = [src[:, i % src.shape[1]] * (1.0 + i) for i in range(K)]
        return jnp.stack(cols, axis=1)  # (C, K)

    @jax.jit
    def v_plain(src, t, lam):
        tab = build_cols(src)
        return consumers(tab[t], lam)

    @jax.jit
    def v_barrier_table(src, t, lam):
        tab = jax.lax.optimization_barrier(build_cols(src))
        return consumers(tab[t], lam)

    from jax.experimental.layout import Layout, with_layout_constraint

    rm2 = Layout(major_to_minor=(0, 1))

    @jax.jit
    def v_pin_table(src, t, lam):
        tab = with_layout_constraint(build_cols(src), rm2)
        return consumers(tab[t], lam)

    @jax.jit
    def v_pin_gather(src, t, lam):
        tab = build_cols(src)
        return consumers(with_layout_constraint(tab[t], rm2), lam)

    @jax.jit
    def v_pin_both(src, t, lam):
        tab = with_layout_constraint(build_cols(src), rm2)
        return consumers(with_layout_constraint(tab[t], rm2), lam)

    return {
        "plain": v_plain,
        "barrier_table": v_barrier_table,
        "pin_table": v_pin_table,
        "pin_gather": v_pin_gather,
        "pin_both": v_pin_both,
    }


def main():
    rng = np.random.default_rng(0)
    lam = jnp.asarray(rng.random((NPIX, 3), dtype=np.float32))
    for C in (75_328, 1_253_824):
        print(f"--- C = {C}")
        src = jnp.asarray(rng.random((C, 4), dtype=np.float32))
        t = jnp.asarray(rng.integers(0, C, NPIX).astype(np.int32))
        for name, fn in make_fns(C).items():
            timed(fn, src, t, lam, name=f"C{C//1000}k {name}")


if __name__ == "__main__":
    main()
