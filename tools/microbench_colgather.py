"""Microbenchmark: per-pixel record fetch strategies, measured HONESTLY.

CAUTION (PERF.md round 2): on this box's tunneled device, naive timing
loops — even with distinct args per iteration and block_until_ready —
report numbers BELOW the HBM bandwidth floor (0.03 ms for a gather that
must write >= 108 MB). Only a device-side scan that loops the op N times
inside ONE executable, with the scalar result fetched to host, measures
real device time. That is what this harness does; per-op time is
(T_scan(iters) - T_scan(0)) / iters.

Frame-trace ground truth these variants probe (per-op profile, config3):
  * (N,13) row gather, materialized {1,0:T(8,128)} + transpose copy:
    3.7 + 1.65 ms (~1.8 ns/row + relayout)
  * (N,) per-field gather (dense in/out): ~14.8 ms each (~7 ns/element)
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
C = 75_328
K = 13
ITERS = 8


def scan_timed(body, args, name=""):
    """body(t_row, *args) -> (N,) f32; scanned over ITERS index rows inside
    one jit; host-fetches the final scalar so the device must execute."""
    rng = np.random.default_rng(1)
    if os.environ.get("XR_MB_COHERENT"):
        # frame-like indices: horizontal runs of one triangle id (~32 px),
        # ids loosely increasing across the screen like a real tid buffer
        base = (np.arange(NPIX, dtype=np.int64) // 32 * 7) % C
        ts = np.stack([
            ((base + rng.integers(0, 5, NPIX)) % C).astype(np.int32)
            for _ in range(ITERS)
        ])
        ts = jnp.asarray(ts)
    else:
        ts = jnp.asarray(
            rng.integers(0, C, (ITERS, NPIX)).astype(np.int32)
        )

    @jax.jit
    def run(ts, *args):
        def step(acc, t_row):
            r = body(t_row, *args)
            return acc + r[::65537].sum(), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), ts)
        return acc

    @jax.jit
    def run0(ts, *args):
        return ts.astype(jnp.float32)[::65537, ::65537].sum() + float(
            len(args)
        )

    float(run(ts, *args))  # compile + warm
    float(run0(ts, *args))
    t0 = time.perf_counter()
    base = float(run0(ts, *args))
    t1 = time.perf_counter()
    val = float(run(ts, *args))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / ITERS
    print(f"{name:38s} {dt*1e3:8.3f} ms/iter   (overhead {1e3*(t1-t0):.2f})",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    tab = rng.integers(1, 1000, (C, K)).astype(np.float32)
    tabf = jnp.asarray(tab)
    tab31 = jnp.asarray(np.tile(tab, (1, 3))[:, :31].copy())
    fields = [tabf[:, k] for k in range(K)]
    px = jnp.arange(NPIX, dtype=jnp.int32) % 1920
    py = jnp.arange(NPIX, dtype=jnp.int32) // 1920

    def col_math(cols, px, py):
        a1, b1, x1, y1, z0, z1 = cols[:6]
        e = a1 * (px - x1) + b1 * (py - y1)
        ef = e.astype(jnp.float32)
        acc = ef * z0 + (1.0 - ef) * z1
        for c in cols[6:]:
            acc = acc + c.astype(jnp.float32)
        return acc

    def b_wide13(t, tabf, px, py):
        rec = tabf[t]
        cols = [rec[:, k].astype(jnp.int32) if k < 4 else rec[:, k]
                for k in range(K)]
        return col_math(cols, px, py)

    def b_wide13_freeze(t, tabf, px, py):
        rec = tabf[t]
        recT = jax.lax.optimization_barrier(jnp.swapaxes(rec, 0, 1))
        cols = [recT[k].astype(jnp.int32) if k < 4 else recT[k]
                for k in range(K)]
        return col_math(cols, px, py)

    def b_wide31(t, tab31, px, py):
        rec = tab31[t]
        recT = jax.lax.optimization_barrier(jnp.swapaxes(rec, 0, 1))
        cols = [recT[k].astype(jnp.int32) if k < 4 else recT[k]
                for k in range(K)]
        acc = col_math(cols, px, py)
        for k in range(K, 31):
            acc = acc + recT[k]
        return acc

    def b_cols(t, px, py, *fields):
        cols = [fields[k][t].astype(jnp.int32) if k < 4 else fields[k][t]
                for k in range(K)]
        return col_math(cols, px, py)

    def b_col1(t, f0):
        return f0[t]

    scan_timed(b_wide13, (tabf, px, py), name="wide13 gather -> column math")
    scan_timed(b_wide13_freeze, (tabf, px, py),
               name="wide13 gather, frozen transpose")
    scan_timed(b_wide31, (tab31, px, py), name="wide31 gather, frozen transpose")
    scan_timed(b_cols, (px, py) + tuple(fields),
               name="13 field gathers -> column math")
    scan_timed(b_col1, (fields[0],), name="single (N,) field gather")


if __name__ == "__main__":
    main()
