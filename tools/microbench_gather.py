"""Microbenchmark: per-pixel texture-row fetch strategies on the TPU.

Round-1 trace put the single-gather trilinear at 14.8 ms for 2.07 Mpix
(~7 ns/row — the known XLA TPU per-row gather cost), while the comparable
shade-record gather ran at ~1.8 ns/row. This experiment isolates the fetch
to find which structural difference matters (2-D vs flat index, row width,
source layout) and whether a Pallas lane-axis take_along_axis beats XLA's
gather. Findings land in PERF.md.
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_xr")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NPIX = 1920 * 1080  # 2,073,600
P = 87381  # 256^2 + 128^2 + ... + 1 (quad-pyramid entries per texture)
NTEX = 2


def timed(fn, *args, iters=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.3f} ms   {dt*1e9/NPIX:6.2f} ns/px")
    return dt


def main():
    rng = np.random.default_rng(0)
    # indices with config3-like coherence: mostly-smooth uv ramp + noise
    base = (np.arange(NPIX, dtype=np.int64) * 37) % (P // 2)
    jitter = rng.integers(0, 64, NPIX)
    idx_np = ((base + jitter) % P).astype(np.int32)
    tex_np = (rng.random(NPIX) < 0.5).astype(np.int32)

    quads2d = jnp.asarray(rng.integers(0, 2**32, (NTEX, P, 13), dtype=np.uint32))
    quads_flat = quads2d.reshape(NTEX * P, 13)
    quads16 = jnp.pad(quads_flat, ((0, 0), (0, 3)))
    quads4 = quads_flat[:, :4].copy()
    idx = jnp.asarray(idx_np)
    tex = jnp.asarray(tex_np)

    @jax.jit
    def g_2d(q, t, i):
        r = q[t, i]  # (N, 13) — the current sample_trilinear shape
        return r.sum(axis=-1)

    @jax.jit
    def g_flat13(q, t, i):
        r = q[t * P + i]
        return r.sum(axis=-1)

    @jax.jit
    def g_flat16(q, t, i):
        r = q[t * P + i]
        return r.sum(axis=-1)

    @jax.jit
    def g_flat4(q, t, i):
        r = q[t * P + i]
        return r.sum(axis=-1)

    @jax.jit
    def g_two4(q, t, i):
        r0 = q[t * P + i]
        r1 = q[t * P + ((i * 5) % P)]
        return r0.sum(axis=-1) + r1.sum(axis=-1)

    @jax.jit
    def g_sorted13(q, t, i):
        # sort indices, gather, unsort — does HBM locality matter?
        order = jnp.argsort(i)
        r = q[t[order] * P + i[order]].sum(axis=-1)
        inv = jnp.argsort(order)
        return r[inv]

    timed(g_2d, quads2d, tex, idx, name="xla 2d-index (N,13)")
    timed(g_flat13, quads_flat, tex, idx, name="xla flat-index (N,13)")
    timed(g_flat16, quads16, tex, idx, name="xla flat-index (N,16)")
    timed(g_flat4, quads4, tex, idx, name="xla flat-index (N,4)")
    timed(g_two4, quads4, tex, idx, name="xla 2x flat-index (N,4)")
    timed(g_sorted13, quads_flat, tex, idx, name="xla sort+gather+unsort 13")

    # ---- Pallas lane-axis take_along_axis --------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PP = (NTEX * P + 127) // 128 * 128  # lane-pad the table
    tabT = jnp.zeros((16, PP), jnp.uint32).at[:13, : NTEX * P].set(
        jnp.swapaxes(quads_flat, 0, 1)
    )
    NB = NPIX // 1024  # 2025 blocks of (8,128)
    flat_idx = (tex * P + idx)[: NB * 1024].reshape(NB, 8, 128)

    def k_gather(idx_ref, tab_ref, out_ref):
        ii = idx_ref[:].reshape(1, 1024)
        rows = jnp.broadcast_to(ii, (16, 1024))
        g = jnp.take_along_axis(tab_ref[:], rows, axis=1)  # (16, 1024)
        out_ref[0] = g.sum(axis=0).reshape(8, 128)

    @jax.jit
    def pl_gather(i, tab):
        return pl.pallas_call(
            k_gather,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((16, PP), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, 8, 128), jnp.uint32),
        )(i.reshape(NB, 1, 8, 128)[:, 0], tab)

    try:
        timed(pl_gather, flat_idx, tabT, name="pallas lane-gather 16ch")
    except Exception as e:  # noqa: BLE001
        print("pallas lane-gather 16ch FAILED:", type(e).__name__, str(e)[:300])

    # single-channel variant: how does it scale with sublane count?
    def k_gather1(idx_ref, tab_ref, out_ref):
        ii = idx_ref[:].reshape(1, 1024)
        g = jnp.take_along_axis(tab_ref[0:1, :], ii, axis=1)  # (1, 1024)
        out_ref[0] = g.reshape(8, 128)

    @jax.jit
    def pl_gather1(i, tab):
        return pl.pallas_call(
            k_gather1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((16, PP), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, 8, 128), jnp.uint32),
        )(i.reshape(NB, 1, 8, 128)[:, 0], tab)

    try:
        timed(pl_gather1, flat_idx, tabT, name="pallas lane-gather 1ch")
    except Exception as e:  # noqa: BLE001
        print("pallas lane-gather 1ch FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
