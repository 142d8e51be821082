"""Multi-chip frame rendering: screen-band sharding over a device mesh.

The reference is single-GPU; its parallelism inventory maps to TPU as
tile/band-sharded data parallelism over screen space with a final
framebuffer all-gather over ICI (SURVEY.md §2.4/§2.5/§5.8, BASELINE.json:5,
config 5 at BASELINE.json:11). Design:

  * Triangle/scene data is REPLICATED (broadcast) across chips; each chip
    runs the full geometry stage (cheap vs raster, SURVEY.md §6) and then
    bins/rasters/shades ONLY its horizontal band of the framebuffer.
  * The only cross-chip traffic is the final `jax.lax.all_gather` of the
    shaded bands — the ICI-friendly layout (SURVEY.md §5.8).
  * Implemented with `jax.shard_map` over a 1D "bands" mesh; runs unchanged
    on a real multi-chip slice or on N virtual CPU host devices
    (SURVEY.md §4.2), because the per-band raster is the portable jnp path.

Band semantics are bit-identical to the single-device render: the per-band
pixel grids use full-frame coordinates (y_offset), coverage is integer, and
the (z, id) resolve is order-independent — so the sharded frame equals the
unsharded frame exactly (tested).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from xr.core import math3d as m3
from xr.core import shade_math as sm
from xr.core.types import MODE_DEPTH_ONLY, MODE_PHONG, Frame, RenderConfig, Scene
from xr.app.renderer import PresentMixin
from xr.pipeline.geometry import clip_capacity, geometry
from xr.raster import dispatch
from xr.shading.deferred import shade_deferred


def make_band_mesh(num_bands: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:num_bands]
    assert len(devices) >= num_bands, (
        f"need {num_bands} devices, have {len(devices)}"
    )
    return Mesh(devices[:num_bands], ("bands",))


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def render_step_sharded(
    scene: Scene,
    camera,
    config: RenderConfig,
    mesh: Mesh,
    light_view=None,
    light_proj=None,
    capacity: Optional[int] = None,
    shade_hook=None,
    fb_pool=None,
) -> Frame:
    """Render one frame sharded into horizontal bands across `mesh`.

    Returns a fully-gathered (replicated) Frame — the final all_gather rides
    ICI on real hardware (BASELINE.json:5).

    fb_pool: optional (color_u8 (H,W,3), depth_f32 (H,W)) DONATED replicated
    buffers a retired frame left behind (see xr.app.renderer.render_step) —
    the gathered outputs are written into them in place.
    """
    n = mesh.shape["bands"]
    cap = capacity or clip_capacity(scene.mesh.num_triangles, config)
    H, W = config.height, config.width
    Hp = _pad_to(H, n * config.tile_h)
    Hb = Hp // n
    band_cfg = dataclasses.replace(config, height=Hb, num_shards=1)

    aspect = W / H
    shadow_cfg = None
    if config.mode == MODE_PHONG and config.shadow_map_size > 0:
        assert light_view is not None and light_proj is not None
        shadow_cfg = dataclasses.replace(
            config,
            width=config.shadow_map_size,
            height=config.shadow_map_size,
            mode=MODE_DEPTH_ONLY,
            shadow_map_size=0,
        )

    def band_fn(scene, camera, light_view, light_proj):
        idx = jax.lax.axis_index("bands")
        y_off = idx * Hb
        view, proj = m3.camera_matrices(camera, aspect, jnp)

        shadow_depth = None
        light_viewproj = None
        s_bin_of = jnp.int32(0)
        if shadow_cfg is not None:
            # shadow map is small and needed everywhere: computed replicated
            light_viewproj = (
                jnp.asarray(light_proj) @ jnp.asarray(light_view)
            ).astype(jnp.float32)
            s_tri = geometry(
                scene, jnp.asarray(light_view), jnp.asarray(light_proj),
                shadow_cfg, xp=jnp, capacity=cap,
            )
            if config.blend:
                # blend state composes with sharding exactly as with the
                # single-device step (xr/app/renderer._depth_pass):
                # transparent records cast no shadows
                from xr.shading.blend import opaque_valid

                s_tri = s_tri.replace(valid=opaque_valid(s_tri, scene, jnp))
            _, s_zbuf, s_bin_of = dispatch.visibility(s_tri, shadow_cfg, cap)
            shadow_depth = jnp.where(jnp.isinf(s_zbuf), 1.0, s_zbuf).astype(
                jnp.float32
            )

        # geometry sees the FULL frame (its screen reject must not cull
        # triangles belonging to other bands); only raster/shade are banded
        tri = geometry(scene, view, proj, config, xp=jnp, capacity=cap)
        vis_tri = tri
        if config.blend:
            # transparent records win no pixels in the opaque passes
            from xr.shading.blend import opaque_valid

            vis_tri = tri.replace(valid=opaque_valid(tri, scene, jnp))
        tid, zbuf, bin_of = dispatch.visibility(
            vis_tri, band_cfg, cap, y_offset=y_off
        )
        depth = jnp.where(jnp.isinf(zbuf), 1.0, zbuf).astype(jnp.float32)

        blend_of = jnp.int32(0)
        if config.mode == MODE_DEPTH_ONLY:
            color = jnp.zeros((Hb, W, 3), jnp.uint8)
        else:
            rgb = shade_deferred(
                tri,
                tid,
                scene,
                band_cfg,
                eye=camera.eye,
                shadow_depth=shadow_depth,
                light_viewproj=light_viewproj,
                y_offset=y_off,
                xp=jnp,
                shade_hook=shade_hook,
                depth=depth,
            )
            if config.blend:
                # per-band composite over the shaded band: every band walks
                # the full (replicated) transparent record list in SOURCE-
                # triangle order (TriBuf.src_id) against its own pixel
                # rows, so composite order — the blend semantics — is
                # identical to the single-device pass
                from xr.shading.blend import composite_transparent

                rgb, blend_of = composite_transparent(
                    rgb, depth, tri, scene, band_cfg, camera.eye, xp=jnp,
                    y_offset=y_off,
                    shadow_depth=shadow_depth,
                    light_viewproj=light_viewproj,
                )
            color = sm.resolve_u8(rgb, jnp)

        # THE cross-chip step: band framebuffers -> full frame over ICI
        color_full = jax.lax.all_gather(color, "bands", axis=0).reshape(Hp, W, 3)
        depth_full = jax.lax.all_gather(depth, "bands", axis=0).reshape(Hp, W)
        stats = {
            "tris_in": jnp.int32(scene.mesh.num_triangles),
            "tris_setup": tri.count,  # same on every band (replicated geom)
            "clip_overflow": tri.overflow,
            "bin_overflow": jax.lax.psum(bin_of, "bands") + s_bin_of,
            "fragments_shaded": jnp.int32(
                Hp * W
                + (
                    config.shadow_map_size * config.shadow_map_size
                    if shadow_cfg is not None
                    else 0
                )
            ),
            "covered_pixels": jax.lax.psum(
                jnp.sum(depth < 1.0).astype(jnp.int32), "bands"
            ),
        }
        if config.blend:
            # replicated count (derived from the replicated geometry), like
            # tris_setup — no psum
            stats["blend_overflow"] = blend_of
        return color_full, depth_full, stats

    # check_vma=False: the all_gather makes outputs replicated, but the
    # varying-axes checker can't infer that through the int-heavy raster.
    fn = jax.shard_map(
        band_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    lv = jnp.zeros((4, 4), jnp.float32) if light_view is None else jnp.asarray(light_view)
    lp = jnp.zeros((4, 4), jnp.float32) if light_proj is None else jnp.asarray(light_proj)
    color, depth, stats = fn(scene, camera, lv, lp)
    color, depth = color[:H], depth[:H]
    if fb_pool is not None:
        color = fb_pool[0].at[:, :, :].set(color)
        depth = fb_pool[1].at[:, :].set(depth)
    return Frame(color=color, depth=depth, stats=stats)


class ShardedRenderer(PresentMixin):
    """Multi-chip counterpart of xr.app.Renderer (config 5): same
    step/readback/present surface, banded across a device mesh."""

    def __init__(self, scene: Scene, config: RenderConfig, devices=None,
                 shade_hook=None, recycle_framebuffers: bool = True):
        from xr.pipeline.shadow import light_matrices_for_scene

        self.config = config
        self.mesh = make_band_mesh(config.num_shards, devices)
        self.capacity = clip_capacity(scene.mesh.num_triangles, config)
        self._light = None
        self._inflight = None
        self._recycle = recycle_framebuffers
        self._pool = []
        self._step = jax.jit(
            functools.partial(
                render_step_sharded,
                config=config,
                mesh=self.mesh,
                capacity=self.capacity,
                shade_hook=shade_hook,
            ),
            donate_argnames=("fb_pool",),
        )
        if config.mode == MODE_PHONG and config.shadow_map_size > 0:
            self._light = light_matrices_for_scene(scene)

    def _retire(self, frame: Frame) -> None:
        # see xr.app.renderer.Renderer._retire — same persistent-framebuffer
        # donation pattern; the pooled buffers are replicated full frames
        if self._recycle and hasattr(frame.color, "devices"):
            self._pool.append((frame.color, frame.depth))

    def _fb_pool(self):
        if self._pool:
            return self._pool.pop()
        cfg = self.config
        return (
            jnp.zeros((cfg.height, cfg.width, 3), jnp.uint8),
            jnp.zeros((cfg.height, cfg.width), jnp.float32),
        )

    def step(self, scene: Scene, camera) -> Frame:
        fb = self._fb_pool()
        if self._light is not None:
            return self._step(
                scene, camera, light_view=self._light[0],
                light_proj=self._light[1], fb_pool=fb,
            )
        return self._step(scene, camera, fb_pool=fb)
