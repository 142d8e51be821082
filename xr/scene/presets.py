"""The five capability-config scenes (BASELINE.json:7-11) as presets.

Each preset bundles a static Scene, an `animate(t, xp)` function producing
the per-frame camera + model matrices (traced on device so the frame loop is
ONE compiled XLA program with t as a traced arg, SURVEY.md §3.2), and the
RenderConfig. Scripted camera paths replace the reference's FPS-camera input
(SURVEY.md §2.1 "OS window + input": dropped for headless operation).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import numpy as np

from xr.core import math3d as m3
from xr.core.types import (
    MODE_FLAT,
    MODE_GOURAUD,
    MODE_PHONG,
    MODE_TEXTURED,
    Camera,
    Lights,
    Material,
    RenderConfig,
    Scene,
)
from xr.scene import procedural as proc
from xr.scene import texture as tx


class Preset(NamedTuple):
    name: str
    scene: Scene
    animate: Callable  # (t, xp) -> (Camera, model_matrices)
    config: RenderConfig


def _identity_mats(n=1):
    return np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))


def config1_cube() -> Preset:
    """Config 1 (BASELINE.json:7): spinning flat-shaded cube, 512x512,
    depth test on — the CPU-reference frame loop."""
    mesh = proc.cube(1.2)
    scene = Scene(
        mesh=mesh,
        materials=Material.table([{"base_color": (0.9, 0.35, 0.25)}]),
        textures=None,
        lights=Lights.make(
            dir_dirs=[(-0.5, -0.7, -0.5)],
            dir_colors=[(1.0, 1.0, 1.0)],
            ambient=(0.15, 0.15, 0.15),
        ),
        model_matrices=_identity_mats(),
    )

    def animate(t, xp=np):
        model = m3.rotation_y(t * 0.9, xp) @ m3.rotation_x(t * 0.37, xp)
        cam = Camera(
            eye=xp.asarray((1.9, 1.4, 2.6), xp.float32),
            target=xp.asarray((0.0, 0.0, 0.0), xp.float32),
            up=xp.asarray((0.0, 1.0, 0.0), xp.float32),
            fov_y=xp.asarray(np.deg2rad(50.0), xp.float32),
            near=xp.asarray(0.1, xp.float32),
            far=xp.asarray(20.0, xp.float32),
        )
        return cam, model[None].astype(xp.float32)

    cfg = RenderConfig(width=512, height=512, mode=MODE_FLAT, depth_test=True)
    return Preset("config1_cube", scene, animate, cfg)


def config2_icospheres() -> Preset:
    """Config 2 (BASELINE.json:8): Gouraud icosphere grid (~10k tris), one
    directional light, 1080p."""
    spheres = []
    k = 0
    for gz in range(6):
        for gx in range(6):
            s = proc.icosphere(2, radius=0.55, mat=k % 4)
            m = m3.translation(((gx - 2.5) * 1.5, 0.0, (gz - 2.5) * 1.5), np)
            spheres.append(proc.transformed(s, m))
            k += 1
    mesh = proc.with_vert_mat(proc.merge_meshes(spheres))  # 36*320 tris
    scene = Scene(
        mesh=mesh,
        materials=Material.table(
            [
                {"base_color": (0.85, 0.3, 0.3)},
                {"base_color": (0.3, 0.8, 0.4)},
                {"base_color": (0.3, 0.45, 0.9)},
                {"base_color": (0.9, 0.8, 0.3)},
            ]
        ),
        textures=None,
        lights=Lights.make(
            dir_dirs=[(-0.4, -0.8, -0.45)],
            dir_colors=[(1.0, 0.98, 0.9)],
            ambient=(0.12, 0.12, 0.14),
        ),
        model_matrices=_identity_mats(),
    )

    def animate(t, xp=np):
        ang = t * 0.25
        eye = xp.stack(
            [7.5 * xp.cos(xp.asarray(ang, xp.float32)),
             xp.asarray(4.5, xp.float32),
             7.5 * xp.sin(xp.asarray(ang, xp.float32))]
        )
        cam = Camera(
            eye=eye.astype(xp.float32),
            target=xp.asarray((0.0, 0.0, 0.0), xp.float32),
            up=xp.asarray((0.0, 1.0, 0.0), xp.float32),
            fov_y=xp.asarray(np.deg2rad(55.0), xp.float32),
            near=xp.asarray(0.2, xp.float32),
            far=xp.asarray(60.0, xp.float32),
        )
        return cam, xp.asarray(_identity_mats(), xp.float32)

    cfg = RenderConfig(width=1920, height=1080, mode=MODE_GOURAUD,
                       tile_h=128, tile_w=128, bin_capacity=2048)
    return Preset("config2_icospheres", scene, animate, cfg)


def config3_terrain(nx: int = 224, nz: int = 224) -> Preset:
    """Config 3 (BASELINE.json:9): textured ~100k-tri scene with
    perspective-correct bilinear sampling + mipmaps. Terrain is the
    reference's flagship app domain (SURVEY.md §1 L4)."""
    mesh = proc.with_vert_mat(proc.terrain(nx, nz, size=40.0, height=4.0))
    pyramid = tx.build_pyramid([tx.checkerboard(256, 16), tx.noise_texture(256)])
    scene = Scene(
        mesh=mesh,
        materials=Material.table([{"base_color": (1.0, 1.0, 1.0), "tex_id": 0}]),
        textures=pyramid,
        lights=Lights.make(
            dir_dirs=[(-0.35, -0.8, -0.5)],
            dir_colors=[(1.0, 0.97, 0.9)],
            ambient=(0.18, 0.18, 0.2),
        ),
        model_matrices=_identity_mats(),
    )

    def animate(t, xp=np):
        ang = t * 0.12
        tf = xp.asarray(t, xp.float32)
        eye = xp.stack(
            [
                14.0 * xp.cos(xp.asarray(ang, xp.float32)),
                xp.asarray(7.0, xp.float32) + 0.0 * tf,
                14.0 * xp.sin(xp.asarray(ang, xp.float32)),
            ]
        )
        cam = Camera(
            eye=eye.astype(xp.float32),
            target=xp.asarray((0.0, 0.0, 0.0), xp.float32),
            up=xp.asarray((0.0, 1.0, 0.0), xp.float32),
            fov_y=xp.asarray(np.deg2rad(55.0), xp.float32),
            near=xp.asarray(0.3, xp.float32),
            far=xp.asarray(120.0, xp.float32),
        )
        return cam, xp.asarray(_identity_mats(), xp.float32)

    cfg = RenderConfig(width=1920, height=1080, mode=MODE_TEXTURED,
                       tile_h=32, tile_w=128, bin_capacity=3072,
                       clip_budget=1024, clip_expand=0.50,
                       stream_expand=1.3, stream_block=128)
    return Preset("config3_terrain", scene, animate, cfg)


def config4_phong() -> Preset:
    """Config 4 (BASELINE.json:10): multi-light Phong with a shadow-map
    depth pass + main pass (two-pass frame)."""
    ground = proc.grid_plane(24, 24, size=14.0, mat=0)
    objs = [ground]
    tids = [0]
    rng = np.random.default_rng(11)
    placed: list = []
    for i in range(8):
        # resample until objects don't interpenetrate: accidental
        # intersections create z-fighting contours where the visibility
        # winner depends on f32 rounding — device-vs-oracle parity is
        # ill-defined there (ISSUES.md config4_blend 1-px episode). Max
        # object footprint radius is ~0.71 (rotated unit cube), so a 2.0
        # center distance guarantees clear separation.
        while True:
            x, z = rng.uniform(-4.5, 4.5, 2)
            if all((x - qx) ** 2 + (z - qz) ** 2 >= 4.0 for qx, qz in placed):
                break
        placed.append((float(x), float(z)))
        if i % 2 == 0:
            s = proc.cube(1.0, mat=1 + (i % 3))
            m = m3.translation((x, 0.55, z), np) @ m3.rotation_y(
                float(rng.uniform(0, 3.14)), np
            )
        else:
            s = proc.icosphere(2, 0.65, mat=1 + (i % 3))
            m = m3.translation((x, 0.7, z), np)
        objs.append(proc.transformed(s, m))
        tids.append(0)
    mesh = proc.merge_meshes(objs, tids)
    scene = Scene(
        mesh=mesh,
        materials=Material.table(
            [
                {"base_color": (0.75, 0.75, 0.78), "ks": 0.1, "shininess": 16.0},
                {"base_color": (0.85, 0.25, 0.2), "ks": 0.6, "shininess": 48.0},
                {"base_color": (0.2, 0.6, 0.85), "ks": 0.6, "shininess": 64.0},
                {"base_color": (0.95, 0.8, 0.25), "ks": 0.8, "shininess": 96.0},
            ]
        ),
        textures=None,
        lights=Lights.make(
            dir_dirs=[(-0.45, -0.75, -0.35), (0.6, -0.5, 0.4)],
            dir_colors=[(0.95, 0.92, 0.85), (0.25, 0.28, 0.35)],
            pt_pos=[(3.0, 3.0, -3.0), (-3.5, 2.5, 3.0)],
            pt_colors=[(0.9, 0.55, 0.3), (0.3, 0.5, 0.9)],
            ambient=(0.08, 0.08, 0.1),
        ),
        model_matrices=_identity_mats(),
    )

    def animate(t, xp=np):
        ang = 0.8 + t * 0.2
        eye = xp.stack(
            [
                11.0 * xp.cos(xp.asarray(ang, xp.float32)),
                xp.asarray(6.0, xp.float32),
                11.0 * xp.sin(xp.asarray(ang, xp.float32)),
            ]
        )
        cam = Camera(
            eye=eye.astype(xp.float32),
            target=xp.asarray((0.0, 0.5, 0.0), xp.float32),
            up=xp.asarray((0.0, 1.0, 0.0), xp.float32),
            fov_y=xp.asarray(np.deg2rad(50.0), xp.float32),
            near=xp.asarray(0.2, xp.float32),
            far=xp.asarray(80.0, xp.float32),
        )
        return cam, xp.asarray(_identity_mats(), xp.float32)

    cfg = RenderConfig(
        width=1920, height=1080, mode=MODE_PHONG, shadow_map_size=1024,
        bin_capacity=4096
    )
    return Preset("config4_phong", scene, animate, cfg)


def config4_blend() -> Preset:
    """Config-4-class scene with BLENDED transparency (SURVEY.md §2.1
    "Pipeline state": the blend axis): the Phong multi-light scene plus two
    overlapping transparent panes floating above it, appended to the mesh
    in back-to-front order (lower pane first — the camera orbits above, so
    record-id order is composite order; see xr/shading/blend.py)."""
    base = config4_phong()
    pane_lo = proc.transformed(
        proc.grid_plane(1, 1, size=7.0, mat=4),
        m3.translation((0.5, 1.6, -0.3), np),
    )
    pane_hi = proc.transformed(
        proc.grid_plane(1, 1, size=5.0, mat=5),
        m3.translation((-0.6, 2.6, 0.4), np),
    )
    mesh = proc.merge_meshes(
        [base.scene.mesh, pane_lo, pane_hi], [0, 0, 0]
    )
    mats = base.scene.materials
    rows = [
        {
            "base_color": tuple(np.asarray(mats.base_color[i])),
            "ka": float(mats.ka[i]),
            "kd": float(mats.kd[i]),
            "ks": float(mats.ks[i]),
            "shininess": float(mats.shininess[i]),
            "tex_id": int(mats.tex_id[i]),
        }
        for i in range(mats.base_color.shape[0])
    ] + [
        {"base_color": (0.9, 0.3, 0.25), "ks": 0.3, "shininess": 32.0,
         "alpha": 0.55},
        {"base_color": (0.25, 0.45, 0.95), "ks": 0.3, "shininess": 32.0,
         "alpha": 0.4},
    ]
    scene = base.scene.replace(mesh=mesh, materials=Material.table(rows))
    cfg = dataclasses.replace(base.config, blend=True, blend_capacity=32)
    return Preset("config4_blend", scene, base.animate, cfg)


def config5_flythrough(nx: int = 708, nz: int = 708) -> Preset:
    """Config 5 (BASELINE.json:11): ~1M-triangle Sponza-class fly-through,
    sharded per screen-tile band across 4 chips (SURVEY.md §5.8)."""
    terrain = proc.terrain(nx, nz, size=120.0, height=7.0, octaves=6, seed=13)
    # "city": boxes scattered on the terrain for architectural occlusion
    rng = np.random.default_rng(5)
    objs = [terrain]
    for _ in range(40):
        x, z = rng.uniform(-40, 40, 2)
        h = float(rng.uniform(1.5, 6.0))
        b = proc.cube(1.0, mat=1)
        m = m3.translation((x, h * 0.5 + 1.0, z), np) @ m3.scaling(
            (rng.uniform(1, 4), h, rng.uniform(1, 4)), np
        )
        objs.append(proc.transformed(b, m))
    mesh = proc.with_vert_mat(proc.merge_meshes(objs))
    pyramid = tx.build_pyramid([tx.noise_texture(256, seed=9), tx.checkerboard(256, 8)])
    scene = Scene(
        mesh=mesh,
        materials=Material.table(
            [
                {"base_color": (1.0, 1.0, 1.0), "tex_id": 0},
                {"base_color": (0.9, 0.85, 0.8), "tex_id": 1},
            ]
        ),
        textures=pyramid,
        lights=Lights.make(
            dir_dirs=[(-0.3, -0.75, -0.55)],
            dir_colors=[(1.0, 0.96, 0.88)],
            ambient=(0.2, 0.2, 0.22),
        ),
        model_matrices=_identity_mats(),
    )

    def animate(t, xp=np):
        tf = xp.asarray(t, xp.float32)
        ang = tf * 0.1
        eye = xp.stack(
            [30.0 * xp.cos(ang), 9.0 + 2.0 * xp.sin(tf * 0.31), 30.0 * xp.sin(ang)]
        )
        tgt = xp.stack([12.0 * xp.cos(ang + 0.7), 2.0 + 0.0 * tf, 12.0 * xp.sin(ang + 0.7)])
        cam = Camera(
            eye=eye.astype(xp.float32),
            target=tgt.astype(xp.float32),
            up=xp.asarray((0.0, 1.0, 0.0), xp.float32),
            fov_y=xp.asarray(np.deg2rad(60.0), xp.float32),
            near=xp.asarray(0.3, xp.float32),
            far=xp.asarray(300.0, xp.float32),
        )
        return cam, xp.asarray(_identity_mats(), xp.float32)

    cfg = RenderConfig(
        width=1920,
        height=1080,
        mode=MODE_TEXTURED,
        num_shards=4,
        tile_h=32,
        tile_w=128,
        bin_capacity=16384,
        large_capacity=4096,
        clip_budget=8192,
        # fly-through max is ~390k post-cull tris (of 1.0M in): capacity
        # 431k keeps ~1.1x headroom (overflow counters are loud if a camera
        # path ever exceeds it); every binning/record/sort stage scales
        # with this capacity. The margin is deliberately TIGHT because this
        # preset's camera path is FROZEN (it is the benchmarked config-5
        # flythrough); if you retarget the path or mesh, re-measure the
        # post-cull peak and keep >= 1.2x headroom. (The identity record
        # layout — clip_expand >= ~1.06 — was benched at 214 ms here: the
        # C-scale concat/table costs outweigh the saved compaction gather.
        # See PERF.md.)
        clip_expand=0.43,
        stream_expand=1.2,
        stream_block=256,
        # deep scene, mostly fully-covered tiles: the z-min early-out cut
        # the visibility kernel 39 -> 32.8 ms (PERF.md round 3)
        z_earlyout=True,
    )
    return Preset("config5_flythrough", scene, animate, cfg)


def config6_asset(assets_dir: str = None, max_tex_rows: int = None) -> Preset:
    """Config 6: the LOADED-asset flagship scene — a ~96k-tri multi-material
    courtyard read from disk through the full asset pipeline (OBJ parser ->
    MTL -> map_Kd PNGs of three different sizes -> mips -> render), with
    Phong shading + a 1024^2 shadow map. The reference's flagship apps
    render loaded scenes (SURVEY.md §2.1 "Sample apps", BASELINE.json:11);
    this preset proves the same path end-to-end. Assets are generated
    deterministically on first use (tools/gen_assets.py)."""
    import os

    from xr.scene.objio import load_obj_scene

    if assets_dir is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        assets_dir = os.path.join(root, "assets", "courtyard")
    obj_path = os.path.join(assets_dir, "courtyard.obj")
    if not os.path.exists(obj_path):
        import importlib.util

        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        spec = importlib.util.spec_from_file_location(
            "xr_gen_assets", os.path.join(root, "tools", "gen_assets.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main(assets_dir)

    scene = load_obj_scene(
        obj_path,
        lights=Lights.make(
            dir_dirs=[(-0.4, -0.85, -0.3), (0.5, -0.4, 0.6)],
            dir_colors=[(1.0, 0.96, 0.88), (0.18, 0.2, 0.26)],
            ambient=(0.16, 0.16, 0.18),
        ),
        # texture-area cap (see build_ragged_pyramid): None = native
        # quality; ~300k keeps the per-pixel quad gather row-major
        max_tex_rows=max_tex_rows,
    )

    def animate(t, xp=np):
        tf = xp.asarray(t, xp.float32)
        ang = 0.6 + tf * 0.15
        eye = xp.stack(
            [13.0 * xp.cos(ang), 5.5 + 0.8 * xp.sin(tf * 0.4), 13.0 * xp.sin(ang)]
        )
        cam = Camera(
            eye=eye.astype(xp.float32),
            target=xp.asarray((0.0, 1.8, 0.0), xp.float32),
            up=xp.asarray((0.0, 1.0, 0.0), xp.float32),
            fov_y=xp.asarray(np.deg2rad(55.0), xp.float32),
            near=xp.asarray(0.3, xp.float32),
            far=xp.asarray(90.0, xp.float32),
        )
        return cam, xp.asarray(_identity_mats(), xp.float32)

    cfg = RenderConfig(
        width=1920, height=1080, mode=MODE_PHONG, shadow_map_size=1024,
        tile_h=32, tile_w=128, bin_capacity=8192, clip_budget=4096,
        # the LIGHT-view depth pre-pass re-bins the scene at shadow-map
        # resolution, where more courtyard walls span >2x2 tiles: the
        # default large bucket (1024) dropped ~7 tris per frame at 1080p
        large_capacity=4096,
        clip_expand=1.0, stream_expand=1.5, stream_block=256,
    )
    return Preset("config6_asset", scene, animate, cfg)


def config6_capped() -> Preset:
    """Config 6 with the ~300k-row texture-area cap: the 512 map renders
    from its own first mip, keeping the per-pixel quad gather in the fast
    row-major regime (PERF.md round 3 "config6's flipped texture gather";
    the documented quality knob — measured 39.1 dB PSNR vs native at
    480x270). Benchmarked as config6cap for the on/off A/B."""
    p = config6_asset(max_tex_rows=300_000)
    return Preset("config6cap", p.scene, p.animate, p.config)


def config7_terrain_lod(n0: int = 160, rings: int = 3) -> Preset:
    """Config 7: chunked heightmap-LOD terrain fly-through (VERDICT r4 #8;
    SURVEY.md §2.1 — the reference's flagship app class is LOD terrain).
    Clipmap-style rings double their cell size with distance at fixed
    per-ring budgets (proc.terrain_lod: ~174k tris covering what uniform
    config-3 density would need ~3.3M for), with skirts hiding ring
    T-junctions. The camera flies low THROUGH the rings — near-plane
    clipping, extreme cell-size mixes in one frame, and per-tile bin
    churn are exactly the regimes the capacity knobs must survive, so
    this preset sizes every knob with the MEASURED auto-sizer
    (xr/app/autosize.py) instead of hand tuning."""
    mesh = proc.with_vert_mat(proc.terrain_lod(n0=n0, rings=rings))
    pyramid = tx.build_pyramid(
        [tx.noise_texture(256, seed=21), tx.checkerboard(256, 8)]
    )
    scene = Scene(
        mesh=mesh,
        materials=Material.table(
            [{"base_color": (0.95, 0.95, 0.9), "tex_id": 0}]
        ),
        textures=pyramid,
        lights=Lights.make(
            dir_dirs=[(-0.35, -0.8, -0.5)],
            dir_colors=[(1.0, 0.97, 0.9)],
            ambient=(0.22, 0.22, 0.24),
        ),
        model_matrices=_identity_mats(),
    )

    world = 30.0 * (2.0**rings)

    def animate(t, xp=np):
        tf = xp.asarray(t, xp.float32)
        ang = tf * 0.08
        r = 0.36 * world  # inside the outer ring, crossing ring boundaries
        eye = xp.stack(
            [
                r * xp.cos(ang),
                6.5 + 1.5 * xp.sin(tf * 0.23),
                r * xp.sin(ang),
            ]
        )
        tgt = xp.stack(
            [
                0.12 * world * xp.cos(ang + 1.1),
                1.0 + 0.0 * tf,
                0.12 * world * xp.sin(ang + 1.1),
            ]
        )
        cam = Camera(
            eye=eye.astype(xp.float32),
            target=tgt.astype(xp.float32),
            up=xp.asarray((0.0, 1.0, 0.0), xp.float32),
            fov_y=xp.asarray(np.deg2rad(62.0), xp.float32),
            near=xp.asarray(0.3, xp.float32),
            far=xp.asarray(400.0, xp.float32),
        )
        return cam, xp.asarray(_identity_mats(), xp.float32)

    base = RenderConfig(
        width=1920,
        height=1080,
        mode=MODE_TEXTURED,
        tile_h=32,
        tile_w=128,
        z_earlyout=True,
    )
    from xr.app.autosize import autosize_config

    cams = [animate(t, np)[0] for t in (0.0, 13.0, 26.0, 39.0)]
    cfg = autosize_config(scene, cams, base, margin=1.6)
    return Preset("config7_terrain_lod", scene, animate, cfg)


def small_preset(preset: Preset, width=160, height=120, **overrides) -> Preset:
    """Shrink a preset's framebuffer for tests/goldens."""
    cfg = dataclasses.replace(preset.config, width=width, height=height, **overrides)
    return Preset(preset.name, preset.scene, preset.animate, cfg)


ALL_PRESETS = {
    "config1": config1_cube,
    "config2": config2_icospheres,
    "config3": config3_terrain,
    "config4": config4_phong,
    "config4b": config4_blend,
    "config5": config5_flythrough,
    "config6": config6_asset,
    "config6cap": config6_capped,
    "config7": config7_terrain_lod,
}
