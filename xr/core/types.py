"""Core data types for the xr renderer.

Scene/camera/material live as pytrees so the whole frame is one traced XLA
program (BASELINE.json:5 "scene/camera/material API and per-frame step
semantics"); ``RenderConfig`` is the pipeline-state object of the reference's
builder-style ``GraphicsPipeline::Info`` (SURVEY.md §2.1 "Pipeline state"):
a frozen hashable dataclass passed as a static jit argument, so each distinct
config compiles to its own executable (the XLA executable *is* the PSO).

All array leaves may be numpy (CPU oracle) or jax arrays (device pipeline);
the structs are array-library agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import numpy as np
from flax import struct

# ---------------------------------------------------------------------------
# Shading modes (the reference's shading levels: BASELINE.json:5
# "flat/Gouraud/textured shading levels", plus Phong+shadow for config 4 and
# a depth-only mode for the shadow pass, BASELINE.json:10).
# ---------------------------------------------------------------------------
MODE_FLAT = 0
MODE_GOURAUD = 1
MODE_TEXTURED = 2
MODE_PHONG = 3
MODE_DEPTH_ONLY = 4

MODE_NAMES = {
    MODE_FLAT: "flat",
    MODE_GOURAUD: "gouraud",
    MODE_TEXTURED: "textured",
    MODE_PHONG: "phong",
    MODE_DEPTH_ONLY: "depth_only",
}

# Per-vertex attribute widths carried through clipping/interpolation per mode.
#   flat:      none (face color is a per-triangle payload)
#   gouraud:   lit rgb (3)
#   textured:  uv (2) + lit rgb (3)
#   phong:     world pos (3) + world normal (3) + uv (2)
#   depth:     none
MODE_ATTR_WIDTH = {
    MODE_FLAT: 0,
    MODE_GOURAUD: 3,
    MODE_TEXTURED: 5,
    MODE_PHONG: 8,
    MODE_DEPTH_ONLY: 0,
}


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static pipeline state. Hashable; passed as a jit static arg.

    Mirrors the role of the reference's pipeline-info struct (SURVEY.md §5.6):
    every distinct value compiles one XLA executable.
    """

    width: int = 512
    height: int = 512
    mode: int = MODE_FLAT
    depth_test: bool = True
    cull_backfaces: bool = True

    # Fixed-point raster precision: snap screen coords to 1/2**subpixel_bits
    # pixel. int32 edge functions must not overflow:
    #   (max_fixed_coord_span)^2 * 2 < 2^31  (see xr/core/fixedpoint.py).
    subpixel_bits: int = 2

    # Guard band in NDC units: clip x,y against |ndc| <= guard_band so
    # post-clip screen coordinates stay bounded for exact int32 raster.
    guard_band: float = 3.0

    # Post-clip triangle capacity = ceil(num_tris * clip_expand) + 64.
    clip_expand: float = 1.25

    # Max triangles routed through full Sutherland-Hodgman per frame (only
    # tris that actually CROSS a frustum/guard plane; fully-inside tris skip
    # clipping entirely). 0 = auto: max(1024, T//16). Overflow is counted.
    clip_budget: int = 0

    # Screen-tile binning (0 => brute force over all triangles, no binning).
    tile_h: int = 64
    tile_w: int = 128
    bin_capacity: int = 256  # max small triangles binned per tile
    # Triangles spanning more than 2x2 tiles go to a global "large" bucket
    # evaluated by every tile (with a per-tile bbox reject); this keeps the
    # per-triangle bin fan-out statically bounded (SURVEY.md §7.3.1).
    large_capacity: int = 1024

    # Small-triangle pair-emission width. 4 (default): every small tri
    # emits 4 static (tile, id) key slots into the bin sort (duplicates
    # masked to sentinels — ~71% of sorted keys at config3). 2: emit 2
    # slots (home + the 1x2/2x1 second tile) and compact the rare
    # 2x2-spanning smalls into bin_quad_capacity extra 2-slot rows; quad
    # OVERFLOW routes to the large bucket (duplicate-tolerant resolve —
    # never dropped). Halves the sorted key count at the cost of one
    # extra capacity-wide compaction; bit-identical images. Measure on
    # device before switching defaults (PERF.md lane B).
    bin_pairs: int = 4
    bin_quad_capacity: int = 4096

    # Hierarchical MEDIUM bin class: triangles spanning <= medium_span x
    # medium_span tiles (but more than 2x2) are compacted (up to
    # medium_capacity of them) and binned per tile with up to
    # medium_span^2 (tile, id) pairs each, merged into the same scatter-
    # free sort. Without it every such triangle lands in the global large
    # bucket and is bbox-scanned by EVERY tile (983 larges x 510 tiles =
    # 501k wasted scalar-kernel iterations/frame on the config-6
    # courtyard). Overflow routes to the large bucket (never dropped).
    # medium_capacity = 0 disables the class (round-2 behavior).
    medium_span: int = 8
    medium_capacity: int = 2048

    # Streaming-kernel global entry capacity, as a multiple of the post-clip
    # triangle capacity (total bin entries across ALL tiles). Small tris
    # emit <= 4 entries each (~1.2x typical); MEDIUM-class tris emit up to
    # medium_span^2 entries each, so scenes with many medium tris can
    # exceed 4x — overflow is counted loudly (dropped whole blocks feed
    # bin_overflow and readback_frame raises); raise this or pin
    # stream_entry_cap to the measured entry count if it fires.
    stream_expand: float = 2.0

    # Streaming-kernel records per block. Smaller blocks waste less record-
    # gather padding (every tile pads to >= 1 block) but add grid steps;
    # per-block SMEM window = 64-68 bytes * stream_block (12 int + 4-5 f32
    # slots per record, x2 double-buffered). Must be a multiple of 8
    # (pallas_stream.CHUNK_G) when z_earlyout is on.
    stream_block: int = 512

    # Absolute streaming-entry capacity override. 0 = derive from the
    # post-clip capacity (C * stream_expand). Set when the record capacity
    # is intentionally much larger than the live triangle count (identity
    # record layout, see geometry()) so stream sizing tracks the measured
    # bin-entry count instead. Overflow stays loud either way.
    stream_entry_cap: int = 0

    # Raster backend: "jnp" (portable, runs on CPU mesh tests),
    # "pallas_stream" / "pallas_smem" (TPU kernels), or "auto"
    # (pallas_stream on TPU, jnp elsewhere).
    backend: str = "auto"

    # Run Pallas kernels in interpret mode (the "sanitizer build",
    # SURVEY.md §5.2): exercises the kernel path on the CPU backend, e.g.
    # the stream kernel under a virtual shard_map mesh in tests.
    pallas_interpret: bool = False

    # Visibility strategy: "brute" (all tris x all pixels, small scenes),
    # "binned" (tile lists), or "auto" (brute below 2048 setup tris).
    raster_path: str = "auto"

    # Per-pixel record fetch strategy in the deferred pass: "wide" gathers
    # ONE (C, K) record row per pixel (output is lane-padded {1,0:T(8,128)},
    # plus one {0,1} relayout copy for the column consumers); "fields"
    # gathers each field from its own dense (C,) column array (dense (N,)
    # outputs, no relayout — but one gather op per field). Bit-identical
    # results; which is faster is scale-dependent (PERF.md round 3).
    deferred_fetch: str = "wide"

    # Id-range SPLIT of the per-pixel record table: the (C, K) table is cut
    # into record_split row-range slices, each pixel gathers ONE row from
    # EVERY slice (clamped id) and a range select keeps its own. Pointless
    # in the row-major gather regime (extra gathers, same result) — built
    # for capacities past XLA's ~300k-row layout-flip threshold where the
    # single gather runs at element rate (config5: C=430k): slices under
    # the threshold gather at row rate. Distinct from the round-2 "chunked
    # sub-threshold tables" (per-chunk recompute) and the round-3
    # multi-record packs (one gather, P*K columns): here each pixel still
    # materializes row-rate (N, K) outputs and ONE select. All values
    # bit-identical; measure before enabling (PERF.md).
    record_split: int = 1

    # Where the 6 per-record texture-LOD derivative terms come from in the
    # deferred pass: "record" (default) packs them as 6 record columns
    # (free in the row-major gather regime — row gathers are width-
    # independent); "recompute" rebuilds them per PIXEL from columns the
    # record already carries (xs, ys, uw, vw, 1/w) with the identical f32
    # op order (bit-exact). Pays only in the element-rate regime (table
    # past the layout flip), where 6 fewer gathered columns is ~19% of the
    # record-gather bytes (config5/config6 scale); costs ~30 VPU flops per
    # pixel. Measure before enabling (PERF.md round-3 record-fold lesson:
    # fusion boundaries shift unpredictably).
    lod_fetch: str = "record"

    # Texture quad fetch strategy for the (Ntex*P, 13) bilinear-quad table
    # in sample_trilinear; all values bit-identical. "wide" (default): one
    # 13-col row gather. "twolevel": two 4-texel own-quad gathers (l0+l1)
    # — 40% fewer gathered elements, predicted to win in the big-table
    # element-rate gather regime, but MEASURED 8.4 ms SLOWER end-to-end at
    # config6 (97.1 vs 88.7 ms; the extra qbase(l1) select chain plus
    # shifted fusion boundaries eat the saving — PERF.md round 3). Kept
    # selectable for re-testing. "fields": 13 per-column gathers (21x
    # slower at 1080p, PERF.md round 3).
    tex_fetch: str = "wide"

    # Id-range split of the texture QUAD table (the tex analog of
    # record_split, applied to tex_fetch="wide"): config6's 459k-row
    # ragged quad table gathers at element rate (12.8 ms vs 3.7 ms
    # row-rate — PERF.md round 3); splitting into sub-threshold row
    # ranges is the LOSSLESS alternative to the RaggedPyramid area cap.
    # Values bit-identical; measure before enabling.
    tex_split: int = 1

    # How path-A corner data (clip position + attributes) is fetched from
    # the vertex-stage outputs in geometry(). "pertri" (default): one
    # (T,3) fancy-index producing a (T,3,4+A) array — XLA lowers it as a
    # flat (3T,.) gather plus THREE 3-D layout copies reconciling the
    # consumers' layouts (~1.4 ms of pure relayout at config3, round-4
    # attribution of geometry.py's corner gather). "percorner": three
    # (T, 4+A) row gathers from one packed [clip|attr] vertex table —
    # every consumer is a contiguous column slice (the measured rewarded
    # gather shape) and projection/snap/cull run on dense (T,) columns,
    # stacking to (T,3) once at the end. Bit-identical by construction
    # (identical per-element f32/int op order). The round-3 batch only
    # measured a per-corner variant bundled with the losing record-fold;
    # this isolates it for a round-4 device A/B.
    corner_fetch: str = "pertri"

    # How per-pixel mip level sizes/offsets are produced in
    # sample_trilinear (uniform TexturePyramid only). "table" (default):
    # gathered from tiny static per-level arrays — XLA lowers these to
    # compare/select chains over every pixel (~1 ms/frame each at 1080p,
    # round-2 trace; the round-3 fix attempt folded them into the RECORD
    # and lost to slice-reduce fusions). "closed": exact closed forms on
    # the level index — size s = base >> l (power-of-two chain) and
    # offset(l) = 4*(base^2 - s^2)/3 (geometric row sum, exactly
    # divisible) — pure (N,) integer VPU ops, no per-pixel table reads.
    # Bit-identical by construction; requires base >> (num_levels-1) >= 1
    # and a uniform (non-ragged) pyramid, else it raises. Isolated
    # round-4 A/B axis (the round-3 batch never measured it alone).
    mip_math: str = "table"

    # How the integer record fields (xs, ys, mat_id) ride in the one f32
    # per-pixel record table (deferred pass). "value" (default): CONVERTED
    # to f32 — exact, since post-clip fixed-point coords are guard-band
    # bounded far below 2^24 (see __post_init__'s edge-overflow assert) —
    # and converted back after the gather. "bits": bitcast int32<->f32.
    # Bitcast packing puts denormal (small-int) and NaN-payload
    # (negative-int) bit patterns into f32 lanes, which TPU hardware may
    # legally mangle when XLA lowers the post-gather relayout through an
    # arithmetic op (denormals flush to zero, NaN payloads canonicalize) —
    # the prime suspect for the ambient-only Phong frames in ISSUES.md.
    # "split": int fields in their own natively-gathered int32 table (no
    # int bit patterns in f32 lanes at all — hazard-free fallback, but a
    # second per-pixel gather + relayout). All settings bit-identical on
    # backends that don't mangle.
    record_pack: str = "value"

    # Occlusion early-out in the streaming visibility kernel: skip a
    # record's whole band loop when its z_min is behind the tile's current
    # z-buffer max (recomputed per block). Pays on deep scenes (config-5
    # class, many fully-covered tiles); the per-block max-reduce costs more
    # than it saves on shallow ones (~+0.6 ms at config3 — PERF.md r3).
    z_earlyout: bool = False

    # FRONT-TO-BACK bin ordering (VERDICT r4 #1): sort each tile's bin
    # segment by quantized triangle z_min (ascending) instead of by id.
    # The (z, id) lex-min resolve is order-independent, so images are
    # bit-identical; what changes is z_earlyout's effectiveness — the
    # z-buffer converges after the nearest few records and everything
    # behind them is rejected by one scalar compare per record (the
    # visibility kernel is scalar-bound, so rejected records are ~10x
    # cheaper than rasterized ones). Costs a wider key-value bin sort.
    # Pointless without z_earlyout; measure on device before defaulting.
    bin_zorder: bool = False

    # Optional refinements of the z early-out (bit-identical; both need
    # z_earlyout). Measured on device (PERF.md round 5): both ADD per-record
    # scalar overhead that only pays when whole chunks/bands actually get
    # skipped, and config5's terrain fly-through mostly doesn't — kernel
    # ~32 -> 36.9 ms with both on — so they default off and stay selectable.
    # z_chunk_gate: the stream prep aggregates min(z_min) per CHUNK_G
    # consecutive records; the kernel gates whole chunks behind one compare
    # (pays when occluded records cluster, e.g. with bin_zorder).
    # z_band_gate: per-8-row-band zmax bounds let a surviving record skip
    # the vector work of bands it cannot win (pays on deep scenes whose
    # bands converge at different times).
    z_chunk_gate: bool = False
    z_band_gate: bool = False

    # Shadow mapping (MODE_PHONG only).
    shadow_map_size: int = 0  # 0 => no shadow pass
    shadow_bias: float = 2e-3

    # Alpha blending (the reference PSO's blend-state axis, SURVEY.md §2.1).
    # When True, triangles whose material alpha < 1 are excluded from every
    # visibility pass (win no pixels, cast no shadows) and composited
    # back-to-front in SOURCE TRIANGLE ORDER over the shaded frame (clipped
    # fans inherit their parent's order via TriBuf.src_id), depth-tested
    # read-only against the opaque z-buffer: out = dst*(1-a) + src*a.
    # See xr/shading/blend.py for the contract and v1 shading scope.
    blend: bool = False
    blend_capacity: int = 128  # max transparent records (overflow is loud)
    blend_chunk: int = 8  # fragment-math batch size within the composite

    # In-jit numeric sanitizer (SURVEY.md §5.2(a); VERDICT r4 #6): when
    # True the frame program counts non-finite values INSIDE the traced
    # step at every stage boundary (input arrays, post-clip records,
    # resolved depth, shaded color) into nf_* stats, and strict readback
    # raises naming the FIRST offending stage — host-side validation
    # (xr/app/validate.py) can only say "the frame is bad", this says
    # where it went bad. Off by default: the checks are fused reductions
    # but still touch every array once.
    debug_checks: bool = False

    # Multi-chip screen-band sharding (SURVEY.md §2.4/§5.8): number of
    # devices the framebuffer is sharded across (1 => single device).
    num_shards: int = 1

    # Clear color (the reference's RTV clear; SURVEY.md §3.2).
    bg_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    def __post_init__(self):
        assert self.mode in MODE_NAMES, f"unknown mode {self.mode}"
        assert self.width > 0 and self.height > 0
        # int32 edge-function overflow guard (xr/core/fixedpoint.py).
        sub = 1 << self.subpixel_bits
        span = max(self.width, self.height) * sub * (1.0 + self.guard_band) / 2.0 * 2.0
        assert 2.0 * span * span < 2**31, (
            "subpixel_bits/guard_band too large for exact int32 edge functions "
            f"at {self.width}x{self.height}"
        )
        assert self.record_pack in ("value", "bits", "split")
        assert self.bin_pairs in (2, 4)
        assert self.record_split >= 1
        assert self.lod_fetch in ("record", "recompute")
        assert not (self.record_split > 1 and self.record_pack == "split"), (
            "record_split composes with the unified record table only "
            "(record_pack 'value'/'bits')"
        )
        assert not (self.record_split > 1 and self.deferred_fetch != "wide"), (
            "record_split applies to the wide record fetch only"
        )
        assert self.tex_split >= 1
        assert not (self.tex_split > 1 and self.tex_fetch != "wide"), (
            "tex_split applies to the wide quad fetch only"
        )
        assert self.mip_math in ("table", "closed")
        assert not ((self.z_chunk_gate or self.z_band_gate) and not self.z_earlyout), (
            "z_chunk_gate/z_band_gate refine the z early-out; set z_earlyout"
        )
        assert self.corner_fetch in ("pertri", "percorner")
        if self.record_pack == "value":
            # value-packed record coords must be exact in f32: the geometry
            # stage clamps |coord| <= (8*max(W,H)+64)*sub (project_snap)
            lim = (8 * max(self.width, self.height) + 64) * sub
            assert lim < 2**24, (
                "framebuffer too large for exact f32 value-packed records; "
                "use record_pack='bits'"
            )

    @property
    def attr_width(self) -> int:
        return MODE_ATTR_WIDTH[self.mode]

    @property
    def subpixel(self) -> int:
        return 1 << self.subpixel_bits


# ---------------------------------------------------------------------------
# Scene pytrees
# ---------------------------------------------------------------------------


class Mesh(struct.PyTreeNode):
    """Triangle mesh as structure-of-arrays (SURVEY.md §2.1 "Mesh loading").

    positions:    (V, 3) f32
    normals:      (V, 3) f32 (unit)
    uvs:          (V, 2) f32
    indices:      (T, 3) i32 — CCW front faces (pre-projection)
    material_id:  (T,)  i32 — index into Scene.materials rows
    transform_id: (V,)  i32 — index into Scene.model_matrices
    vert_mat:     optional (V,) i32 — per-vertex material id (min over
                  using triangles), a SCENE-STATIC value that the vertex
                  stage otherwise recomputes every frame (a 22 ms/frame
                  device scatter at 1M tris). Attach with
                  xr.scene.procedural.with_vert_mat.
    """

    positions: Any
    normals: Any
    uvs: Any
    indices: Any
    material_id: Any
    transform_id: Any
    vert_mat: Any = None

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]


class Camera(struct.PyTreeNode):
    """Perspective camera (reference's FPSCamera analog, SURVEY.md §2.1).

    View/projection conventions are defined by xr.core.math3d (D3D-style
    z in [0, 1] clip range; see that module's docstring).
    Scalar fields may be traced for animated fly-throughs.
    """

    eye: Any  # (3,) f32
    target: Any  # (3,) f32
    up: Any  # (3,) f32
    fov_y: Any  # scalar, radians
    near: Any  # scalar
    far: Any  # scalar


class Lights(struct.PyTreeNode):
    """Light set. Directional and point lights; ambient term.

    dir_dirs:   (Ld, 3) f32 — direction light TRAVELS (shading uses -dir)
    dir_colors: (Ld, 3) f32
    pt_pos:     (Lp, 3) f32
    pt_colors:  (Lp, 3) f32
    ambient:    (3,) f32
    """

    dir_dirs: Any
    dir_colors: Any
    pt_pos: Any
    pt_colors: Any
    ambient: Any

    @staticmethod
    def make(
        dir_dirs=None,
        dir_colors=None,
        pt_pos=None,
        pt_colors=None,
        ambient=(0.1, 0.1, 0.1),
    ) -> "Lights":
        z3 = np.zeros((0, 3), np.float32)

        def arr(x):
            return z3 if x is None else np.asarray(x, np.float32).reshape(-1, 3)

        return Lights(
            dir_dirs=arr(dir_dirs),
            dir_colors=arr(dir_colors),
            pt_pos=arr(pt_pos),
            pt_colors=arr(pt_colors),
            ambient=np.asarray(ambient, np.float32),
        )


class Material(struct.PyTreeNode):
    """Material table, one row per material (SURVEY.md §2.1 Material/texture).

    base_color: (M, 3) f32
    ka, kd, ks: (M,) f32 — ambient/diffuse/specular coefficients
    shininess:  (M,) f32
    tex_id:     (M,) i32 — index into Scene.textures' first axis, -1 = none
    """

    base_color: Any
    ka: Any
    kd: Any
    ks: Any
    shininess: Any
    tex_id: Any
    # per-material opacity in [0, 1]; rows with alpha < 1 participate in
    # the blended pass when RenderConfig.blend is set (xr/shading/blend.py).
    # None (legacy constructions) means fully opaque.
    alpha: Any = None
    # per-material texture address mode: 0 = repeat-wrap (default), 1 =
    # clamp-to-edge (MTL `map_Kd -clamp on`). None = all repeat.
    tex_addr: Any = None

    @staticmethod
    def table(rows) -> "Material":
        """rows: list of dicts with keys base_color, ka, kd, ks, shininess,
        tex_id, alpha."""
        def col(k, d, dt=np.float32):
            return np.asarray([r.get(k, d) for r in rows], dt)

        return Material(
            base_color=col("base_color", (1.0, 1.0, 1.0)),
            ka=col("ka", 1.0),
            kd=col("kd", 1.0),
            ks=col("ks", 0.0),
            shininess=col("shininess", 32.0),
            tex_id=col("tex_id", -1, np.int32),
            alpha=col("alpha", 1.0),
            # None when every material wraps: the sampler then traces ZERO
            # address-mode ops (the common case pays nothing)
            tex_addr=(
                col("tex_addr", 0, np.int32)
                if any(r.get("tex_addr", 0) for r in rows)
                else None
            ),
        )


class TexturePyramid(struct.PyTreeNode):
    """All scene textures with full mip chains, flattened into ONE gatherable
    buffer so per-pixel dynamic LOD is a plain vectorized gather on TPU
    (BASELINE.json:5 "texture sampling as vectorized gathers with mip
    selection"). Textures must be square power-of-two and share a size.

    data:  (Ntex, P, 3) f32 where P = sum over levels of (S>>k)^2; level k
           is stored row-major at `level_offset(k)`. Reference copy used for
           building/tests.
    quads: (Ntex, P, 4) u32 — the SAMPLING layout: row p holds the 2x2
           wrap-neighbor texel quad anchored at texel p, each texel packed
           RGB8 into a u32 (8-bit texel quantization, like any real GPU
           texture). One gather fetches a whole bilinear footprint.
    """

    data: Any
    quads: Any = None
    base_size: int = struct.field(pytree_node=False, default=0)
    num_levels: int = struct.field(pytree_node=False, default=0)

    def level_size(self, k: int) -> int:
        return max(self.base_size >> k, 1)

    def level_offset(self, k: int) -> int:
        return sum(self.level_size(j) ** 2 for j in range(k))

    @property
    def num_textures(self) -> int:
        return self.data.shape[0]


class RaggedPyramid(struct.PyTreeNode):
    """Mixed-size texture pyramid: every texture keeps its NATIVE square
    power-of-two size (no cross-texture resampling loss — SURVEY.md §2.1
    Material/texture, the reference's per-image texture sizes). All mip
    chains flatten into ONE gatherable buffer; small per-(texture, level)
    tables drive the per-pixel index math (gathered per pixel like the
    uniform pyramid's level tables).

    data:   (Ptotal, 3) f32 — reference texels (build/tests)
    quads:  (Ptotal, 13) u32 — sampling layout (see TexturePyramid.quads)
    level_offset: (Ntex, Lmax) i32 — start row of (tex, level); levels past
            a texture's native chain repeat its last (1x1) level
    level_size:   (Ntex, Lmax) i32 — texel width of (tex, level), min 1
    base_size_per_tex: (Ntex,) i32 — native size (per-pixel LOD scale)
    num_levels: int — Lmax = max native chain length (static)
    """

    data: Any
    quads: Any
    level_offset: Any
    level_size: Any
    base_size_per_tex: Any
    num_levels: int = struct.field(pytree_node=False, default=0)

    @property
    def num_textures(self) -> int:
        return self.level_offset.shape[0]


class Scene(struct.PyTreeNode):
    """A complete renderable scene: one merged mesh (all draws batched into a
    single device-wide triangle array per frame, SURVEY.md §2.4), materials,
    a mip pyramid of textures, lights, and per-instance model matrices.

    model_matrices: (M, 4, 4) f32, indexed by Mesh.transform_id.
    """

    mesh: Mesh
    materials: Material
    textures: Optional[TexturePyramid]
    lights: Lights
    model_matrices: Any


class Frame(struct.PyTreeNode):
    """Per-frame render output (the swapchain-present replacement is a
    device-to-host readback of this struct + image dump, BASELINE.json:5).

    color: (H, W, 3) u8
    depth: (H, W) f32 (NDC z in [0,1]; 1.0 = background)
    stats: dict of scalar counters (tris in/culled/clipped, fragments shaded,
           bin/clip overflow flags) — SURVEY.md §5.5 observability.
    """

    color: Any
    depth: Any
    stats: Any


def as_numpy_scene(scene: Scene) -> Scene:
    """Deep-copy a scene with all leaves as numpy arrays (for the oracle)."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), scene)
