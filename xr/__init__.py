"""xr — a TPU-native 3D rasterization renderer.

A brand-new framework with the capabilities of ``jknuuttila/xor-renderer``
(an experimental C++/Direct3D 12 renderer; see SURVEY.md for the structural
analysis — the reference mount was empty, so parity claims cite SURVEY.md /
BASELINE.json rather than reference file:line).

The whole per-frame pipeline — vertex transform, clipping, triangle setup,
screen-tile binning, edge-function rasterization, depth resolve, and
flat/Gouraud/textured/Phong shading — is compiled as one XLA program per
render config (BASELINE.json:5), with the per-tile visibility pass available
as a Pallas TPU kernel and multi-chip frames sharded per screen-tile band
with a final framebuffer all-gather over ICI.
"""

__version__ = "0.1.0"

from xr.core.types import (  # noqa: F401
    MODE_FLAT,
    MODE_GOURAUD,
    MODE_TEXTURED,
    MODE_PHONG,
    MODE_DEPTH_ONLY,
    RenderConfig,
    Mesh,
    Camera,
    Lights,
    Material,
    Scene,
    Frame,
)

__all__ = [
    "MODE_FLAT", "MODE_GOURAUD", "MODE_TEXTURED", "MODE_PHONG",
    "MODE_DEPTH_ONLY", "RenderConfig", "Mesh", "Camera", "Lights",
    "Material", "Scene", "Frame", "Renderer", "ShardedRenderer",
    "render_frame",
]


def __getattr__(name):
    # lazy: importing the renderers pulls in jax device init
    if name == "Renderer":
        from xr.app.renderer import Renderer

        return Renderer
    if name == "ShardedRenderer":
        from xr.dist.shard import ShardedRenderer

        return ShardedRenderer
    if name == "render_frame":
        from xr.cpu_ref import render_frame

        return render_frame
    raise AttributeError(name)
