"""CPU reference rasterizer — the golden oracle (SURVEY.md §2.3)."""
from xr.cpu_ref.oracle import render_frame, visibility_bbox  # noqa: F401
