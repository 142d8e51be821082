"""Application layer: Renderer.step API, frame runner, readback + dumps."""
