"""Deferred shading pass (single-sourced shading semantics)."""
