"""Core utilities: math, types, fixed-point raster semantics, image I/O."""
