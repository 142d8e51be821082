"""Scene construction: procedural meshes, textures, presets, OBJ I/O."""
