"""Scene/data layer: COLMAP / Blender(D-NeRF) / Nerfies readers, cameras."""
