"""Math core and rasterization ops (pure JAX + Pallas kernels)."""
