"""Math core + differentiable rasterizer ops (pure JAX + Pallas)."""
