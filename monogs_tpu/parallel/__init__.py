"""Device-mesh parallelism: sharded keyframe-window mapping (pjit/SPMD)."""
