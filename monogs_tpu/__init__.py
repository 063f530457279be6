"""monogs_tpu — TPU-native Gaussian Splatting SLAM (JAX/XLA/Pallas/pjit).

A from-scratch, TPU-first framework with the capabilities of MonoGS
(Gaussian Splatting SLAM, CVPR 2024; reference: s-esposito/MonoGS):
a dense visual SLAM system whose only map representation is a differentiable
3D Gaussian splat cloud.

Layer map (TPU-native counterpart of reference SURVEY.md §1):
  ops/       — math core + the differentiable tile rasterizer (Pallas kernels)
  models/    — the GaussianMap pytree (static-capacity SoA, densify/prune)
  slam/      — tracker (pose optimization), mapper (map optimization), system
  parallel/  — device mesh, sharded mapping window (pjit/shard_map)
  data/      — dataset parsers (TUM/Replica/EuRoC/Kubric/DAVIS) + synthetic
  utils/     — config, logging, evaluation (ATE/PSNR/SSIM/LPIPS), PLY, ckpt
"""

__version__ = "0.1.0"
