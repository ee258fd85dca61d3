"""ht3dgs — TPU-native SfM-free 3D Gaussian Splatting via Hierarchical Training.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
jibo27/3DGS_Hierarchical_Training (CVPR 2025, arXiv 2412.01553), re-designed
TPU-first:

- `core/`     pure-pytree Gaussian state, SE(3) Lie ops (replaces lietorch),
              spherical harmonics, camera math, surgery-capable Adam.
- `raster/`   differentiable Gaussian rasterizer: a pure-jnp oracle, a
              tile-binned XLA renderer, and Pallas TPU kernels for the hot
              blend loops (replaces diff-gaussian-rasterization CUDA).
- `train/`    jitted train steps, masked densify/prune compaction, losses,
              the hierarchical-training orchestrator (leaf/non-leaf/merge/MSS).
- `data/`     dataset readers (images_only / COLMAP / Blender / CO3D),
              depth + VFI providers, PLY IO.
- `parallel/` jax.sharding Mesh + shard_map multi-chip training.
- `eval/`     PSNR/SSIM/LPIPS, ATE/RPE pose eval, trajectory synthesis.
- `native/`   C++ runtime components (grid-accelerated KNN; replaces
              simple-knn CUDA) bound via ctypes.
"""

__version__ = "0.1.0"
