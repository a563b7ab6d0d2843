"""fisher_nerf_customized_tpu — TPU-native active-mapping framework.

A ground-up JAX/XLA/Pallas re-design of a FisherRF-style active-mapping
system (reference: davidea97/Fisher-Nerf-customized): online 3D Gaussian
Splatting SLAM, occupancy mapping, frontier exploration, Fisher-information
(EIG) view selection, A* path planning, and object-centric reconstruction —
all built for TPU hardware (static shapes, fused jitted update functions,
vmap-batched candidate evaluation, `shard_map` scale-out over device meshes).

Layer map (mirrors reference SURVEY.md §1, re-architected):
  ops/       — splatting kernels: projection, tile binning, alpha blending,
               Fisher/EIG backward (reference: thirdparty/diff-gaussian-
               rasterization-modified CUDA kernels → here pure-XLA + Pallas)
  models/    — Gaussian map state + SLAM runtimes (reference: models/SLAM/)
  planning/  — occupancy grid, frontiers, A*, candidate sampling
               (reference: planning/astar.py, frontier_exploration/)
  engine/    — episode drivers, action compiler, evaluation, checkpointing
               (reference: tester_gaussians_navigation.py, tester_navigator.py)
  envs/      — simulator adapters incl. hermetic FakeSim
               (reference: datasets/dataloader.py, SimObjects.py)
  parallel/  — device-mesh sharding of candidate eval / tiles / scenes
               (no reference analog: the reference is single-GPU)
  config/    — typed config tree, YAML-compatible with the reference's YACS
               files (reference: configs/base_config.py)
"""

__version__ = "0.1.0"
