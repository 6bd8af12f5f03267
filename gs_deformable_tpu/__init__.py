"""TPU-native deformable 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``Heng14/gaussian-splatting_deformable`` (mounted read-only at /root/reference):
differentiable tile-based 3D Gaussian splatting with a time-conditioned
deformation network, adaptive densification, and multi-chip sharded training.

Layer map (mirrors SURVEY.md section 1, re-architected TPU-first):

- ``ops``      — math core + rasterizer (dense oracle and Pallas tiled kernels)
- ``models``   — Gaussian parameter state (fixed capacity) + deformation nets
- ``data``     — COLMAP / Blender(D-NeRF) / Nerfies scene readers, cameras
- ``parallel`` — device-mesh sharded train/render steps
- ``io``       — PLY / checkpoint I/O (native-accelerated where available)
- ``utils``    — schedules, losses, image metrics, logging
"""

__version__ = "0.1.0"
