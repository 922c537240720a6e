"""TPU-native multi-view motion-capture framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
khanhha/multiview_motion_capture (cross-view tracking for multi-human 3D pose
estimation, arXiv:2003.03972 + temporal IK / bone-length optimization):

- batched epipolar geometry + DLT triangulation kernels (ops.geometry,
  ops.triangulate) instead of per-pair Python loops,
- a device-resident ALS multi-way matching solver (ops.association) instead of
  the numpy ADMM loop,
- a fully jittable fixed-capacity tracker step scanned over frames
  (tracker.py) instead of a Python object state machine,
- a batched Levenberg-Marquardt inverse-kinematics solver vmapped over all
  tracked people simultaneously (ops.ik) instead of serial scipy
  least_squares,
- an on-TPU 2D keypoint CNN (models.pose_net) replacing the external OpenPose
  binary,
- multi-chip scaling via jax.sharding meshes (parallel/).

Reference parity notes cite /root/reference files as `ref:file:line`.
"""

__version__ = "0.1.0"

from multiview_motion_capture_tpu.config import PipelineConfig  # noqa: F401
