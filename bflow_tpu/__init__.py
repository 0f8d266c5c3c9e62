"""bflow_tpu — TPU-native continuous-time optical flow from event cameras.

A ground-up JAX/XLA/Pallas re-design of the capabilities of uzh-rpg/bflow
(RAFT-Spline: "Dense Continuous-Time Optical Flow from Event Cameras",
TPAMI 2024): recurrent optical-flow networks that regress per-pixel Bezier
curves in time from event-camera voxel grids, optionally fused with frames.

Design principles (TPU-first, not a port):
  * NHWC layout everywhere; convs/matmuls land on the MXU.
  * The full forward (feature extraction, all-pairs correlation, the
    12-iteration GRU refinement) is one jitted graph with static shapes;
    Bezier time/binomial coefficients are compile-time constants.
  * Scaling via `jax.sharding.Mesh` + NamedSharding (data axis over ICI),
    not an external DDP wrapper.
  * Hot gather/scatter paths (correlation lookup, event voxelization) have
    Pallas TPU kernels with XLA fallbacks.
"""

__version__ = "0.1.0"
