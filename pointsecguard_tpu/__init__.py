"""pointsecguard_tpu — TPU-native point-cloud segmentation robustness framework.

A single JAX/XLA/Pallas/pjit stack providing the capabilities of the
PointSecGuard reference (PointNet++ / RandLA-Net / DenseDeepGCN semantic
segmentation on S3DIS plus the four color-perturbation attacks NB / NU /
tar_NB / tar_NU), re-designed TPU-first:

- point ops (FPS, ball query, kNN, grouping, interpolation) are jittable
  XLA/Pallas kernels instead of CUDA/C++/nanoflann host code,
- the attack loops are fused on-device ``lax.scan`` programs instead of
  per-iteration host round-trips,
- scaling is data-parallel ``jit`` over a ``jax.sharding.Mesh``.

See SURVEY.md for the structural map of the reference this build follows.
"""

__version__ = "0.1.0"

from pointsecguard_tpu import ops  # noqa: F401
