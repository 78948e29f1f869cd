"""romp_tpu — TPU-native multi-person 3D human mesh recovery.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Arthur151/ROMP
(ROMP one-stage multi-person SMPL regression, BEV bird's-eye-view all-age
recovery, TRACE temporal 5D video regression), designed TPU-first:

- the full inference graph (preprocess -> backbone -> center-heatmap parse ->
  per-person parameter sampling -> SMPL LBS -> projection) is one jittable,
  fixed-shape function; dynamic person counts are (K, ...) tensors + masks,
- SPMD scaling via one `jax.sharding.Mesh` (no DataParallel machinery),
- thin host loops only for tracking, temporal smoothing, rendering and IO.

Reference behavior parity is cited per-module against /root/reference files.
"""

__version__ = "0.1.0"
