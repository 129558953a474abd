"""lsdtpu: TPU-native line-feature localization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Pyrokine/LineSegmentDetector-SLAM: LSD map-line extraction, RDP scan
segmentation, dense batched scan-to-map feature association with a
distance-field prior, and odometry-fused UKF pose tracking - built for
TPU (static shapes, masked dense compute, vmap/shard_map parallelism)
rather than translated from the reference's pthread/OpenCV design.
"""

__version__ = "0.1.0"
