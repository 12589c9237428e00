"""Data layer: joint skeletons, geometry, on-device warp/augment, datasets,
and the host->HBM input pipeline. Reference: ``data/`` +
``common/utils/pose_utils.py``."""
