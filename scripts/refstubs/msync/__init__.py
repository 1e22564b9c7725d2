"""Stand-in for the external multibody-sync repo (reverse-parity only).

The reference imports msync at module scope in run_sapien.py:25 /
utils/sapien_utils.py:15-17 and dataset/dataset_sapien.py:5 even when the
flow nets are unused (--evaluate). This package supplies exactly that import
surface: a REAL Isometry (the dataset composes GT motion with it — the math
must be correct) and inert module shells for the networks.
"""
