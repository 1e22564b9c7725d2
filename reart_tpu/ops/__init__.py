"""Neighbor / sampling ops: the TPU-native replacements for the reference's
CUDA kernel zoo (pointnet2_cuda, knn_cuda, chamferdist._C — reference
networks/pointnet_lib/src/*, utils/chamfer.py).

Everything is O(N^2) tiled-matmul distance work: with N <= 4096 points that
maps straight onto the MXU and beats sparse cleverness. Backward passes that
the reference implements with atomicAdd scatters are left to XLA's native
gather/scatter autodiff.
"""

from reart_tpu.ops.distance import (
    pairwise_sqdist,
    knn,
    nearest_neighbor,
    chamfer,
    chamfer_loss,
    knn_transfer_labels,
    knn_transfer_features,
)
from reart_tpu.ops.sampling import (
    farthest_point_sample,
    masked_farthest_point_sample,
    ball_query,
    index_points,
    index_points_mm,
)
from reart_tpu.ops.interpolate import (
    three_interpolate,
    blend_anchor_motion,
)
