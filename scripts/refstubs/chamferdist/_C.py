"""Pure-torch implementation of the two chamferdist._C entry points the
reference uses (utils/chamfer.py:174,206 — the pytorch3d knn_points kernels):

  knn_points_idx(p1, p2, lengths1, lengths2, K, version) -> (idx, dists)
      dists are SQUARED euclidean (pytorch3d convention), ascending over K.
  knn_points_backward(p1, p2, lengths1, lengths2, idx, grad_dists)
      gradient of sum(grad_dists * dists) w.r.t. p1 and p2.
"""

import torch


def _masked_sq_dists(p1, p2, lengths1, lengths2):
    d = torch.cdist(p1.float(), p2.float()) ** 2  # (N, P1, P2)
    if lengths2 is not None:
        mask2 = (torch.arange(p2.shape[1], device=p2.device)[None]
                 >= lengths2[:, None])  # (N, P2) True where padded
        d = d.masked_fill(mask2[:, None, :], float("inf"))
    return d


def knn_points_idx(p1, p2, lengths1, lengths2, K, version):
    d = _masked_sq_dists(p1, p2, lengths1, lengths2)
    dists, idx = torch.topk(d, K, dim=-1, largest=False, sorted=True)
    dists = torch.nan_to_num(dists, posinf=0.0)  # pytorch3d pads with zeros
    if lengths1 is not None:
        mask1 = (torch.arange(p1.shape[1], device=p1.device)[None]
                 >= lengths1[:, None])  # (N, P1)
        dists = dists.masked_fill(mask1[:, :, None], 0.0)
        idx = idx.masked_fill(mask1[:, :, None], 0)
    return idx, dists


def knn_points_backward(p1, p2, lengths1, lengths2, idx, grad_dists):
    # d = ||p1_i - p2_idx||^2 ; dd/dp1_i = 2 (p1_i - p2_idx)
    n, l1, k = idx.shape
    p2_nn = torch.gather(
        p2[:, :, None, :].expand(n, p2.shape[1], k, p2.shape[2]),
        1, idx[..., None].expand(n, l1, k, p2.shape[2]))
    diff = 2.0 * (p1[:, :, None, :] - p2_nn)         # (N, P1, K, D)
    grad_p1 = (grad_dists[..., None] * diff).sum(2)  # (N, P1, D)
    grad_p2 = torch.zeros_like(p2)
    flat_idx = idx.reshape(n, -1)                    # (N, P1*K)
    contrib = (-(grad_dists[..., None] * diff)).reshape(n, -1, p2.shape[2])
    grad_p2.scatter_add_(
        1, flat_idx[..., None].expand_as(contrib), contrib)
    return grad_p1, grad_p2
