"""CPU stand-in for the external KNN_CUDA wheel (reference run_robot.py:14).

Same contract as knn_cuda.KNN (https://github.com/unlimblue/KNN_CUDA):
`KNN(k, transpose_mode)(ref, query) -> (dist, idx)` with EUCLIDEAN distances
ascending, shapes (B, n_query, k); transpose_mode=False takes channel-first
(B, D, N) inputs. Pure torch so the reference's evaluator runs on this
CUDA-less host (reverse-direction parity harness, scripts/reverse_parity.py).
"""

import torch


class KNN(torch.nn.Module):
    def __init__(self, k: int, transpose_mode: bool = True):
        super().__init__()
        self.k = k
        self.transpose_mode = transpose_mode

    def forward(self, ref, query):
        if not self.transpose_mode:  # (B, D, N) -> (B, N, D)
            ref = ref.transpose(1, 2).contiguous()
            query = query.transpose(1, 2).contiguous()
        d = torch.cdist(query.float(), ref.float())  # (B, M, N)
        dist, idx = torch.topk(d, self.k, dim=-1, largest=False, sorted=True)
        return dist, idx
