"""Inert MotNet shell (utils/sapien_utils.py:17)."""

import torch.nn as nn


class MotNet(nn.Module):
    def forward(self, *a, **k):
        raise RuntimeError("msync refstub: MotNet is not available "
                           "(reverse parity runs --evaluate only)")
