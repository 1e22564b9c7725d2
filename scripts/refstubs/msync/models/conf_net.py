"""Inert ConfNet shell (utils/sapien_utils.py:16)."""

import torch.nn as nn


def get_network_input(*a, **k):
    raise RuntimeError("msync refstub: not available under --evaluate")


class ConfNet(nn.Module):
    def forward(self, *a, **k):
        raise RuntimeError("msync refstub: ConfNet is not available "
                           "(reverse parity runs --evaluate only)")
