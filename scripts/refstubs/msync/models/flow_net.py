"""Inert FlowNet shell: importable (utils/sapien_utils.py:15) but unused
under --evaluate; raises if actually forwarded."""

import torch.nn as nn


class FlowNet(nn.Module):
    def forward(self, *a, **k):
        raise RuntimeError("msync refstub: FlowNet is not available "
                           "(reverse parity runs --evaluate only)")
