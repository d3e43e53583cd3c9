# minimal stub so the reference imports on CPU for param counting
__version__ = '0.17.0'
class _Ops:
    def nms(self, *a, **k): raise NotImplementedError

import torch as _torch
import torch.nn as _nn


class _DeformConv2d(_nn.Module):
    """Faithful to torchvision.ops.DeformConv2d's parameter layout:
    weight (out, in/groups, kh, kw), optional bias (out,)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias=True):
        super().__init__()
        kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
        self.weight = _nn.Parameter(_torch.empty(out_channels, in_channels // groups, kh, kw))
        self.bias = _nn.Parameter(_torch.zeros(out_channels)) if bias else None

    def forward(self, *a, **k):
        raise NotImplementedError("refstub: param counting only")


_Ops.DeformConv2d = _DeformConv2d
ops = _Ops()
from torchvision import datasets, transforms
