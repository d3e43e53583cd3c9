import math

import torch
import torch.nn as nn


class ModulatedDeformConv2d(nn.Module):
    """Faithful to mmcv ModulatedDeformConv2d's parameter layout:
    weight (out, in/groups, kh, kw), optional bias (out,)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, deform_groups=1, bias=True):
        super().__init__()
        kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
        self.in_channels, self.out_channels = in_channels, out_channels
        self.kernel_size = (kh, kw)
        self.stride = (stride, stride) if isinstance(stride, int) else stride
        self.padding = (padding, padding) if isinstance(padding, int) else padding
        self.dilation = (dilation, dilation) if isinstance(dilation, int) else dilation
        self.groups, self.deform_groups = groups, deform_groups
        self.weight = nn.Parameter(torch.empty(out_channels, in_channels // groups, kh, kw))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        n = (in_channels // groups) * kh * kw
        stdv = 1.0 / math.sqrt(n)
        self.weight.data.uniform_(-stdv, stdv)

    def init_weights(self):
        pass

    def forward(self, *a, **k):
        raise NotImplementedError('refstub: param counting only')


def modulated_deform_conv2d(*a, **k):
    raise NotImplementedError('refstub: param counting only')
