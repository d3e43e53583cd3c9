"""pytorch_wavelets stub: DWTForward (J=1 haar) for the reference's HWD.
Parameter-free exact Haar implementation."""
import torch
import torch.nn as nn


class DWTForward(nn.Module):
    def __init__(self, J=1, mode='zero', wave='haar'):
        super().__init__()
        assert J == 1 and wave == 'haar'

    def forward(self, x):
        a = x[..., 0::2, 0::2]
        b = x[..., 0::2, 1::2]
        c = x[..., 1::2, 0::2]
        d = x[..., 1::2, 1::2]
        ll = (a + b + c + d) / 2
        hl = (a - b + c - d) / 2
        lh = (a + b - c - d) / 2
        hh = (a - b - c + d) / 2
        return ll, [torch.stack([hl, lh, hh], dim=2)]
