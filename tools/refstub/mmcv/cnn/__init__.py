import torch.nn as nn


def build_activation_layer(cfg):
    cfg = dict(cfg)
    t = cfg.pop('type')
    if t == 'HSigmoid':
        bias, divisor = cfg.get('bias', 3.0), cfg.get('divisor', 6.0)

        class _HSig(nn.Module):
            def forward(self, x):
                return (x + bias).clamp(0, divisor) / divisor

        return _HSig()
    if t == 'ReLU':
        return nn.ReLU(inplace=cfg.get('inplace', False))
    if t == 'GELU':
        return nn.GELU()
    if t == 'SiLU':
        return nn.SiLU()
    raise NotImplementedError(t)


def build_norm_layer(cfg, num_features, postfix=''):
    cfg = dict(cfg)
    t = cfg.pop('type')
    cfg.pop('requires_grad', None)
    if t == 'GN':
        return f'gn{postfix}', nn.GroupNorm(cfg.pop('num_groups'), num_features)
    if t == 'BN':
        return f'bn{postfix}', nn.BatchNorm2d(num_features)
    raise NotImplementedError(t)


class ConvModule(nn.Module):
    """Faithful param layout: conv (+ optional norm, act)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, bias='auto', conv_cfg=None, norm_cfg=None, act_cfg=None):
        super().__init__()
        with_norm = norm_cfg is not None
        if bias == 'auto':
            bias = not with_norm
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size, stride, padding,
                              dilation, groups, bias=bias)
        if with_norm:
            self.norm_name, norm = build_norm_layer(norm_cfg, out_channels)
            self.add_module(self.norm_name, norm)
        if act_cfg is not None:
            self.activate = build_activation_layer(act_cfg)

    def forward(self, x):
        x = self.conv(x)
        if hasattr(self, 'norm_name'):
            x = getattr(self, self.norm_name)(x)
        if hasattr(self, 'activate'):
            x = self.activate(x)
        return x
