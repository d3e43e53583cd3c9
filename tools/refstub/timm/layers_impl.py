import torch, torch.nn as nn, collections.abc, itertools, math

class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__(); self.drop_prob = drop_prob
    def forward(self, x): return x

def _ntuple(n):
    def parse(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(itertools.repeat(x, n))
    return parse

to_2tuple = _ntuple(2)
to_ntuple = _ntuple

def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
    with torch.no_grad():
        tensor.normal_(mean, std).clamp_(a, b)
    return tensor

def variance_scaling_(tensor, **kw): return tensor
def lecun_normal_(tensor): return tensor

class SqueezeExcite(nn.Module):
    """Faithful to timm's SqueezeExcite: rd = make_divisible(c*ratio, 8,
    round_limit=0), 1x1 reduce -> act -> 1x1 expand -> sigmoid gate."""
    def __init__(self, channels, rd_ratio=1. / 16, rd_channels=None, rd_divisor=8, **k):
        super().__init__()
        if not rd_channels:
            rd_channels = make_divisible(channels * rd_ratio, rd_divisor, round_limit=0.)
        self.fc1 = nn.Conv2d(channels, rd_channels, 1, bias=True)
        self.act = nn.ReLU(inplace=True)
        self.fc2 = nn.Conv2d(rd_channels, channels, 1, bias=True)
        self.gate = nn.Sigmoid()
    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        return x * self.gate(self.fc2(self.act(self.fc1(s))))

def make_divisible(v, divisor=8, min_value=None, round_limit=.9):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v: new_v += divisor
    return new_v

class CondConv2d(nn.Module):
    """Faithful to timm CondConv2d's parameter layout: weight
    (num_experts, out*in/groups*kh*kw), optional bias (num_experts, out)."""
    def __init__(self, in_chs, out_chs, kernel_size=3, stride=1, padding='', dilation=1,
                 groups=1, bias=False, num_experts=4):
        super().__init__()
        import torch as _t
        self.in_chs, self.out_chs, self.groups = in_chs, out_chs, groups
        self.kernel_size = (kernel_size, kernel_size)
        self.stride, self.dilation = stride, dilation
        self.padding = kernel_size // 2 if padding in ('', None) else padding
        num_w = out_chs * (in_chs // groups) * kernel_size * kernel_size
        self.weight = nn.Parameter(_t.randn(num_experts, num_w) * 0.01)
        self.bias = nn.Parameter(_t.zeros(num_experts, out_chs)) if bias else None
    def forward(self, x, routing_weights):
        import torch as _t, torch.nn.functional as F
        b = x.shape[0]
        w = _t.matmul(routing_weights, self.weight).view(
            b * self.out_chs, self.in_chs // self.groups, *self.kernel_size)
        out = F.conv2d(x.reshape(1, -1, *x.shape[2:]), w, stride=self.stride,
                       padding=self.padding, dilation=self.dilation, groups=self.groups * b)
        return out.view(b, self.out_chs, *out.shape[2:])
class ConvBnAct(nn.Module):
    def __init__(self, *a, **k): super().__init__()
def get_condconv_initializer(*a, **k): return lambda w: w
def create_conv2d(in_chs, out_chs, kernel_size, **kwargs):
    padding = kwargs.pop('padding', '') or kernel_size // 2
    dilation = kwargs.pop('dilation', 1)
    depthwise = kwargs.pop('depthwise', False)
    groups = in_chs if depthwise else kwargs.pop('groups', 1)
    stride = kwargs.pop('stride', 1)
    if isinstance(padding, str): padding = kernel_size // 2
    return nn.Conv2d(in_chs, out_chs, kernel_size, stride, padding, dilation, groups, bias=kwargs.pop('bias', False))
def get_norm_act_layer(*a, **k): return nn.BatchNorm2d
class BatchNormAct2d(nn.BatchNorm2d): pass
class LayerNorm2d(nn.Module):
    def __init__(self, ch, **k):
        super().__init__(); self.ln = nn.LayerNorm(ch)
    def forward(self, x):
        return self.ln(x.permute(0,2,3,1)).permute(0,3,1,2)

class _WeightInit:
    trunc_normal_ = staticmethod(trunc_normal_)
    @staticmethod
    def variance_scaling_(t, **k): return t
weight_init = _WeightInit()
class SelectAdaptivePool2d(nn.Module):
    def __init__(self, *a, **k): super().__init__()
    def forward(self, x): return x.mean((2,3), keepdim=True)
def use_fused_attn(*a, **k): return False
class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None, act_layer=nn.GELU, drop=0., **k):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
    def forward(self, x): return self.fc2(self.act(self.fc1(x)))
