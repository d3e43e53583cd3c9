import torch.nn as nn
class VisionTransformer(nn.Module):
    def __init__(self, *a, **k): super().__init__()
def _cfg(url='', **kwargs):
    return {'url': url, **kwargs}
