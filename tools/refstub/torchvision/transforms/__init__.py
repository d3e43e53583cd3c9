import torch.nn as nn
class Compose:
    def __init__(self, t): self.transforms = t
    def __call__(self, x):
        for t in self.transforms: x = t(x)
        return x
class ToTensor: pass
class Normalize:
    def __init__(self, *a, **k): pass
class Resize:
    def __init__(self, *a, **k): pass
class CenterCrop:
    def __init__(self, *a, **k): pass
class RandomResizedCrop:
    def __init__(self, *a, **k): pass
class RandomHorizontalFlip:
    def __init__(self, *a, **k): pass
class RandomVerticalFlip:
    def __init__(self, *a, **k): pass
class ColorJitter:
    def __init__(self, *a, **k): pass
class InterpolationMode:
    BILINEAR = 'bilinear'; NEAREST = 'nearest'; BICUBIC = 'bicubic'
