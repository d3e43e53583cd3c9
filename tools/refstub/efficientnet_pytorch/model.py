import torch.nn as nn
class MemoryEfficientSwish(nn.SiLU):
    pass
