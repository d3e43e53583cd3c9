from timm.layers_impl import *
