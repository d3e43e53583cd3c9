def named_apply(fn, module, name='', depth_first=True, include_root=False):
    return module
def build_model_with_cfg(*a, **k): raise NotImplementedError
def checkpoint_seq(*a, **k): raise NotImplementedError
def load_pretrained(*a, **k): raise NotImplementedError
