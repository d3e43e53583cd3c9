__version__ = '0.9.0'
def create_model(*a, **k): raise NotImplementedError
