def register_model(fn=None, *a, **k):
    if fn is None:
        return lambda f: f
    return fn
