class ImageFolder:
    def __init__(self, *a, **k): pass
