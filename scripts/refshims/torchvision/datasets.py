class ImageFolder:  # imported, never instantiated in the feature-bag path
    def __init__(self, *a, **k):
        raise NotImplementedError("torchvision shim")
