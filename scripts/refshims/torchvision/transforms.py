def __getattr__(name):
    raise NotImplementedError(
        f"torchvision shim: transforms.{name} is not available (the "
        "head-to-head run uses precomputed feature bags only)")
