"""torchvision.models shim: the reference's `modules/attmil.py:4` imports
it at module scope for its end-to-end Resnet MIL variant; the
feature-bag head-to-head path never constructs those models."""


def _unavailable(*_a, **_k):
    raise NotImplementedError(
        "torchvision is not installed in this environment; the reference's "
        "end-to-end Resnet MIL path is outside the head-to-head scope")


resnet18 = resnet34 = resnet50 = resnet101 = _unavailable
