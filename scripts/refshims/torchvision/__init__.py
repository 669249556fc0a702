"""torchvision shim: the reference imports `transforms`/`datasets` at module
scope but the head-to-head path never executes them (feature bags only)."""
from . import transforms, datasets, models  # noqa: F401
