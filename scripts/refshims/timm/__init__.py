"""Minimal timm shim: only what the reference scripts import
(`timm.utils.accuracy`). The real timm is not installed in this image."""
from . import utils  # noqa: F401
