"""Shared TPU tiling helpers for the Pallas op modules."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m`` (tile granularity)."""
    return (x + m - 1) // m * m
