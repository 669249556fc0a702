"""Seeding (`utils/utils.py:226-243`). JAX is functional — the PRNG key is
explicit — so this only pins the host-side RNGs (numpy/random, and torch
when present for encoder conversion paths)."""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
