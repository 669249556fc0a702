"""MIL model zoo dispatch.

Mirrors the reference's arch dispatch (`Step3_WSI_classification.py:120-146`
and `Step3_WSI_classification_ACMIL.py:125-128`) as a registry. Each entry
maps an arch name to ``(builder(conf) -> nn.Module, loss_family)`` where
``loss_family`` keys into :data:`acmil_tpu.engine.train.LOSS_ADAPTERS`.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from acmil_tpu.models.acmil import ABMIL, ACMIL_GA, ACMIL_MHA, MHA

_REGISTRY: Dict[str, Tuple[Callable, str]] = {}


def register_model(name: str, family: str = "default"):
    def deco(builder):
        _REGISTRY[name] = (builder, family)
        return builder

    return deco


@register_model("abmil")
def _abmil(conf):
    return ABMIL(n_class=conf.n_class, d_inner=conf.D_inner)


@register_model("mha_single")
def _mha(conf):
    return MHA(n_class=conf.n_class, d_inner=conf.D_inner)


@register_model("ga", family="acmil")
def _acmil_ga(conf):
    return ACMIL_GA(
        n_class=conf.n_class,
        d_inner=conf.D_inner,
        n_token=conf.n_token,
        n_masked_patch=conf.n_masked_patch,
        mask_drop=conf.mask_drop,
    )


@register_model("mha", family="acmil")
def _acmil_mha(conf):
    return ACMIL_MHA(
        n_class=conf.n_class,
        d_inner=conf.D_inner,
        n_token=conf.n_token,
        n_masked_patch=conf.n_masked_patch,
        mask_drop=conf.mask_drop,
    )


def build_mil_model(conf, mesh=None):
    """Returns (model, loss_family) for ``conf.arch``.

    ``mesh`` is forwarded to builders that accept it (heads with
    shard_map'd internals, e.g. TransMIL's seq-sharded Nystrom); heads
    without an internal mesh path rely on jit sharding propagation and
    ignore it."""
    # Late imports keep optional heads from slowing basic import.
    _ensure_registered()
    if conf.arch not in _REGISTRY:
        raise ValueError(f"unknown arch {conf.arch!r}; have {sorted(_REGISTRY)}")
    builder, family = _REGISTRY[conf.arch]
    import inspect

    if mesh is not None and "mesh" in inspect.signature(builder).parameters:
        return builder(conf, mesh=mesh), family
    return builder(conf), family


def available_archs():
    _ensure_registered()
    return sorted(_REGISTRY)


_EXTRA_MODULES = [
    "acmil_tpu.models.attmil",
    "acmil_tpu.models.mean_max",
    "acmil_tpu.models.clam",
    "acmil_tpu.models.dsmil",
    "acmil_tpu.models.transmil",
    "acmil_tpu.models.dtfd",
    "acmil_tpu.models.ibmil",
    "acmil_tpu.models.bmil",
    "acmil_tpu.models.ilra",
    "acmil_tpu.models.mhim",
    "acmil_tpu.models.lbmil",
    "acmil_tpu.models.ips",
]
_registered = False


def _ensure_registered():
    global _registered
    if _registered:
        return
    import importlib

    for mod in _EXTRA_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate only heads not built yet, never broken imports inside
            # an existing module.
            if e.name != mod:
                raise
    _registered = True


__all__ = [
    "ABMIL",
    "ACMIL_GA",
    "ACMIL_MHA",
    "MHA",
    "build_mil_model",
    "available_archs",
    "register_model",
]
