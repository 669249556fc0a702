"""Device mesh + sharding layout for MIL training.

The reference has no distributed training at all (SURVEY.md §2.7 — vestigial
``torch.distributed`` hooks in `utils/utils.py:92-103`, never initialised).
The TPU design makes two axes first-class:

- ``data``: batch-of-slides data parallelism. Parameters are replicated,
  bags are sharded on the batch axis, and XLA turns the gradient sum into an
  ICI all-reduce purely from sharding propagation — no explicit collectives
  in model code.
- ``seq``: bag-axis (sequence) parallelism for mega-bags (>100k patches).
  Features are sharded along N_pad; masked-softmax reductions over N compile
  to `psum`-style collectives automatically. MIL attention pooling is one
  query row per branch, so the only cross-shard traffic is the softmax
  normaliser and the weighted-sum partials — O(K·D) per step, negligible on
  ICI.

Multi-host pods: call :func:`init_distributed` first
(``jax.distributed.initialize``), then ``make_mesh`` lays ``data`` over DCN
x ICI and keeps ``seq`` inside a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up (the real version of the reference's vestigial
    dist hooks). No-op when single-process.

    kwargs short-circuit first: ``jax.process_count()`` would initialise
    the XLA backend, after which ``jax.distributed.initialize`` refuses to
    run — the check order is load-bearing.
    """
    if kwargs:
        jax.distributed.initialize(**kwargs)
    elif jax.process_count() > 1:
        jax.distributed.initialize()


def make_mesh(data: Optional[int] = None, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, seq)`` mesh. ``seq`` stays innermost so bag-axis
    collectives ride the fastest ICI links."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devs) // seq
    assert data * seq <= len(devs), (data, seq, len(devs))
    arr = np.asarray(devs[: data * seq]).reshape(data, seq)
    return Mesh(arr, axis_names=("data", "seq"))


def make_pod_mesh(seq: int = 1) -> Mesh:
    """Multi-host ``(data, seq)`` mesh: ``data`` spans processes (DCN) x
    local devices (ICI), ``seq`` stays inside one host's fastest links.

    Layout via ``mesh_utils.create_hybrid_device_mesh`` so the slow DCN
    hops carry only the gradient all-reduce's top level while bag-axis
    (seq) collectives never leave a slice. Single-process it degrades to
    :func:`make_mesh`.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return make_mesh(seq=seq)
    local = jax.local_device_count()
    assert local % seq == 0, (local, seq)
    devices = jax.devices()
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if n_slices == n_proc:
        # real TPU pod slices: let mesh_utils optimise the ICI layout
        from jax.experimental import mesh_utils

        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // seq, seq),
            dcn_mesh_shape=(n_proc, 1),
            devices=devices)
    else:
        # no slice topology (CPU multi-process): group process-major so
        # the data axis's outer dimension is the cross-process (DCN) hop
        by_proc = sorted(devices, key=lambda d: (d.process_index, d.id))
        devs = np.asarray(by_proc).reshape(n_proc * local // seq, seq)
    return Mesh(devs, axis_names=("data", "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def bag_sharding(mesh: Mesh, shard_seq: bool = False) -> "jax.tree_util.PyTreeDef":
    """Shardings for a Bag pytree: batch on ``data``, optionally N on ``seq``."""
    seq = "seq" if shard_seq else None
    return {
        "feats": NamedSharding(mesh, P("data", seq, None)),
        "mask": NamedSharding(mesh, P("data", seq)),
        "coords": NamedSharding(mesh, P("data", seq, None)),
        "label": NamedSharding(mesh, P("data")),
    }


def shard_bag(bag, mesh: Mesh, shard_seq: bool = False):
    sh = bag_sharding(mesh, shard_seq)
    return bag.replace(
        feats=jax.device_put(bag.feats, sh["feats"]),
        mask=jax.device_put(bag.mask, sh["mask"]),
        coords=jax.device_put(bag.coords, sh["coords"]),
        label=jax.device_put(bag.label, sh["label"]),
    )


def shard_params(tree, mesh: Mesh):
    """Replicate a parameter/opt-state pytree over the mesh. MIL heads are
    tiny (≤ a few MB), so replication beats TP; encoder TP lives in
    :mod:`acmil_tpu.parallel.tp` (Step2 ``--mesh_model``)."""
    rep = replicated(mesh)
    return jax.device_put(tree, rep)
