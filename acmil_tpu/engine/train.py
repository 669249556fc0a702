"""Training/eval engine — jit-compiled steps with per-family loss dispatch.

TPU rebuild of `engine.py` + the per-script loops
(`Step3_WSI_classification_ACMIL.py:175/242` etc.): one ``jax.jit``'d
train step per (model, bag-bucket shape), AdamW via optax with the
reference's half-cosine schedule, family dispatch via the ``LOSS_ADAPTERS``
registry instead of isinstance chains (`engine.py:143-154`).

Batched + mask-aware throughout: padded bags and padded batch rows
contribute zero loss.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.flatten_util  # not re-exported by the jax package root
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from acmil_tpu.data.bags import Bag
from acmil_tpu.engine.metrics import classification_metrics
from acmil_tpu.engine.schedules import half_cosine_schedule


class TrainState(train_state.TrainState):
    pass


# ---------------------------------------------------------------------------
# Step builders
# ---------------------------------------------------------------------------

class EMATrainState(TrainState):
    """TrainState carrying an EMA teacher copy (MHIM: `Step3_MHIM:358-375`,
    `ema_update` `utils/utils.py:604`)."""

    teacher_params: Any = None


def create_train_state(
    model,
    conf,
    rng: jax.Array,
    example_bag: Bag,
    steps_per_epoch: int,
    grad_clip: Optional[float] = None,
    family=None,
) -> TrainState:
    p_rng, s_rng, d_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_rng, "stkim": s_rng, "dropout": d_rng},
        example_bag.feats, example_bag.mask,
    )
    sched = half_cosine_schedule(conf.lr, conf.min_lr, conf.train_epoch,
                                 conf.warmup_epoch, steps_per_epoch)
    fam_obj = _resolve_family(family) if family else None
    if fam_obj is not None and hasattr(fam_obj, "make_tx"):
        # family-specific optimizer semantics (DTFD: coupled-L2 Adam +
        # per-module clipping, `Step3_DTFD:131-148`); the hook returns
        # the COMPLETE transform, including any flattening
        tx = fam_obj.make_tx(conf, sched)
    else:
        tx = optax.adamw(sched, weight_decay=conf.wd)
        if grad_clip is None:
            grad_clip = getattr(conf, "grad_clipping", None)
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(float(grad_clip)), tx)
        # MIL heads have ~20 small param leaves; per-leaf optimizer ops
        # cost ~0.9 ms/step in kernel-launch overhead on TPU
        # (BENCH_NOTES.md, r2) — flattening runs AdamW as a handful of
        # ops on one contiguous vector
        tx = optax.flatten(tx)
    fam_name = getattr(fam_obj, "name", None)
    if fam_name == "mhim":
        return EMATrainState.create(
            apply_fn=model.apply, params=variables["params"], tx=tx,
            teacher_params=jax.tree_util.tree_map(jnp.copy, variables["params"]))
    return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx)


def clip_by_module_norms(max_norm: float, group_of=lambda k: k):
    """Optax transform replicating torch's per-module
    ``clip_grad_norm_``: each group of TOP-LEVEL param-tree keys (as
    labeled by ``group_of``) is clipped by its OWN global norm — unlike
    ``clip_by_global_norm``, a spike in one module does not scale down
    the others' updates (DTFD reference `Step3_DTFD:137-148` clips
    dimReduction / attention / classifier / UClassifier independently).
    Matches torch's clip coefficient ``max_norm / (norm + 1e-6)``
    clamped to <= 1. Must sit OUTSIDE any ``optax.flatten`` (it needs
    the tree structure)."""

    def update(updates, state, params=None):
        del params
        groups: dict = {}
        for k in updates.keys():
            groups.setdefault(group_of(k), []).append(k)
        new = dict(updates)
        for ks in groups.values():
            leaves = jax.tree_util.tree_leaves([updates[k] for k in ks])
            norm = jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))
            scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
            for k in ks:
                new[k] = jax.tree_util.tree_map(lambda u: u * scale,
                                                updates[k])
        return new, state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update)


def _resolve_family(family):
    from acmil_tpu.engine.families import Family, get_family

    return get_family(family) if isinstance(family, str) else family


def _make_step_body(fam, conf_d, use_sam: bool, sam_rho: float) -> Callable:
    """The (state, bag, rng) -> (state, aux) gradient step, un-jitted.

    Shared by the per-bag jit step and the lax.scan epoch driver; the
    per-step rng is ``fold_in(rng, state.step)`` so both produce
    identical updates for the same bag order."""

    def body(state: TrainState, bag: Bag, rng: jax.Array):
        valid = bag.mask.any(axis=1)
        s_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        rngs = {"stkim": s_rng, "dropout": d_rng}

        def loss_fn(params):
            outputs = fam.train_outputs(state.apply_fn, params, bag, rngs, conf_d)
            return fam.loss(outputs, bag, valid, conf_d)

        if use_sam:
            from acmil_tpu.ops.sam import sam_gradient

            (loss, aux), grads = sam_gradient(loss_fn, state.params, sam_rho)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        aux = dict(aux)
        aux["loss"] = loss
        # one concat HLO + one reduction instead of 2 kernels per leaf
        # (optax.global_norm costs ~0.4 ms/step in launch overhead here)
        flat_g, _ = jax.flatten_util.ravel_pytree(grads)
        aux["grad_norm"] = jnp.linalg.norm(flat_g)
        return new_state, aux

    return body


def _conf_dict(fam, conf, mesh=None):
    """Family conf_dict + the (static, closure-captured) mesh for families
    that route pooling through the shard_map'd fused kernel."""
    d = fam.conf_dict(conf)
    d["mesh"] = mesh
    return d


def family_supports_scan(family) -> bool:
    """True iff :func:`make_scan_train_step` will return a scan step for
    this family (the single authority — CLI cache gating must agree with
    the dispatch below, code-review r3)."""
    fam = _resolve_family(family)
    return (hasattr(fam, "make_step_body")
            or not hasattr(fam, "make_train_step"))


def make_train_step(model, conf, family="acmil", mesh=None) -> Callable:
    fam = _resolve_family(family)
    if hasattr(fam, "make_train_step"):
        return fam.make_train_step(model, conf)
    body = _make_step_body(fam, _conf_dict(fam, conf, mesh),
                           bool(getattr(conf, "use_sam", False)),
                           float(getattr(conf, "sam_rho", 0.05)))
    return jax.jit(body)


def make_scan_train_step(model, conf, family="acmil", mesh=None) -> Optional[Callable]:
    """Whole same-shape groups of bags in ONE dispatch via ``lax.scan``.

    Per-bag dispatch through a relay-attached chip costs ~3 ms — more
    than the sub-ms step itself — so scanning a device-resident group
    collapses an epoch from one dispatch per bag to one per shape bucket
    (BENCH_NOTES.md). Updates are bit-identical to the per-step loop for
    the same bag order because the per-step rng is derived from
    ``state.step``. Returns None for families with a custom step
    structure that exposes no scannable body — callers fall back to the
    loop. Families with a custom step (MHIM's EMA teacher) participate by
    providing ``make_step_body`` (the un-jitted step).

    The returned callable is ``(state, stacked: Bag, perm, rng)`` where
    ``stacked`` has a leading group axis on every leaf and ``perm`` is
    the within-group visit order.
    """
    fam = _resolve_family(family)
    if not family_supports_scan(fam):
        return None
    if hasattr(fam, "make_step_body"):
        body = fam.make_step_body(model, conf)
    else:
        body = _make_step_body(fam, _conf_dict(fam, conf, mesh),
                               bool(getattr(conf, "use_sam", False)),
                               float(getattr(conf, "sam_rho", 0.05)))

    @jax.jit
    def scan_steps(state: TrainState, stacked: Bag, perm: jax.Array,
                   rng: jax.Array):
        def scan_body(st, i):
            bag = jax.tree_util.tree_map(
                lambda leaf: jnp.take(leaf, i, axis=0), stacked)
            return body(st, bag, rng)

        state2, auxes = jax.lax.scan(scan_body, state, perm)
        return state2, jax.tree_util.tree_map(
            lambda a: jnp.sum(a, axis=0), auxes)

    return scan_steps


def _eval_outputs_fn(fam, fused: bool, mesh=None, model=None) -> Callable:
    """Bind the family's eval_outputs, passing ``fused``/``mesh`` only to
    families that take them (ACMIL's GA reroute: mesh runs go through the
    shard_map'd fused kernel). Families whose fused route needs model
    hyperparameters (DTFD's num_group/distill) also take ``model``."""
    import inspect

    params = inspect.signature(fam.eval_outputs).parameters
    if "fused" in params:
        kw = {"fused": fused}
        if "mesh" in params:
            kw["mesh"] = mesh
        if "model" in params:
            kw["model"] = model
        return lambda apply_fn, params, bag: fam.eval_outputs(
            apply_fn, params, bag, **kw)
    return fam.eval_outputs


def make_eval_step(model, family="default", fused: bool = True,
                   mesh=None) -> Callable:
    fam = _resolve_family(family)
    eval_outputs = _eval_outputs_fn(fam, fused, mesh, model)

    @jax.jit
    def step(params, bag: Bag):
        outputs = eval_outputs(model.apply, params, bag)
        return fam.probs(outputs)

    return step


def make_scan_eval_step(model, family="default", fused: bool = True,
                        mesh=None) -> Callable:
    """Eval counterpart of :func:`make_scan_train_step`: probabilities for
    a whole stacked shape group in one dispatch, ``[k, B, C]``."""
    fam = _resolve_family(family)
    eval_outputs = _eval_outputs_fn(fam, fused, mesh, model)

    @jax.jit
    def scan_eval(params, stacked: Bag):
        def body(_, bag):
            return None, fam.probs(eval_outputs(model.apply, params, bag))

        _, probs = jax.lax.scan(body, None, stacked)
        return probs

    return scan_eval


# ---------------------------------------------------------------------------
# Epoch loops (host-side drivers)
# ---------------------------------------------------------------------------

def train_one_epoch(state: TrainState, train_step, loader, rng: jax.Array,
                    epoch: int, logger=None,
                    log_every: int = 0) -> Tuple[TrainState, Dict[str, float]]:
    """Drive one epoch. Metrics stay on device and sync ONCE at epoch end —
    per-step host readbacks cost a full relay round trip each (bench notes);
    set ``log_every`` > 0 to additionally feed the MetricLogger every K
    steps (costs one sync per K steps)."""
    totals: Dict[str, jnp.ndarray] = {}
    n = 0
    for bag in loader:
        state, aux = train_step(state, bag, rng)
        n += 1
        for k, v in aux.items():
            totals[k] = totals.get(k, 0.0) + v
        if logger is not None and log_every and n % log_every == 0:
            logger.update(**{k: float(v) for k, v in aux.items()})
    stats = {k: float(v) / max(n, 1) for k, v in totals.items()}
    if logger is not None and not log_every:
        logger.update(**stats)
    return state, stats


def train_one_epoch_scanned(state: TrainState, scan_step, loader,
                            rng: jax.Array, epoch: int, logger=None,
                            interleave: int = 1,
                            ) -> Tuple[TrainState, Dict[str, float]]:
    """Scan-based epoch: one dispatch per shape group (see
    :func:`make_scan_train_step`). Groups are visited in a fresh random
    order each epoch and bags shuffled within their group, so the visit
    order is a uniform permutation *conditioned on* bucket grouping —
    slightly coarser than the loop driver's global shuffle (documented in
    BENCH_NOTES.md; enable via ``scan_epoch: true``).

    ``interleave`` > 1 splits each group's visit order into that many
    chunks and dispatches the chunks of ALL groups in one globally
    shuffled sequence, decorrelating bag length from intra-epoch
    position (the curriculum-like effect of bucket-blocked order —
    ADVICE r2). Cost: up to 2 extra compiles per group (full-chunk and
    remainder-chunk scan lengths) and ``interleave``× more dispatches;
    set via ``scan_interleave`` in the config."""
    groups = loader.device_groups()
    totals: Dict[str, jnp.ndarray] = {}
    n = 0
    # build the dispatch list: (group index, within-group visit indices)
    dispatches = []
    for gi, stacked in enumerate(groups):
        k = int(stacked.label.shape[0])
        perm = (loader.rng.permutation(k) if loader.shuffle
                else np.arange(k))
        c = max(1, min(int(interleave), k))
        m = -(-k // c)                       # ceil(k / c)
        for lo in range(0, k, m):
            dispatches.append((gi, perm[lo:lo + m]))
    if loader.shuffle:
        order = loader.rng.permutation(len(dispatches))
    else:
        order = range(len(dispatches))
    for di in order:
        gi, chunk = dispatches[di]
        state, sums = scan_step(state, groups[gi], jnp.asarray(chunk), rng)
        n += len(chunk)
        for key, v in sums.items():
            totals[key] = totals.get(key, 0.0) + v
    stats = {k: float(v) / max(n, 1) for k, v in totals.items()}
    if logger is not None:
        logger.update(**stats)
    return state, stats


def _finalize_metrics(probs_h, valid_h, labels_h, n_class: int) -> Dict[str, float]:
    probs_all = [p[v] for p, v in zip(probs_h, valid_h)]
    labels_all = [l[v] for l, v in zip(labels_h, valid_h)]
    probs = np.concatenate(probs_all) if probs_all else np.zeros((0, n_class))
    labels = np.concatenate(labels_all) if labels_all else np.zeros((0,), np.int64)
    m = classification_metrics(probs, labels)
    eps = 1e-12
    m["loss"] = float(-np.mean(np.log(probs[np.arange(len(labels)), labels] + eps))) if len(labels) else float("nan")
    return m


def evaluate(params, eval_step, loader, n_class: int) -> Dict[str, float]:
    """Returns acc/auc/f1/loss over a split (`Step3_ACMIL:242-287`)."""
    probs_dev, valid_dev, labels_dev = [], [], []
    for bag in loader:
        probs_dev.append(eval_step(params, bag))   # stays on device (async)
        valid_dev.append(bag.mask.any(axis=1))
        labels_dev.append(bag.label)
    # one bulk host transfer at the end instead of a sync per batch
    probs_h, valid_h, labels_h = jax.device_get((probs_dev, valid_dev, labels_dev))
    return _finalize_metrics(probs_h, valid_h, labels_h, n_class)


def evaluate_scanned(params, scan_eval_step, loader, n_class: int) -> Dict[str, float]:
    """:func:`evaluate` over stacked shape groups: one dispatch per group
    instead of one per bag (the dispatch itself dominates eval time on
    relay-attached chips)."""
    probs_dev, valid_dev, labels_dev = [], [], []
    for stacked in loader.device_groups():
        probs = scan_eval_step(params, stacked)        # [k, B, C]
        probs_dev.append(probs.reshape(-1, probs.shape[-1]))
        valid_dev.append(stacked.mask.any(axis=2).reshape(-1))
        labels_dev.append(stacked.label.reshape(-1))
    probs_h, valid_h, labels_h = jax.device_get((probs_dev, valid_dev, labels_dev))
    return _finalize_metrics(probs_h, valid_h, labels_h, n_class)


def is_better(metrics: Dict[str, float], best: Dict[str, float],
              selection_f1: str = "macro") -> bool:
    """Reference selection rule: val F1 + val AUC (`Step3_ACMIL:156-165`).
    NaN metrics (e.g. single-class val split) count as 0 so a best
    checkpoint always gets written.

    ``selection_f1`` picks the F1 definition entering the rule: the
    generic trainer's is macro (`engine.py:213` ``average='macro'``),
    but the ACMIL/DTFD/MHIM scripts rely on torchmetrics' default micro
    (`Step3_ACMIL:279`, `Step3_DTFD:243`, `Step3_MHIM:216`) — and for
    single-label classification micro-F1 equals accuracy, so 'micro'
    scores ``acc + auc``. On close seeds the two rules can select
    different best epochs; head-to-head runs set this per recipe."""
    if selection_f1 not in ("macro", "micro"):
        raise ValueError(f"selection_f1 must be macro|micro, "
                         f"got {selection_f1!r}")
    key = "f1" if selection_f1 == "macro" else "acc"

    def score(m):
        f1, auc = m.get(key, -1.0), m.get("auc", -1.0)
        f1 = 0.0 if np.isnan(f1) else f1
        auc = 0.0 if np.isnan(auc) else auc
        return f1 + auc

    return score(metrics) > score(best) or not best
