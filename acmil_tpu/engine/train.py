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

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from acmil_tpu.data.bags import Bag
from acmil_tpu.engine import losses as L
from acmil_tpu.engine.metrics import classification_metrics
from acmil_tpu.engine.schedules import half_cosine_schedule


class TrainState(train_state.TrainState):
    pass


# ---------------------------------------------------------------------------
# Loss adapters: family -> fn(outputs, bag, valid, conf_dict) -> (loss, aux)
# ---------------------------------------------------------------------------

def _acmil_adapter(outputs, bag: Bag, valid, conf: Dict[str, Any]):
    sub, slide, attn = outputs
    return L.acmil_loss(sub, slide, attn, bag.label, bag.mask,
                        conf["n_token"], valid)


def _default_adapter(outputs, bag: Bag, valid, conf: Dict[str, Any]):
    logits = outputs["logits"] if isinstance(outputs, dict) else outputs
    loss = L.cross_entropy(logits, bag.label, valid)
    aux = {"loss": loss}
    if isinstance(outputs, dict):
        for k, v in outputs.items():
            if k.endswith("_loss"):
                w = conf.get(k + "_weight", 1.0)
                loss = loss * conf.get("bag_loss_weight", 1.0) + w * v
                aux[k] = v
    return loss, aux


LOSS_ADAPTERS: Dict[str, Callable] = {
    "acmil": _acmil_adapter,
    "default": _default_adapter,
}


def register_loss_adapter(name: str, fn: Callable) -> None:
    LOSS_ADAPTERS[name] = fn


def _slide_logits(outputs):
    """Extract the slide-level logits from any family's output pytree."""
    if isinstance(outputs, tuple):
        return outputs[1]          # acmil: (sub, slide, attn)
    if isinstance(outputs, dict):
        return outputs["logits"]
    return outputs


# ---------------------------------------------------------------------------
# Step builders
# ---------------------------------------------------------------------------

def create_train_state(
    model,
    conf,
    rng: jax.Array,
    example_bag: Bag,
    steps_per_epoch: int,
    grad_clip: Optional[float] = None,
) -> TrainState:
    p_rng, s_rng, d_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": p_rng, "stkim": s_rng, "dropout": d_rng},
        example_bag.feats, example_bag.mask,
    )
    sched = half_cosine_schedule(conf.lr, conf.min_lr, conf.train_epoch,
                                 conf.warmup_epoch, steps_per_epoch)
    tx = optax.adamw(sched, weight_decay=conf.wd)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx)


def make_train_step(model, conf, family: str = "acmil") -> Callable:
    adapter = LOSS_ADAPTERS[family]
    conf_d = {
        "n_token": getattr(conf, "n_token", 1),
        "n_class": conf.n_class,
    }

    @jax.jit
    def step(state: TrainState, bag: Bag, rng: jax.Array):
        valid = bag.mask.any(axis=1)
        s_rng, d_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            outputs = state.apply_fn(
                {"params": params}, bag.feats, bag.mask,
                deterministic=False,
                rngs={"stkim": s_rng, "dropout": d_rng},
            )
            return adapter(outputs, bag, valid, conf_d)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        aux = dict(aux)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    return step


def make_eval_step(model) -> Callable:
    @jax.jit
    def step(params, bag: Bag):
        outputs = model.apply({"params": params}, bag.feats, bag.mask,
                              deterministic=True)
        logits = _slide_logits(outputs)
        return jax.nn.softmax(logits, axis=-1)

    return step


# ---------------------------------------------------------------------------
# Epoch loops (host-side drivers)
# ---------------------------------------------------------------------------

def train_one_epoch(state: TrainState, train_step, loader, rng: jax.Array,
                    epoch: int, logger=None) -> Tuple[TrainState, Dict[str, float]]:
    totals: Dict[str, float] = {}
    n = 0
    for bag in loader:
        state, aux = train_step(state, bag, rng)
        n += 1
        if logger is not None:
            logger.update(**{k: float(v) for k, v in aux.items()})
        for k, v in aux.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    return state, {k: v / max(n, 1) for k, v in totals.items()}


def evaluate(params, eval_step, loader, n_class: int) -> Dict[str, float]:
    """Returns acc/auc/f1/loss over a split (`Step3_ACMIL:242-287`)."""
    probs_all, labels_all = [], []
    for bag in loader:
        probs = eval_step(params, bag)
        valid = np.asarray(bag.mask.any(axis=1))
        probs_all.append(np.asarray(probs)[valid])
        labels_all.append(np.asarray(bag.label)[valid])
    probs = np.concatenate(probs_all) if probs_all else np.zeros((0, n_class))
    labels = np.concatenate(labels_all) if labels_all else np.zeros((0,), np.int64)
    m = classification_metrics(probs, labels)
    eps = 1e-12
    m["loss"] = float(-np.mean(np.log(probs[np.arange(len(labels)), labels] + eps))) if len(labels) else float("nan")
    return m


def is_better(metrics: Dict[str, float], best: Dict[str, float]) -> bool:
    """Reference selection rule: val F1 + val AUC (`Step3_ACMIL:156-165`)."""
    return metrics["f1"] + metrics["auc"] > best.get("f1", -1.0) + best.get("auc", -1.0)
