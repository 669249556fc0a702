"""SAM — sharpness-aware minimisation as an optax-compatible two-step.

Reference: `utils/utils.py:425-484` (defined but unused by any entry
point; provided here for parity and actually wired into the engine via
``conf.use_sam``). The functional JAX formulation: perturb params to the
loss-ascent point ε = ρ g/||g||, take the gradient there, and step the
base optimizer with that gradient — one jit step, two grad evaluations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def sam_gradient(loss_fn: Callable, params, rho: float = 0.05,
                 adaptive: bool = False):
    """Returns ((loss, aux), sam_grads): gradient at the adversarially
    perturbed point (`SAM.first_step`/`second_step`,
    `utils/utils.py:433-460`)."""
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if adaptive:
        scaled = jax.tree_util.tree_map(
            lambda p, g: jnp.abs(p) * g, params, grads)
        norm = optax.global_norm(scaled)
        eps = jax.tree_util.tree_map(
            lambda p, g: rho * p * p * g / (norm + 1e-12), params, grads)
    else:
        norm = optax.global_norm(grads)
        eps = jax.tree_util.tree_map(
            lambda g: rho * g / (norm + 1e-12), grads)
    perturbed = jax.tree_util.tree_map(lambda p, e: p + e, params, eps)
    (_, _), sam_grads = jax.value_and_grad(loss_fn, has_aux=True)(perturbed)
    return (loss, aux), sam_grads
