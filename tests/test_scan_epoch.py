"""lax.scan epoch drivers vs the per-bag loop.

The scan path (engine/train.py::make_scan_train_step) must produce the
SAME parameter updates as the jit-per-bag loop for the same bag order —
the per-step rng is fold_in(rng, state.step) in both — and
evaluate_scanned must reproduce evaluate()'s metrics exactly.
"""

import numpy as np
import jax
import jax.flatten_util  # not re-exported by the jax package root
import jax.numpy as jnp
import pytest

from acmil_tpu.data.loader import BagLoader
from acmil_tpu.engine.train import (create_train_state, evaluate,
                                    evaluate_scanned, make_eval_step,
                                    make_scan_eval_step, make_scan_train_step,
                                    make_train_step, train_one_epoch_scanned)
from acmil_tpu.models import build_mil_model


class _ListSource:
    """Minimal in-RAM bag source (same protocol as FeatureBagSource)."""

    def __init__(self, slides):
        self.items = [
            {"input": d["feat"], "coords": d["coords"], "label": d["label"]}
            for d in slides.values()
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]

    def lengths(self):
        return [len(it["input"]) for it in self.items]


def _setup(tiny_conf, synthetic_slides, arch="ga"):
    conf = tiny_conf
    conf.arch = arch
    src = _ListSource(synthetic_slides)
    model, family = build_mil_model(conf)
    loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0)
    example = next(iter(loader))
    state = create_train_state(model, conf, jax.random.PRNGKey(0), example,
                               steps_per_epoch=len(loader), family=family)
    return conf, src, model, family, state


def test_scan_train_matches_loop(tiny_conf, synthetic_slides):
    conf, src, model, family, state = _setup(tiny_conf, synthetic_slides)
    rng = jax.random.PRNGKey(7)

    # loop path: visit device_groups in order, bags in stacked order
    loop_loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0)
    scan_loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0)
    groups = scan_loader.device_groups()

    step = make_train_step(model, conf, family)
    state_loop = state
    for stacked in groups:
        k = stacked.label.shape[0]
        for i in range(k):
            bag = jax.tree_util.tree_map(lambda l: l[i], stacked)
            state_loop, aux_loop = step(state_loop, bag, rng)

    scan_step = make_scan_train_step(model, conf, family)
    assert scan_step is not None
    state_scan = state
    for stacked in groups:
        k = int(stacked.label.shape[0])
        state_scan, sums = scan_step(state_scan, stacked,
                                     jnp.arange(k), rng)

    assert int(state_scan.step) == int(state_loop.step)
    flat_l = jax.flatten_util.ravel_pytree(state_loop.params)[0]
    flat_s = jax.flatten_util.ravel_pytree(state_scan.params)[0]
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_l),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(sums["loss"]))


def test_scan_epoch_driver_trains(tiny_conf, synthetic_slides):
    conf, src, model, family, state = _setup(tiny_conf, synthetic_slides)
    loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0,
                       shuffle=True, cache_device=True)
    scan_step = make_scan_train_step(model, conf, family)
    rng = jax.random.PRNGKey(1)
    losses = []
    for epoch in range(3):
        state, stats = train_one_epoch_scanned(state, scan_step, loader,
                                               rng, epoch)
        losses.append(stats["loss"])
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3 * len(src.items)


def test_evaluate_scanned_matches_evaluate(tiny_conf, synthetic_slides):
    conf, src, model, family, state = _setup(tiny_conf, synthetic_slides)
    loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0)
    eval_step = make_eval_step(model, family)
    m_loop = evaluate(state.params, eval_step, loader, conf.n_class)

    scan_loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0)
    scan_eval = make_scan_eval_step(model, family)
    m_scan = evaluate_scanned(state.params, scan_eval, scan_loader,
                              conf.n_class)
    for k in ("acc", "auc", "f1", "loss"):
        np.testing.assert_allclose(m_scan[k], m_loop[k], rtol=1e-5,
                                   err_msg=k)


@pytest.mark.slow  # heaviest fast-lane test (r5 item 8): 2-model EMA scan
def test_scan_train_matches_loop_mhim(tiny_conf, synthetic_slides):
    """MHIM's custom EMA step participates via make_step_body — the scan
    must reproduce the loop's params AND teacher EMA params."""
    conf, src, model, family, state = _setup(tiny_conf, synthetic_slides,
                                             arch="mhim")
    rng = jax.random.PRNGKey(5)
    loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0)
    groups = loader.device_groups()

    step = make_train_step(model, conf, family)
    state_loop = state
    for stacked in groups:
        for i in range(int(stacked.label.shape[0])):
            bag = jax.tree_util.tree_map(lambda l: l[i], stacked)
            state_loop, _ = step(state_loop, bag, rng)

    scan_step = make_scan_train_step(model, conf, family)
    assert scan_step is not None
    state_scan = state
    for stacked in groups:
        k = int(stacked.label.shape[0])
        state_scan, _ = scan_step(state_scan, stacked, jnp.arange(k), rng)

    for attr in ("params", "teacher_params"):
        fl = jax.flatten_util.ravel_pytree(getattr(state_loop, attr))[0]
        fs = jax.flatten_util.ravel_pytree(getattr(state_scan, attr))[0]
        # scan and loop compile to different fusions; MHIM's top-k mask
        # selection is discontinuous, so sub-ulp logit differences can
        # flip a pick and leave a few params ~1e-4 apart after 20 Adam
        # steps (observed: <0.01% of elements). Assert near-equality.
        np.testing.assert_allclose(np.asarray(fs), np.asarray(fl),
                                   rtol=5e-4, atol=1e-3, err_msg=attr)


@pytest.mark.slow  # mesh variant; the single-device scan smoke stays fast
def test_mesh_scan_epoch_matches_mesh_loop(tiny_conf, synthetic_slides):
    """VERDICT r2 item 1b: scan epochs over a data-parallel mesh — one
    dispatch per sharded shape group — reproduce the per-batch mesh loop's
    parameter updates (fused sharded pooling active in both)."""
    from acmil_tpu.parallel import make_mesh, shard_params

    conf = tiny_conf
    conf.arch = "ga"
    src = _ListSource(synthetic_slides)
    model, family = build_mil_model(conf)
    mesh = make_mesh(data=4, seq=1)
    rng = jax.random.PRNGKey(3)

    loader = BagLoader(src, batch_size=4, min_bucket=64, seed=0, mesh=mesh)
    example = next(iter(loader))
    state = create_train_state(model, conf, jax.random.PRNGKey(0), example,
                               steps_per_epoch=len(loader), family=family)
    with mesh:
        state = shard_params(state, mesh)
        groups = loader.device_groups()
        for g in groups:
            assert g.feats.sharding.spec[1] == "data"

        step = make_train_step(model, conf, family, mesh=mesh)
        state_loop = state
        for stacked in groups:
            for i in range(int(stacked.label.shape[0])):
                bag = jax.tree_util.tree_map(lambda l: l[i], stacked)
                state_loop, _ = step(state_loop, bag, rng)

        scan_step = make_scan_train_step(model, conf, family, mesh=mesh)
        assert scan_step is not None
        state_scan = state
        for stacked in groups:
            k = int(stacked.label.shape[0])
            state_scan, sums = scan_step(state_scan, stacked,
                                         jnp.arange(k), rng)

    assert int(state_scan.step) == int(state_loop.step)
    flat_l = jax.flatten_util.ravel_pytree(state_loop.params)[0]
    flat_s = jax.flatten_util.ravel_pytree(state_scan.params)[0]
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_l),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(sums["loss"]))


def test_device_groups_mesh_batch_divisibility(tiny_conf, synthetic_slides):
    src = _ListSource(synthetic_slides)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    loader = BagLoader(src, batch_size=3, min_bucket=64, mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        loader.device_groups()


@pytest.mark.slow
def test_interleaved_scan_matches_unchunked(tiny_conf, synthetic_slides):
    """scan_interleave chunks each group's visit order but must apply the
    exact same per-bag updates: with shuffle off the realized visit order
    is identical, so params must match bit-for-bit."""
    conf, src, model, family, state = _setup(tiny_conf, synthetic_slides)
    scan_step = make_scan_train_step(model, conf, family)
    rng = jax.random.PRNGKey(3)

    l_plain = BagLoader(src, batch_size=1, min_bucket=64, seed=0,
                        shuffle=False, cache_device=True)
    l_chunk = BagLoader(src, batch_size=1, min_bucket=64, seed=0,
                        shuffle=False, cache_device=True)
    s_plain, _ = train_one_epoch_scanned(state, scan_step, l_plain, rng, 0)
    s_chunk, _ = train_one_epoch_scanned(state, scan_step, l_chunk, rng, 0,
                                         interleave=3)
    assert int(s_chunk.step) == int(s_plain.step)
    f_p = jax.flatten_util.ravel_pytree(s_plain.params)[0]
    f_c = jax.flatten_util.ravel_pytree(s_chunk.params)[0]
    np.testing.assert_array_equal(np.asarray(f_c), np.asarray(f_p))


def test_interleaved_scan_mixes_groups_and_covers_all_bags(
        tiny_conf, synthetic_slides):
    """With shuffle on, interleave>1 must (a) visit every bag exactly
    once and (b) actually alternate between shape groups within the
    epoch (the whole point: decorrelate bag length from position)."""
    conf, src, model, family, state = _setup(tiny_conf, synthetic_slides)
    loader = BagLoader(src, batch_size=1, min_bucket=64, seed=0,
                       shuffle=True, cache_device=True)
    groups = loader.device_groups()
    if len(groups) < 2:
        pytest.skip("synthetic corpus landed in one pad bucket")

    calls = []

    def spy_step(st, stacked, perm, rng):
        # groups are one pad bucket each (batch_size=1), so the stacked
        # mask shape [k, B, N_pad] identifies the group uniquely
        gi = next(i for i, g in enumerate(groups)
                  if g.mask.shape == stacked.mask.shape)
        calls.append((gi, np.asarray(perm)))
        return st, {"loss": jnp.zeros(())}

    train_one_epoch_scanned(state, spy_step, loader, jax.random.PRNGKey(0),
                            0, interleave=4)
    # coverage: each group's chunks reassemble a full permutation
    for gi, g in enumerate(groups):
        seen = np.concatenate([p for i, p in calls if i == gi])
        assert sorted(seen.tolist()) == list(range(int(g.label.shape[0])))
    # mixing: the group sequence is not one contiguous block per group
    seq = [gi for gi, _ in calls]
    n_transitions = sum(a != b for a, b in zip(seq, seq[1:]))
    assert n_transitions > len(groups) - 1
