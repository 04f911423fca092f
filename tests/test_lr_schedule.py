"""From-scratch LR schedule parity (reference configs/train_configs/
ViTPose_base_coco_256x192.py:7-29): linear warmup (500 iters, ratio 1e-3)
+ step decay x0.1 at epochs [170, 200] on base lr 5e-4, realized per step
by the AdamW layer-decay optimizer via optax.inject_hyperparams.

The oracle below is an independent numpy transcription of mmcv's
StepLrUpdaterHook.get_lr + get_warmup_lr (the hooks mmpose executes for
the reference's lr_config), evaluated by-epoch with linear warmup.
"""
import bisect

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from easy_vitpose_tpu.train import presets
from easy_vitpose_tpu.train.step import (get_learning_rate,
                                         make_adamw_layer_decay_optimizer,
                                         make_step_lr_schedule)


def mmcv_step_lr(it, steps_per_epoch, base_lr=5e-4, milestones=(170, 200),
                 gamma=0.1, warmup_iters=500, warmup_ratio=1e-3):
    """mmcv StepLrUpdaterHook semantics, transcribed independently."""
    epoch = it // steps_per_epoch
    regular = base_lr * gamma ** bisect.bisect_right(list(milestones), epoch)
    if it < warmup_iters:
        k = (1 - it / warmup_iters) * (1 - warmup_ratio)
        return regular * (1 - k)
    return regular


def test_schedule_matches_reference_trace_full_run():
    """Full 210-epoch per-step trace: warmup ramp and BOTH milestone
    drops at the reference's exact recipe values."""
    spe = 5  # steps per epoch (small so the full trace is cheap)
    sched = make_step_lr_schedule(5e-4, spe)
    steps = np.arange(210 * spe)
    ours = np.asarray(jax.vmap(sched)(jnp.asarray(steps)))
    ref = np.array([mmcv_step_lr(int(i), spe) for i in steps])
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
    # spot-check the recipe's landmarks
    assert ours[0] == pytest.approx(5e-4 * 1e-3, rel=1e-4)     # warmup start
    assert ours[500] == pytest.approx(5e-4, rel=1e-4)          # warmup end
    assert ours[170 * spe - 1] == pytest.approx(5e-4, rel=1e-4)
    assert ours[170 * spe] == pytest.approx(5e-5, rel=1e-4)    # first drop
    assert ours[200 * spe] == pytest.approx(5e-6, rel=1e-4)    # second drop


def test_warmup_ramp_is_linear():
    sched = make_step_lr_schedule(5e-4, 100)
    quarter = float(sched(125))
    ref = mmcv_step_lr(125, 100)
    assert quarter == pytest.approx(ref, rel=1e-4)
    # linear: midpoint of (start, end)
    mid = float(sched(250))
    assert mid == pytest.approx((float(sched(0)) + float(sched(500))) / 2,
                                rel=1e-4)


def test_optimizer_realizes_schedule_per_step():
    """inject_hyperparams drives the schedule from its own step count:
    the realized LR after update k equals the reference trace at k,
    through warmup and across both milestone drops."""
    spe = 2
    milestones = (3, 5)  # compressed run: drops at steps 6 and 10
    warmup = 4
    tx = make_adamw_layer_decay_optimizer(
        make_step_lr_schedule(1e-2, spe, milestones=milestones,
                              warmup_iters=warmup, warmup_ratio=1e-3),
        depth=2)
    params = {"head": {"w": jnp.ones((3,))},
              "blocks": {"w": jnp.ones((2, 3))}}
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for k in range(14):
        _, opt_state = tx.update(grads, opt_state, params)
        got = get_learning_rate(opt_state)
        want = mmcv_step_lr(k, spe, base_lr=1e-2, milestones=milestones,
                            warmup_iters=warmup)
        assert got == pytest.approx(want, rel=1e-4), f"step {k}"


def test_from_scratch_preset_matches_reference_recipe():
    """Preset defaults == reference ViTPose_base_coco_256x192.py:7-29."""
    s = presets.from_scratch("b")
    assert s.lr == 5e-4
    assert s.optimizer == "adamw_layer_decay"
    assert s.lr_policy == "step"
    assert s.lr_milestones == (170, 200)
    assert s.lr_gamma == 0.1
    assert s.warmup_iters == 500
    assert s.warmup_ratio == 1e-3
    assert s.weight_decay == 0.1
    assert s.layer_decay_rate == 0.75
    assert s.total_epochs == 210
    # l/h layer-decay variants
    assert presets.from_scratch("l").layer_decay_rate == 0.8
    assert presets.from_scratch("h").layer_decay_rate == 0.85


def test_schedule_survives_optimizer_state_roundtrip():
    """The schedule count lives in the optimizer state, so orbax
    resume continues the trace (no restart from warmup)."""
    tx = make_adamw_layer_decay_optimizer(
        make_step_lr_schedule(1e-2, 1, milestones=(100,), warmup_iters=4),
        depth=2)
    params = {"head": {"w": jnp.ones((3,))},
              "blocks": {"w": jnp.ones((2, 3))}}
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(3):
        _, opt_state = tx.update(grads, opt_state, params)
    # serialize/restore the state pytree the way orbax does (pure arrays)
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    restored = jax.tree_util.tree_unflatten(
        treedef, [np.asarray(x) for x in leaves])
    _, opt_state2 = tx.update(grads, restored, params)
    assert get_learning_rate(opt_state2) == pytest.approx(
        mmcv_step_lr(3, 1, base_lr=1e-2, milestones=(100,), warmup_iters=4),
        rel=1e-4)
