"""Multi-task (ViTPose+) finetuning steps — beyond the reference, which can
only finetune the flattened single-task models.

The ViTPose+ recipe trains task-homogeneous batches, alternating tasks
across steps: each step's gradients reach the shared backbone, the active
expert's FFN slice (other experts get exact-zero grads through the
dynamic-index selection), and the active task's head.  One optimizer state
covers the whole tree; one compiled step per distinct head-K.

Usage:
  state = init_moe_train_state(plus_params, tx)
  steps = {t: jax.jit(make_moe_train_step(cfg, tx, t)) for t in tasks}
  for batch, task in task_scheduler(...):
      state, metrics = steps[task](state, batch, key)
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..configs import ModelConfig
from ..models.moe import vitpose_plus_forward_train
from ..models.vitpose import cast_params
from .losses import joints_mse_loss


def split_bn_states_plus(params):
    """plus params -> (trainable tree, {task: bn_state}) — the MoE analogue
    of train/step.py::split_bn_state."""
    p = dict(params)
    heads = {}
    bn = {}
    for task, head in p["heads"].items():
        head = dict(head)
        bn[task] = head.pop("bn_state")
        heads[task] = head
    p["heads"] = heads
    return p, bn


def merge_bn_states_plus(params, bn_states):
    p = dict(params)
    heads = {}
    for task, head in p["heads"].items():
        head = dict(head)
        head["bn_state"] = bn_states[task]
        heads[task] = head
    p["heads"] = heads
    return p


def init_moe_train_state(params, tx: optax.GradientTransformation
                         ) -> Dict[str, Any]:
    trainable, bn = split_bn_states_plus(params)
    return {
        "params": trainable,
        "opt_state": tx.init(trainable),
        "bn_state": bn,
        "step": jnp.zeros((), jnp.int32),
    }


def _mask_inactive(updates, task: str):
    """Zero updates for other tasks' heads and expert slices."""
    from ..convert.model_split import SPLIT_DATASETS
    ei = SPLIT_DATASETS.index(task)
    out = dict(updates)
    out["heads"] = {t: (h if t == task else jax.tree.map(jnp.zeros_like, h))
                    for t, h in updates["heads"].items()}
    bb = dict(out["backbone"])
    blocks = dict(bb["blocks"])
    mlp = dict(blocks["mlp"])
    for name in ("fc2_expert_w", "fc2_expert_b"):
        u = mlp[name]
        onehot = jax.nn.one_hot(ei, u.shape[1], dtype=u.dtype)
        mlp[name] = u * onehot.reshape((1, -1) + (1,) * (u.ndim - 2))
    blocks["mlp"] = mlp
    bb["blocks"] = blocks
    out["backbone"] = bb
    return out


def _restore_inactive_opt(new_opt, old_opt, task: str):
    """Freeze inactive tasks' optimizer MOMENTS too: zero grads would still
    decay adam's mu/nu every step (torch skips grad=None params entirely, so
    the reference recipe resumes a task with its momentum intact).  Walks the
    param-shaped leaves inside the optax state by trailing path (the moments
    mirror the params tree) and keeps the old values for other tasks' heads
    and expert slices.  Adam's GLOBAL bias-correction count still advances —
    a second-order divergence from torch's per-param step, documented here
    rather than hidden."""
    from ..convert.model_split import SPLIT_DATASETS
    ei = SPLIT_DATASETS.index(task)

    def restore(path, new, old):
        keys = [str(getattr(p, "key", "")) for p in path]
        if "heads" in keys:
            t = keys[keys.index("heads") + 1]
            return new if t == task else old
        name = keys[-1] if keys else ""
        if name in ("fc2_expert_w", "fc2_expert_b") and new.ndim >= 2:
            onehot = jax.nn.one_hot(ei, new.shape[1], dtype=new.dtype)
            onehot = onehot.reshape((1, -1) + (1,) * (new.ndim - 2))
            return new * onehot + old * (1 - onehot)
        return new

    return jax.tree_util.tree_map_with_path(restore, new_opt, old_opt)


def make_moe_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                        task: str, *, use_amp: bool = True,
                        loss_fn: Callable = joints_mse_loss,
                        block_impl: str = "xla"):
    """One task's train step over the shared multi-task state.

    block_impl='pallas_train' runs the backbone through the custom-VJP
    fused kernels (task expert spliced into a dense fc2 outside the
    kernel — exact-zero grads for inactive experts are preserved)."""

    def step(state, batch, rng):
        del rng  # no drop-path in the MoE block (finetuning recipe)

        def compute_loss(trainable):
            params = merge_bn_states_plus(trainable, state["bn_state"])
            fwd = cast_params(params, jnp.bfloat16) if use_amp else params
            x = batch["images"].astype(jnp.bfloat16 if use_amp
                                       else jnp.float32)
            heat, new_bn = vitpose_plus_forward_train(fwd, x, cfg, task,
                                                      block_impl=block_impl)
            loss = loss_fn(heat, batch["targets"], batch["target_weights"])
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        # inactive tasks must stay EXACTLY untouched (torch skips grad=None
        # params, so the reference recipe never moves them) — but shared
        # optax.adam moments are nonzero after a task's first active step
        # and would emit nonzero updates for exact-zero grads; mask them.
        updates = _mask_inactive(updates, task)
        new_opt = _restore_inactive_opt(new_opt, state["opt_state"], task)
        new_params = optax.apply_updates(state["params"], updates)
        bn = dict(state["bn_state"])
        bn[task] = jax.tree.map(jnp.asarray, new_bn)
        return ({"params": new_params, "opt_state": new_opt,
                 "bn_state": bn, "step": state["step"] + 1},
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    return step


def make_moe_train_step_sharded(cfg: ModelConfig,
                                tx: optax.GradientTransformation,
                                mesh, task: str, *, use_amp: bool = True,
                                loss_fn: Callable = joints_mse_loss,
                                block_impl: str = "pallas_train",
                                donate_state: bool = True):
    """shard_map data-parallel MoE train step (the MoE twin of
    train/step.py::make_train_step_sharded).

    Runs the whole per-device computation — including the fused
    custom-VJP Pallas kernels with the task expert spliced into a dense
    fc2 — inside ``shard_map`` over 'data', so the kernels are
    partitioned by construction.  Head BN batch statistics are global
    (pmean of shard moments); grads/loss pmean before the replicated
    masked update, so inactive tasks stay bit-frozen exactly as in the
    single-program step.  (The MoE recipe has no drop-path, so no mask
    plumbing is needed.)
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import mesh as meshlib

    axis = "data"

    def device_step(state, batch):
        def compute_loss(trainable):
            params = merge_bn_states_plus(trainable, state["bn_state"])
            fwd = cast_params(params, jnp.bfloat16) if use_amp else params
            x = batch["images"].astype(jnp.bfloat16 if use_amp
                                       else jnp.float32)
            heat, new_bn = vitpose_plus_forward_train(
                fwd, x, cfg, task, block_impl=block_impl, axis_name=axis)
            loss = loss_fn(heat, batch["targets"], batch["target_weights"])
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state["params"])
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        updates = _mask_inactive(updates, task)
        new_opt = _restore_inactive_opt(new_opt, state["opt_state"], task)
        new_params = optax.apply_updates(state["params"], updates)
        bn = dict(state["bn_state"])
        bn[task] = jax.tree.map(jnp.asarray, new_bn)
        return ({"params": new_params, "opt_state": new_opt,
                 "bn_state": bn, "step": state["step"] + 1},
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    inner = shard_map(device_step, mesh=mesh,
                      in_specs=(P(), P(axis)), out_specs=(P(), P()),
                      check_vma=False)

    def step(state, batch, rng):
        del rng  # no drop-path in the MoE recipe
        return inner(state, batch)

    rep = meshlib.replicated(mesh)
    shard = meshlib.batch_sharded(mesh)
    return jax.jit(step,
                   in_shardings=(rep, shard, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,) if donate_state else ())
