"""pjit data-parallel training step.

Replaces the reference's DDP epoch loop internals (reference
vit_utils/train_valid_fn.py:41-166): Adam + grad-clip(1.0) + AMP + gradient
sync.  Here gradient sync is implicit — params carry a replicated sharding,
batches a 'data'-sharded one, and XLA inserts the psum over ICI (no NCCL, no
GradScaler: bf16 on TPU needs no loss scaling).

State layout (a plain dict so orbax can checkpoint it directly):
  params     f32 master weights
  opt_state  optax state
  bn_state   head BatchNorm running stats (f32)
  step       int32
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import ModelConfig
from ..models.vitpose import cast_params, vitpose_forward_train
from ..parallel import mesh as meshlib
from .losses import joints_mse_loss


def make_optimizer(learning_rate: float, max_grad_norm: float = 1.0,
                   freeze_backbone: bool = False) -> optax.GradientTransformation:
    """Adam + global-norm clip (reference train_valid_fn.py:76-79, :130).

    ``freeze_backbone`` reproduces the reference's full-backbone freeze
    (train.py:118-123) by zeroing backbone updates.
    """
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate),
    )
    if freeze_backbone:
        def label(params):
            return {k: ("frozen" if k == "backbone" else "train")
                    for k in params}
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Host-side LR override — the ReduceLROnPlateau controller
    (train_valid_fn.py:79, :166) lives in the epoch loop and injects here."""
    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            s.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return s
    return jax.tree.map(visit, opt_state,
                        is_leaf=lambda s: hasattr(s, "hyperparams"))


def init_train_state(params, tx: optax.GradientTransformation) -> Dict[str, Any]:
    # BN running stats live inside params["head"]["bn_state"]; optimizer
    # must not touch them -> keep them out of the trainable tree.
    trainable, bn_state = split_bn_state(params)
    return {
        "params": trainable,
        "opt_state": tx.init(trainable),
        "bn_state": bn_state,
        "step": jnp.zeros((), jnp.int32),
    }


def split_bn_state(params):
    p = dict(params)
    head = dict(p["head"])
    bn_state = head.pop("bn_state")
    p["head"] = head
    return p, bn_state


def merge_bn_state(params, bn_state):
    p = dict(params)
    head = dict(p["head"])
    head["bn_state"] = bn_state
    p["head"] = head
    return p


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                    *, use_amp: bool = True,
                    loss_fn: Callable = joints_mse_loss):
    """Build the jittable train step.

    Batch: dict(images (B,256,192,3) f32 normalized NHWC,
                targets (B,K,64,48), target_weights (B,K,1)).
    """

    def step(state, batch, rng):
        def compute_loss(trainable):
            params = merge_bn_state(trainable, state["bn_state"])
            fwd_params = cast_params(params, jnp.bfloat16) if use_amp else params
            x = batch["images"].astype(jnp.bfloat16 if use_amp else jnp.float32)
            heat, new_bn = vitpose_forward_train(fwd_params, x, cfg, rng=rng)
            loss = loss_fn(heat, batch["targets"], batch["target_weights"])
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        gnorm = optax.global_norm(grads)
        new_state = {
            "params": new_params,
            "opt_state": new_opt,
            "bn_state": jax.tree.map(jnp.asarray, new_bn),
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step


def make_eval_step(cfg: ModelConfig, *, use_amp: bool = True,
                   loss_fn: Callable = joints_mse_loss):
    """Validation step (reference valid_model, train_valid_fn.py:22-39)."""
    from ..models.vitpose import vitpose_forward

    def step(state, batch):
        params = merge_bn_state(state["params"], state["bn_state"])
        fwd_params = cast_params(params, jnp.bfloat16) if use_amp else params
        x = batch["images"].astype(jnp.bfloat16 if use_amp else jnp.float32)
        heat = vitpose_forward(fwd_params, x, cfg).astype(jnp.float32)
        return loss_fn(heat, batch["targets"], batch["target_weights"])

    return step


def jit_data_parallel(step_fn, mesh, donate_state: bool = True):
    """jit a (state, batch, ...) step with replicated state and 'data'-sharded
    batch over the mesh — XLA derives the gradient psum over ICI."""
    rep = meshlib.replicated(mesh)
    shard = meshlib.batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
