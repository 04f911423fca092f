"""Manual-VJP train step with IN-BACKWARD global grad-norm.

``make_train_step(block_impl='pallas_train')`` reaches the fused Pallas
backward kernels through ``jax.custom_vjp``, which has one structural
cost: the clip-by-global-norm scale (reference vit_utils/
train_valid_fn.py:130 ``clip_grad_norm_``) must be computed AFTER
``jax.grad`` returns, as a separate reduce over the full stacked
gradient set — an extra HBM read of every gradient byte that cannot
start until the whole backward has finished, and that every optimizer
update then waits on (custom_vjp's backward can return only input
cotangents, so a norm computed inside it has no way out).

This module removes that barrier by running the block backward scan BY
HAND (the forward/backward impls in models/fused_block_train.py are
plain functions): each reverse-scan step computes its layer's gradient
sum-of-squares immediately after the layer's backward kernels, while
the gradients are still hot, and the global norm is ready the moment
the backward finishes — no trailing full-gradient read.  The embed and
head/loss ends of the model stay under ``jax.vjp`` (they are small and
XLA fuses them well); only the block stack — ~99% of the parameters —
is manual.

Numerics are IDENTICAL to ``make_train_step(block_impl='pallas_train')``
by construction (same kernels, same bf16 cast points, same drop-path
draws, same loss dataflow); pinned in tests/test_fast_step.py.

MEASURED RESULT (r5, on-chip interleaved `bench_train.py --fused
--ab-inbwd`, ViT-B/64): **0.99x — a null**.  71.92 ms vs 71.17 for the
custom-VJP step with the same fused Adam.  The trailing norm read the
design removes was ALREADY hidden by XLA's scheduler (it overlaps the
tail of the backward), and the per-layer sum-of-squares this step adds
inside the reverse scan costs about what the trailing read did.  Kept
in-tree, parity-pinned, as the documented record (repo convention for
nulls) and as the only step whose gradients are produced outside
``jax.grad`` — useful scaffolding if a future backward wants fusions
``custom_vjp`` cannot express.  The shipping step remains
train/step.py::make_train_step.

Scope (asserted): AMP bf16, fused Pallas blocks, patch embedding (no
hybrid stem), grad_accum=1, optimizer exposing ``fused_apply`` with a
precomputed-norm argument (train/fused_opt.py).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..models import fused_block_train as fbt
from ..models.head import head_forward
from ..models.vit import draw_drop_path_masks, layer_norm, patch_embed
from ..models.vitpose import TRAIN_DECONV_IMPL
from .losses import joints_mse_loss
from .step import _ema_update, render_batch_on_device


def _sumsq(tree) -> jnp.ndarray:
    return sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
               for g in jax.tree_util.tree_leaves(tree))


def _cast_tree(tree, dtype):
    return jax.tree.map(lambda a: a.astype(dtype), tree)


def make_train_step_inbwd(cfg: ModelConfig, tx, *,
                          loss_fn: Callable = joints_mse_loss,
                          ema_decay: float = 0.0,
                          render_kwargs: Dict = None,
                          deconv_impl: str = None,
                          interpret: bool = False):
    """Build the in-backward-norm train step (see module docstring).

    Same ``(state, batch, rng) -> (state, metrics)`` contract as
    ``make_train_step(cfg, tx, use_amp=True, block_impl='pallas_train')``.
    ``tx`` must expose ``fused_apply(grads, state, params, gnorm=...)``
    (train/fused_opt.py::make_fused_adam).
    """
    assert hasattr(tx, "fused_apply"), \
        "make_train_step_inbwd needs a fused optimizer (train/fused_opt.py)"
    bcfg = cfg.backbone
    assert not bcfg.stem_channels, \
        "hybrid-stem configs: use train/step.py::make_train_step"
    if deconv_impl is None:
        deconv_impl = TRAIN_DECONV_IMPL
    eps = bcfg.layer_norm_eps
    depth, D = bcfg.depth, bcfg.embed_dim
    Hp, Wp = bcfg.patch_shape
    amp = jnp.bfloat16

    def step(state, batch, rng):
        batch = render_batch_on_device(batch, render_kwargs)
        trainable, bn_state = state["params"], state["bn_state"]
        B = batch["images"].shape[0]

        # same draw as make_train_step -> vitpose_forward_train ->
        # vit_forward (rate 0 degenerates to all-ones masks, which is
        # exactly what the custom_vjp path feeds the kernels)
        if bcfg.drop_path_rate > 0.0:
            masks = draw_drop_path_masks(rng, bcfg, B)
        else:
            masks = jnp.ones((depth, B, 1, 1), jnp.float32)

        # ---- embed end (jax.vjp; casts mirror cast_params + vit_forward)
        bb = trainable["backbone"]

        def embed(ep):
            x = batch["images"].astype(amp)
            tokens = patch_embed(x, ep["patch_w"].astype(amp),
                                 ep["patch_b"].astype(amp),
                                 bcfg.patch_size, bcfg.patch_padding)
            pe = ep["pos_embed"].astype(amp)
            return tokens + (pe[:, 1:] + pe[:, :1]).astype(tokens.dtype)

        embed_params = {"patch_w": bb["patch_w"], "patch_b": bb["patch_b"],
                        "pos_embed": bb["pos_embed"]}
        tokens0, embed_vjp = jax.vjp(embed, embed_params)

        # ---- block stack forward (manual scan, saving residuals)
        blocks16 = _cast_tree(bb["blocks"], amp)
        sq_flag, sm_flag = fbt.saved_flags(D)

        def fwd_body(carry, xs):
            layer, mask = xs
            out, x1, qkv, m_sav = fbt._fused_train_fwd_impl(
                carry, mask.reshape(-1), layer, bcfg, interpret)
            res = {"x": carry, "x1": x1}
            if sq_flag:
                res["qkv"] = qkv
            if sm_flag:
                res["m"] = m_sav
            return out, res

        tokens_out, residuals = jax.lax.scan(fwd_body, tokens0,
                                             (blocks16, masks))

        # ---- tail: final LN + head + loss (jax.vjp, f32 params in,
        # bf16 cast inside — identical dataflow to compute_loss)
        def tail(tp, tokens):
            t = layer_norm(tokens, tp["ln_s"].astype(amp),
                           tp["ln_b"].astype(amp), eps)
            feats = t.reshape(B, Hp, Wp, D)
            head_p = jax.tree.map(lambda a: a.astype(amp), tp["head"])
            head_p["bn_state"] = bn_state
            heat, new_bn = head_forward(head_p, feats, cfg.head, train=True,
                                        deconv_impl=deconv_impl)
            loss = loss_fn(jnp.transpose(heat, (0, 3, 1, 2)),
                           batch["targets"], batch["target_weights"])
            return loss, new_bn

        tail_params = {"ln_s": bb["ln_s"], "ln_b": bb["ln_b"],
                       "head": trainable["head"]}
        loss, tail_vjp, new_bn = jax.vjp(
            tail, tail_params, tokens_out, has_aux=True)
        d_tail, d_tokens = tail_vjp(jnp.ones((), loss.dtype))
        new_bn = jax.tree.map(jnp.asarray, new_bn)

        # ---- block stack backward (reverse scan): per-layer grads AND
        # their sum-of-squares, computed while the layer's gradients are
        # hot — this is the in-backward norm
        def bwd_body(dout, xs):
            layer, mask, res = xs
            dx, dparams = fbt._fused_train_bwd_impl(
                res["x"], res["x1"], res.get("qkv"), res.get("m"),
                dout, mask.reshape(-1), layer, bcfg, interpret)
            # the custom_vjp path's gradients pass through the params'
            # bf16 cast (cast-VJP = astype(f32)); reproduce it exactly,
            # THEN square — the norm must see the same rounded values
            dparams = _cast_tree(dparams, jnp.float32)
            return dx, (dparams, _sumsq(dparams))

        d_tok0, (block_grads, block_sq) = jax.lax.scan(
            bwd_body, d_tokens, (blocks16, masks, residuals), reverse=True)

        (d_embed,) = embed_vjp(d_tok0)

        grads = {
            "backbone": {
                "patch_w": d_embed["patch_w"],
                "patch_b": d_embed["patch_b"],
                "pos_embed": d_embed["pos_embed"],
                "blocks": block_grads,
                "ln_s": d_tail["ln_s"],
                "ln_b": d_tail["ln_b"],
            },
            "head": d_tail["head"],
        }
        gnorm = jnp.sqrt(jnp.sum(block_sq) + _sumsq(d_embed)
                         + _sumsq(d_tail))

        new_params, new_opt, gnorm = tx.fused_apply(
            grads, state["opt_state"], trainable, gnorm=gnorm)
        new_state = {
            "params": new_params,
            "opt_state": new_opt,
            "bn_state": new_bn,
            "step": state["step"] + 1,
        }
        new_state.update(_ema_update(state, new_params, ema_decay))
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return step
