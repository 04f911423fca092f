"""ViTPose = ViT backbone + heatmap head (reference: vit_models/model.py:10-24).

Pure-functional composition; params pytree is ``{"backbone": ..., "head": ...}``.
Outputs heatmaps in NCHW order at the API boundary to match the reference's
(B, K, 64, 48) convention (internals are NHWC for TPU).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from .head import head_forward, init_head_params
from .vit import init_vit_params, vit_forward

Params = Dict[str, Any]


def vitpose_forward(params: Params, x: jnp.ndarray, cfg: ModelConfig,
                    *, train: bool = False,
                    rng: Optional[jax.Array] = None,
                    attn_impl: str = "einsum",
                    unroll: bool = False,
                    block_impl: str = "xla",
                    deconv_impl: str = "phase") -> jnp.ndarray:
    """(B, 256, 192, 3) normalized NHWC crops -> (B, K, 64, 48) heatmaps."""
    feats = vit_forward(params["backbone"], x, cfg.backbone, train=train,
                        rng=rng, attn_impl=attn_impl, unroll=unroll,
                        block_impl=block_impl)
    heat, _ = head_forward(params["head"], feats, cfg.head, train=False,
                           deconv_impl=deconv_impl)
    return jnp.transpose(heat, (0, 3, 1, 2))


# the TRAINING head lowering (serving uses 'phase'): one home so the
# generic step (train/step.py) and the manual-VJP step (train/fast_step.py)
# can never drift apart.  Measured on-chip at ViT-B/64, see
# scripts/bench_head_train.py and PERF.md "Head lowering is mode-dependent".
TRAIN_DECONV_IMPL = "dilated"


def vitpose_forward_train(params: Params, x: jnp.ndarray, cfg: ModelConfig,
                          rng: Optional[jax.Array] = None,
                          remat: bool = False,
                          block_impl: str = "xla",
                          drop_path_masks=None,
                          axis_name: Optional[str] = None,
                          deconv_impl: str = TRAIN_DECONV_IMPL
                          ) -> Tuple[jnp.ndarray, Any]:
    """Training forward: returns (heatmaps NCHW, new_bn_state).

    block_impl='pallas_train' selects the custom-VJP fused block
    (models/fused_block_train.py) — fused forward AND backward on TPU.
    ``drop_path_masks``/``axis_name``: per-device shard_map DP path —
    pre-drawn global stochastic-depth masks and the mesh data axis for
    global BN statistics (see train/step.py make_train_step_sharded).

    ``deconv_impl`` defaults to 'dilated' here (vs 'phase' for serving):
    measured on-chip at ViT-B/64 the phase decomposition's train-mode
    fwd+bwd is 8.69 ms vs dilated 3.60 ms (scripts/bench_head_train.py) —
    XLA lowers the dilated convT's VJP well, while the phase form's
    strided pixel-shuffle slices turn into scatter-shaped HLO under
    train-mode BN.  Serving (inference BN, no VJP) measures the other way
    (scripts/bench_head.py).
    """
    feats = vit_forward(params["backbone"], x, cfg.backbone, train=True,
                        rng=rng, remat=remat, block_impl=block_impl,
                        drop_path_masks=drop_path_masks)
    heat, new_bn = head_forward(params["head"], feats, cfg.head, train=True,
                                axis_name=axis_name, deconv_impl=deconv_impl)
    return jnp.transpose(heat, (0, 3, 1, 2)), new_bn


def init_vitpose_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    kb, kh = jax.random.split(rng)
    return {
        "backbone": init_vit_params(kb, cfg.backbone, dtype),
        "head": init_head_params(kh, cfg.head, dtype),
    }


def cast_params(params: Params, dtype) -> Params:
    """Cast floating-point weights (keeps BN running stats in f32)."""
    def cast(path, x):
        if any(isinstance(k, jax.tree_util.DictKey) and k.key in ("mean", "var")
               for k in path):
            return x
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return jax.tree_util.tree_map_with_path(cast, params)
