"""Live ViTPose+ multi-task MoE model (beyond the reference's splitter).

The official ViTPose+ checkpoints are part-shared-FFN MoE models: every
block's down-projection has a shared slice (``mlp.fc2`` -> the first
D_shared output features) plus one expert slice per dataset
(``mlp.experts.{e}`` -> the remaining D - D_shared features), and six decode
heads (``keypoint_head`` for coco + five ``associate_keypoint_heads``).
The reference can only FLATTEN these into six single-task checkpoints
(reference model_split.py:14-116) — it never runs the multi-task model.

Here the unsplit model runs natively:

* task-homogeneous batches: the expert index is a TRACED scalar, selected
  per layer with ``lax.dynamic_index_in_dim`` inside the block scan — so
  switching tasks at serving time reuses one compiled program (only the
  decode head, whose K differs per task, is static);
* mixed-task batches (multi-task finetuning): a per-sample one-hot over
  experts computes every expert's slice and mixes — E ≤ 6 and the expert
  slice is a fraction of the FFN, so the overhead is bounded and the whole
  batch stays one dense XLA program (no ragged routing);
* expert parallelism: the stacked (depth, E, ...) expert axes shard over
  the mesh ``model`` axis by annotation (parallel/tp.py EP rules).

Forward equivalence with the reference's split checkpoints is tested
per-task in tests/test_moe.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from .head import head_forward
from .vit import attention, layer_norm, patch_embed

Params = Dict[str, Any]


def moe_mlp(x: jnp.ndarray, p: Params,
            expert_idx: Optional[jnp.ndarray] = None,
            expert_onehot: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Part-shared FFN: out = [h @ fc2_shared | h @ expert_e] (+ biases).

    Exactly one of ``expert_idx`` (scalar, task-homogeneous batch) or
    ``expert_onehot`` ((B, E), per-sample mixing) must be given.
    """
    from .vit import _dot, mlp as _  # noqa: F401  (gelu parity via jax.nn)
    h = _dot(x, p["fc1_w"]) + p["fc1_b"]
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    shared = (_dot(h, p["fc2_w"]) + p["fc2_b"]).astype(x.dtype)
    if expert_idx is not None:
        ew = jax.lax.dynamic_index_in_dim(p["fc2_expert_w"], expert_idx, 0,
                                          keepdims=False)
        eb = jax.lax.dynamic_index_in_dim(p["fc2_expert_b"], expert_idx, 0,
                                          keepdims=False)
        exp = (_dot(h, ew) + eb).astype(x.dtype)
    else:
        assert expert_onehot is not None
        one = expert_onehot.astype(jnp.float32)
        # all experts, then per-sample mix: dense, no ragged routing
        all_e = jnp.einsum("bnh,ehd->bned", h.astype(jnp.float32),
                           p["fc2_expert_w"].astype(jnp.float32))
        exp = (jnp.einsum("bned,be->bnd", all_e, one)
               + jnp.einsum("ed,be->bd", p["fc2_expert_b"].astype(jnp.float32),
                            one)[:, None, :]).astype(x.dtype)
    return jnp.concatenate([shared, exp], axis=-1)


def moe_block(x, p, num_heads: int, eps: float,
              expert_idx=None, expert_onehot=None):
    a = attention(layer_norm(x, p["ln1_s"], p["ln1_b"], eps), p, num_heads)
    x = x + a
    m = moe_mlp(layer_norm(x, p["ln2_s"], p["ln2_b"], eps), p["mlp"],
                expert_idx=expert_idx, expert_onehot=expert_onehot)
    return x + m


def vit_plus_forward(params: Params, x: jnp.ndarray, cfg: ModelConfig,
                     expert_idx=None, expert_onehot=None,
                     block_impl: str = "xla") -> jnp.ndarray:
    """MoE backbone: (B, H, W, 3) -> (B, Hp, Wp, D) features.

    block_impl='pallas_train'/'pallas_train_interpret' (requires a STATIC
    python-int ``expert_idx``, i.e. task-homogeneous finetuning) runs the
    blocks through the custom-VJP fused kernel: the task's expert slice
    concatenates with the shared fc2 slice into a standard dense fc2
    OUTSIDE the kernel, and autodiff scatters the fc2 gradient back to the
    shared slice and exactly the selected expert (others stay exact-zero,
    preserving the ViTPose+ freeze semantics in train/moe_step.py).
    """
    bb = cfg.backbone
    B = x.shape[0]
    tokens = patch_embed(x, params["patch_w"], params["patch_b"],
                         bb.patch_size, bb.patch_padding)
    pe = params["pos_embed"]
    tokens = tokens + (pe[:, 1:] + pe[:, :1]).astype(tokens.dtype)

    if block_impl in ("pallas_train", "pallas_train_interpret"):
        assert expert_onehot is None and expert_idx is not None \
            and not isinstance(expert_idx, jnp.ndarray), \
            "fused MoE training needs a static task (homogeneous batch)"
        from .fused_block_train import make_fused_block_train
        blocks = params["blocks"]
        m = blocks["mlp"]
        eff = {k: blocks[k] for k in ("ln1_s", "ln1_b", "qkv_w", "qkv_b",
                                      "proj_w", "proj_b", "ln2_s", "ln2_b")}
        eff["mlp"] = {
            "fc1_w": m["fc1_w"], "fc1_b": m["fc1_b"],
            "fc2_w": jnp.concatenate(
                [m["fc2_w"], m["fc2_expert_w"][:, expert_idx]], axis=-1),
            "fc2_b": jnp.concatenate(
                [m["fc2_b"], m["fc2_expert_b"][:, expert_idx]], axis=-1),
        }
        fused = make_fused_block_train(
            bb, interpret=(block_impl == "pallas_train_interpret"))
        ones = jnp.ones((B,), jnp.float32)

        def body(carry, layer):
            return fused(carry, layer, ones), None

        tokens, _ = jax.lax.scan(body, tokens, eff)
        tokens = layer_norm(tokens, params["ln_s"], params["ln_b"],
                            bb.layer_norm_eps)
        Hp, Wp = bb.patch_shape
        return tokens.reshape(B, Hp, Wp, bb.embed_dim)

    if expert_idx is not None and not isinstance(expert_idx, jnp.ndarray):
        expert_idx = jnp.asarray(expert_idx, jnp.int32)

    def body(carry, layer):
        out = moe_block(carry, layer, bb.num_heads, bb.layer_norm_eps,
                        expert_idx=expert_idx, expert_onehot=expert_onehot)
        return out, None

    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])
    tokens = layer_norm(tokens, params["ln_s"], params["ln_b"],
                        bb.layer_norm_eps)
    Hp, Wp = bb.patch_shape
    return tokens.reshape(B, Hp, Wp, bb.embed_dim)


def vitpose_plus_forward(params: Params, x: jnp.ndarray, cfg: ModelConfig,
                         task: str, expert_onehot=None) -> jnp.ndarray:
    """Full multi-task forward: crops -> (B, K_task, 64, 48) heatmaps.

    ``task`` selects the decode head (static — K differs per task) and, when
    ``expert_onehot`` is None, the FFN expert (traced index: switching tasks
    with the same K reuses the compiled program).  Expert order is the
    reference's canonical dataset order (model_split.py:73-74).
    """
    from ..convert.model_split import SPLIT_DATASETS
    ei = SPLIT_DATASETS.index(task)
    feats = vit_plus_forward(
        params["backbone"], x, cfg,
        expert_idx=None if expert_onehot is not None else ei,
        expert_onehot=expert_onehot)
    head_p = params["heads"][task]
    k_task = head_p["final_w"].shape[-1]
    head_cfg = dataclasses.replace(cfg.head, num_keypoints=k_task)
    heat, _ = head_forward(head_p, feats, head_cfg, train=False)
    return jnp.transpose(heat, (0, 3, 1, 2))


def vitpose_plus_forward_train(params: Params, x: jnp.ndarray,
                               cfg: ModelConfig, task: str,
                               block_impl: str = "xla",
                               axis_name=None):
    """Training forward for one task: returns (heatmaps NCHW, new_bn_state
    for THAT task's head).  Multi-task finetuning alternates tasks across
    steps (the ViTPose+ recipe); gradients reach the shared backbone, the
    active expert slice, and the active head only."""
    from ..convert.model_split import SPLIT_DATASETS
    ei = SPLIT_DATASETS.index(task)
    feats = vit_plus_forward(params["backbone"], x, cfg, expert_idx=ei,
                             block_impl=block_impl)
    head_p = params["heads"][task]
    k_task = head_p["final_w"].shape[-1]
    head_cfg = dataclasses.replace(cfg.head, num_keypoints=k_task)
    heat, new_bn = head_forward(head_p, feats, head_cfg, train=True,
                                axis_name=axis_name)
    return jnp.transpose(heat, (0, 3, 1, 2)), new_bn


def init_vitpose_plus_params(rng: jax.Array, cfg: ModelConfig,
                             tasks=("coco", "aic"),
                             expert_frac: float = 0.25,
                             dtype=jnp.float32) -> Params:
    """Random-init a multi-task ViTPose+ tree (same structure the
    checkpoint converter produces: ``{"backbone": ..., "heads": {...}}``).

    ``tasks`` must be a prefix of the reference's canonical expert order
    (convert/model_split.py SPLIT_DATASETS); ``expert_frac`` is the
    fraction of the FFN output dim owned by the per-task expert slice
    (the part-shared FFN of upstream ViTPose+).  Used by tests and the
    driver's EP dryrun — real checkpoints come from
    convert/vitpose_plus.py.
    """
    from ..convert.model_split import SPLIT_DATASETS
    from ..skeletons import num_keypoints
    from .head import init_head_params
    from .vit import init_vit_params

    for i, t in enumerate(tasks):
        assert SPLIT_DATASETS[i] == t, \
            f"tasks must be a prefix of {SPLIT_DATASETS}"
    D = cfg.backbone.embed_dim
    depth = cfg.backbone.depth
    E = len(tasks)
    d_exp = max(int(D * expert_frac), 1)
    d_shared = D - d_exp
    kb, ke, *kh = jax.random.split(rng, 2 + E)
    backbone = init_vit_params(kb, cfg.backbone, dtype)
    m = backbone["blocks"]["mlp"]
    hidden = m["fc2_w"].shape[1]
    backbone["blocks"]["mlp"] = {
        "fc1_w": m["fc1_w"], "fc1_b": m["fc1_b"],
        "fc2_w": m["fc2_w"][..., :d_shared],
        "fc2_b": m["fc2_b"][..., :d_shared],
        "fc2_expert_w": (jax.random.truncated_normal(
            ke, -2.0, 2.0, (depth, E, hidden, d_exp)) * 0.02).astype(dtype),
        "fc2_expert_b": jnp.zeros((depth, E, d_exp), dtype),
    }
    heads = {}
    for i, t in enumerate(tasks):
        k_task = num_keypoints(t)
        hc = dataclasses.replace(cfg.head, num_keypoints=k_task)
        heads[t] = init_head_params(kh[i], hc, dtype)
    return {"backbone": backbone, "heads": heads}
