"""ViTPose backbone, TPU-first.

Functional (params-pytree) plain-ViT encoder equivalent in math to the
reference backbone (reference: vit_models/backbone/vit.py:263-394) but designed
for XLA/TPU:

* NHWC layout end-to-end (TPU conv native layout); the patch conv is lowered to
  one big matmul over unfolded patches so it lands on the MXU.
* fused QKV projection; attention computed in (B, heads, N, d) with bf16
  matmuls and f32 accumulation (``preferred_element_type``).
* no data-dependent control flow; the block stack is a ``lax.scan`` over
  stacked per-layer parameters so the compiled HLO is depth-independent.
* exact-erf GELU (torch ``nn.GELU`` default), LayerNorm eps 1e-6.

Reference quirks reproduced (load-bearing for checkpoint parity):
* PatchEmbed conv k16 s16 **padding=2** (the reference's padding expression
  4+2*(ratio//2-1) evaluates to 2 at ratio=1) -> 16x12 = 192 tokens for
  256x192 input (reference vit.py:222).
* pos-embed has a leading (pre-training cls) token and is applied as
  ``x + pos_embed[:, 1:] + pos_embed[:, :1]`` (reference vit.py:382).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import BackboneConfig

Params = Dict[str, Any]


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the trailing dim, computed in f32 for stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def patch_embed(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                patch: int, pad: int) -> jnp.ndarray:
    """Patch embedding as unfold + matmul (MXU-friendly).

    Args:
      x: (B, H, W, 3) NHWC image.
      w: (patch*patch*3, D) flattened projection (converted from torch OIHW).
      b: (D,)
    Returns:
      (B, Hp*Wp, D) tokens; Hp/Wp include the reference's padding=2 quirk.
    """
    B, H, W, C = x.shape
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Hp = (H + 2 * pad - patch) // patch + 1
    Wp = (W + 2 * pad - patch) // patch + 1
    # Non-overlapping stride==kernel after cropping to an exact multiple.
    x = x[:, : Hp * patch, : Wp * patch, :]
    x = x.reshape(B, Hp, patch, Wp, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp * Wp, patch * patch * C)
    return (_dot(x, w) + b).astype(x.dtype)


def attention(x: jnp.ndarray, p: Params, num_heads: int,
              impl: str = "einsum") -> jnp.ndarray:
    """Fused-QKV MHSA (reference vit.py:143-180 semantics).

    impl='einsum': explicit QK^T softmax V with f32 logits (parity path).
    impl='sdpa': jax.nn.dot_product_attention — lets XLA pick a fused
    attention lowering where available.
    """
    B, N, D = x.shape
    qkv = _dot(x, p["qkv_w"]) + p["qkv_b"]          # (B, N, 3D) f32
    qkv = qkv.astype(x.dtype).reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, N, h, d)
    if impl == "sdpa":
        out = jax.nn.dot_product_attention(q, k, v)  # (B, N, h, d)
        out = out.reshape(B, N, D)
    else:
        q = jnp.swapaxes(q, 1, 2)                    # (B, h, N, d)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        scale = (D // num_heads) ** -0.5
        # Logits stay in the compute dtype: materializing them in f32 costs
        # ~113 MB HBM traffic per ViT-B layer at batch 64 and was measured at
        # +38% step time (38.9 -> 28.2 ms going bf16; keypoint scores agree
        # to 7e-7).  The f32 path is byte-identical to the old behaviour.
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        probs = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
    return (_dot(out, p["proj_w"]) + p["proj_b"]).astype(x.dtype)


def mlp(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    h = _dot(x, p["fc1_w"]) + p["fc1_b"]
    # torch nn.GELU default is the exact erf form, NOT tanh-approx.
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    return (_dot(h, p["fc2_w"]) + p["fc2_b"]).astype(x.dtype)


def block(x: jnp.ndarray, p: Params, num_heads: int, eps: float,
          drop_path_keep: Optional[jnp.ndarray] = None,
          attn_impl: str = "einsum") -> jnp.ndarray:
    """Pre-LN transformer block (reference vit.py:182-205).

    ``drop_path_keep``: optional (B, 1, 1) pre-scaled stochastic-depth mask
    (mask/keep_prob) applied to each residual branch during training.
    """
    a = attention(layer_norm(x, p["ln1_s"], p["ln1_b"], eps), p, num_heads,
                  impl=attn_impl)
    if drop_path_keep is not None:
        # mask is f32 (1/keep_prob scaling must stay exact); cast the
        # product back so the bf16-AMP residual stream keeps its dtype
        # (a f32 carry would break the scan and double HBM traffic)
        a = (a * drop_path_keep).astype(x.dtype)
    x = x + a
    m = mlp(layer_norm(x, p["ln2_s"], p["ln2_b"], eps), p["mlp"])
    if drop_path_keep is not None:
        m = (m * drop_path_keep).astype(x.dtype)
    return x + m


def draw_drop_path_masks(rng: jax.Array, cfg: BackboneConfig,
                         B: int) -> jnp.ndarray:
    """Per-layer stochastic-depth keep masks, pre-scaled by 1/keep_prob.

    Returns (depth, B, 1, 1) f32.  Extracted from vit_forward so a
    data-parallel shard_map wrapper can draw the masks for the GLOBAL
    batch once (replicated rng -> identical draws everywhere) and shard
    the rows — reproducing the single-program draw pattern exactly.
    """
    depth = cfg.depth
    dpr = np.linspace(0.0, cfg.drop_path_rate, depth).astype(np.float32)
    keys = jax.random.split(rng, depth)
    keep_prob = 1.0 - jnp.asarray(dpr)
    return jax.vmap(
        lambda k, kp: jnp.floor(kp + jax.random.uniform(k, (B, 1, 1))) / kp
    )(keys, keep_prob)


def vit_forward(params: Params, x: jnp.ndarray, cfg: BackboneConfig,
                *, train: bool = False, rng: Optional[jax.Array] = None,
                unroll: bool = False, remat: bool = False,
                attn_impl: str = "einsum",
                block_impl: str = "xla",
                drop_path_masks: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Run the backbone.

    Args:
      params: pytree with keys ``patch_w, patch_b, pos_embed, blocks, ln_s, ln_b``.
        ``blocks`` holds per-layer params stacked on a leading depth axis.
      x: (B, H, W, 3) normalized image, NHWC.
      train: apply stochastic depth (drop-path) when True.
      rng: PRNG key for drop-path (required when train and drop_path_rate > 0).
      unroll: python-unroll the block stack instead of lax.scan.
      remat: rematerialize each block's activations in the backward pass
        (jax.checkpoint) — trades FLOPs for HBM when training L/H sizes.
      block_impl: 'xla' (default) composes LN/attention/MLP as XLA ops;
        'pallas' runs the whole block in one fused VMEM kernel
        (models/fused_block.py — serving only, no drop-path);
        'pallas_interpret' is the same kernel in interpreter mode (CPU tests).
        'xla_q8' / 'pallas_q8' / 'pallas_q8_interpret' are the int8 W8A8
        twins (models/quant.py) and require ``params["blocks"]`` produced
        by :func:`..models.quant.quantize_vit_params`.
        'pallas_train' / 'pallas_train_interpret' is the custom-VJP fused
        block (models/fused_block_train.py): fused Pallas forward AND
        backward, drop-path supported — the fast TRAINING path.

    Returns:
      (B, Hp, Wp, D) feature map, NHWC.
    """
    B = x.shape[0]
    if cfg.stem_channels:
        # hybrid CNN-stem embedding (reference HybridEmbed, vit.py:231-260)
        from .stem import stem_forward
        tokens = stem_forward(params["stem"], x, cfg)
    else:
        tokens = patch_embed(x, params["patch_w"], params["patch_b"],
                             cfg.patch_size, cfg.patch_padding)
    pe = params["pos_embed"]  # (1, N+1, D), leading slot is the vestigial cls token
    tokens = tokens + (pe[:, 1:] + pe[:, :1]).astype(tokens.dtype)

    depth = cfg.depth
    use_dp = train and cfg.drop_path_rate > 0.0
    if drop_path_masks is not None:
        # pre-drawn (depth, B, 1, 1) masks (shard_map DP path slices the
        # global draw); overrides the in-function draw
        masks = drop_path_masks
        use_dp = True
    elif use_dp:
        assert rng is not None, "rng required for drop-path in training"
        masks = draw_drop_path_masks(rng, cfg, B)
    else:
        masks = None

    use_pallas = block_impl in ("pallas", "pallas_interpret")
    use_q8 = block_impl in ("xla_q8", "pallas_q8", "pallas_q8_interpret")
    use_fused_train = block_impl in ("pallas_train",
                                     "pallas_train_interpret")
    if use_pallas or use_q8:
        assert not use_dp, "fused/int8 blocks are serving paths (no drop-path)"
    if use_pallas:
        from .fused_block import fused_block
    if use_q8:
        from .quant import block_q8, fused_block_q8, is_q8_blocks
        assert is_q8_blocks(params["blocks"]), \
            "block_impl=*_q8 needs params from quantize_vit_params()"
    if use_fused_train:
        from .fused_block_train import make_fused_block_train
        fused_train = make_fused_block_train(
            cfg, interpret=(block_impl == "pallas_train_interpret"))

    def body(carry, layer):
        p, mask = (layer, None) if masks is None else layer
        if use_pallas:
            out = fused_block(carry, p, cfg,
                              interpret=(block_impl == "pallas_interpret"))
        elif block_impl == "xla_q8":
            out = block_q8(carry, p, cfg.num_heads, cfg.layer_norm_eps)
        elif use_q8:
            out = fused_block_q8(
                carry, p, cfg,
                interpret=(block_impl == "pallas_q8_interpret"))
        elif use_fused_train:
            dpk = (jnp.ones((B,), jnp.float32) if mask is None
                   else mask.reshape(B))
            out = fused_train(carry, p, dpk)
        else:
            out = block(carry, p, cfg.num_heads, cfg.layer_norm_eps, mask,
                        attn_impl=attn_impl)
        return out, None

    if remat:
        body = jax.checkpoint(body)

    if unroll:
        # python-unrolled stack: one HLO per layer — lets XLA schedule
        # across block boundaries (can beat scan for serving); scan keeps
        # compile time/HLO size depth-independent (default).
        for i in range(depth):
            layer = jax.tree.map(lambda a, i=i: a[i], params["blocks"])
            tokens, _ = body(tokens, layer if masks is None
                             else (layer, masks[i]))
    else:
        xs = params["blocks"] if masks is None else (params["blocks"], masks)
        tokens, _ = jax.lax.scan(body, tokens, xs)

    tokens = layer_norm(tokens, params["ln_s"], params["ln_b"], cfg.layer_norm_eps)
    Hp, Wp = cfg.patch_shape
    return tokens.reshape(B, Hp, Wp, cfg.embed_dim)


def init_vit_params(rng: jax.Array, cfg: BackboneConfig,
                    dtype=jnp.float32) -> Params:
    """Random init mirroring the reference scheme (trunc-normal 0.02 linears,
    zero biases, unit LN; reference vit.py:348-366)."""
    D = cfg.embed_dim
    hidden = int(D * cfg.mlp_ratio)
    n_tok = cfg.num_tokens
    kp, ke, *kb = jax.random.split(rng, 2 + cfg.depth)

    def tn(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2.0, 2.0, shape) * std).astype(dtype)

    def block_params(key):
        k = jax.random.split(key, 4)
        return {
            "ln1_s": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
            "qkv_w": tn(k[0], (D, 3 * D)), "qkv_b": jnp.zeros((3 * D,), dtype),
            "proj_w": tn(k[1], (D, D)), "proj_b": jnp.zeros((D,), dtype),
            "ln2_s": jnp.ones((D,), dtype), "ln2_b": jnp.zeros((D,), dtype),
            "mlp": {
                "fc1_w": tn(k[2], (D, hidden)), "fc1_b": jnp.zeros((hidden,), dtype),
                "fc2_w": tn(k[3], (hidden, D)), "fc2_b": jnp.zeros((D,), dtype),
            },
        }

    blocks = jax.tree.map(lambda *xs: jnp.stack(xs), *[block_params(k) for k in kb])
    out = {
        "pos_embed": tn(ke, (1, n_tok + 1, D)),
        "blocks": blocks,
        "ln_s": jnp.ones((D,), dtype),
        "ln_b": jnp.zeros((D,), dtype),
    }
    if cfg.stem_channels:
        from .stem import init_stem_params
        out["stem"] = init_stem_params(kp, cfg, dtype)
    else:
        out["patch_w"] = tn(kp, (cfg.patch_size * cfg.patch_size
                                 * cfg.in_chans, D))
        out["patch_b"] = jnp.zeros((D,), dtype)
    return out
