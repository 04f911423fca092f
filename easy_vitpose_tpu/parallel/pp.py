"""Pipeline parallelism for the ViT block stack (beyond the reference).

GPipe the TPU-native way: the depth-stacked block params shard over a
``pipe`` mesh axis (each stage holds depth/P contiguous layers), microbatches
flow stage-to-stage with ``lax.ppermute`` inside ``shard_map``, and the
backward pipeline falls out of autodiff (ppermute transposes to the reverse
ring).  No schedulers, no send/recv plumbing — the schedule is an unrolled
loop of n_micro + P - 1 ticks.

Not needed for capacity (ViT-H fits one chip trivially, SURVEY §2.3) — this
exists so the framework's parallelism tier is complete (DP/TP/EP/PP all
available and cross-checked); useful when finetuning L/H on small-HBM hosts.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..configs import BackboneConfig
from ..models.vit import block, layer_norm, patch_embed


def make_pipe_mesh(n_stages: int, devices: Optional[list] = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    assert len(devs) >= n_stages
    return Mesh(np.asarray(devs[:n_stages]), ("pipe",))


def pipeline_blocks(blocks, tokens: jnp.ndarray, cfg: BackboneConfig,
                    mesh: Mesh, n_micro: int) -> jnp.ndarray:
    """Run the block stack as a P-stage GPipe over ``n_micro`` microbatches.

    blocks: stacked (depth, ...) params pytree; depth % P == 0.
    tokens: (B, N, D) with B % n_micro == 0.
    """
    n_stages = mesh.shape["pipe"]
    assert cfg.depth % n_stages == 0, \
        f"depth {cfg.depth} not divisible by {n_stages} stages"
    B = tokens.shape[0]
    assert B % n_micro == 0

    def inner(blocks_local, toks):
        p = jax.lax.axis_index("pipe")
        micro = toks.reshape(n_micro, B // n_micro, *toks.shape[1:])

        def apply_stage(x):
            def body(c, layer):
                return block(c, layer, cfg.num_heads,
                             cfg.layer_norm_eps), None
            out, _ = jax.lax.scan(body, x, blocks_local)
            return out

        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        buf = jnp.zeros_like(micro[0])
        outs = jnp.zeros_like(micro)
        for t in range(n_micro + n_stages - 1):
            if t < n_micro:                       # stage 0 ingests micro t
                buf = jnp.where(p == 0, micro[t], buf)
            buf = apply_stage(buf)                # stage p works micro t - p
            oi = t - (n_stages - 1)
            if oi >= 0:                           # last stage emits
                outs = outs.at[oi].set(
                    jnp.where(p == n_stages - 1, buf, jnp.zeros_like(buf)))
            if t != n_micro + n_stages - 2:
                buf = jax.lax.ppermute(buf, "pipe", ring)
        # only the last stage wrote non-zero rows; psum replicates the result
        return jax.lax.psum(outs, "pipe").reshape(toks.shape)

    return shard_map(inner, mesh=mesh,
                     in_specs=(P("pipe"), P()), out_specs=P())(blocks, tokens)


def pipeline_vit_forward(params, x: jnp.ndarray, cfg: BackboneConfig,
                         mesh: Mesh, n_micro: int = 4) -> jnp.ndarray:
    """Full backbone with the block stack pipelined: (B, H, W, 3) NHWC ->
    (B, Hp, Wp, D).  Embeddings/final LN are replicated (tiny)."""
    B = x.shape[0]
    tokens = patch_embed(x, params["patch_w"], params["patch_b"],
                         cfg.patch_size, cfg.patch_padding)
    pe = params["pos_embed"]
    tokens = tokens + (pe[:, 1:] + pe[:, :1]).astype(tokens.dtype)
    tokens = pipeline_blocks(params["blocks"], tokens, cfg, mesh, n_micro)
    tokens = layer_norm(tokens, params["ln_s"], params["ln_b"],
                        cfg.layer_norm_eps)
    Hp, Wp = cfg.patch_shape
    return tokens.reshape(B, Hp, Wp, cfg.embed_dim)
