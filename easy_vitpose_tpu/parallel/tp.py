"""Tensor parallelism for ViTPose training (beyond the reference).

The reference has only DDP (SURVEY §2.3); this adds Megatron-style tensor
parallelism the TPU-native way — NO hand-written collectives, just
``NamedSharding`` annotations on the weight pytree over a 2-D
``(data, model)`` mesh, with XLA/GSPMD deriving the ICI collectives:

* column-parallel: ``qkv_w``/``fc1_w`` (and their biases) shard the OUTPUT
  feature axis over ``model`` — each shard computes its slice of heads /
  MLP hidden units locally;
* row-parallel: ``proj_w``/``fc2_w`` shard the INPUT feature axis — GSPMD
  inserts the psum that completes the block output (the Megatron pattern);
* everything else (embeddings, LN, head, biases of row-parallel layers) is
  replicated; batches stay ``data``-sharded.

Optimizer moments mirror the parameter tree, so the same path-suffix rules
shard them too — the full train state partitions without special cases.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# sharding rule by trailing pytree key (applies to params AND the optimizer
# moments that mirror them; leading axis is the lax.scan depth stack)
_RULES = {
    "qkv_w": P(None, None, "model"),
    "qkv_b": P(None, "model"),
    "fc1_w": P(None, None, "model"),
    "fc1_b": P(None, "model"),
    "proj_w": P(None, "model", None),
    "fc2_w": P(None, "model", None),
    # expert parallelism (ViTPose+ MoE, models/moe.py): the stacked
    # (depth, E, hidden, D_exp) expert axes shard over 'model' — each
    # shard holds E/m experts; GSPMD fetches the active expert's slice
    "fc2_expert_w": P(None, "model", None, None),
    "fc2_expert_b": P(None, "model", None),
}


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[list] = None) -> Mesh:
    """(data, model) mesh over the first n_data*n_model devices."""
    devs = devices if devices is not None else jax.devices()
    n = n_data * n_model
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.asarray(devs[:n]).reshape(n_data, n_model),
                ("data", "model"))


def _spec_for(path, leaf) -> P:
    name = ""
    for p in reversed(path):
        k = str(getattr(p, "key", getattr(p, "name", "")))
        if k:
            name = k
            break
    spec = _RULES.get(name)
    if spec is None or len(spec) != getattr(leaf, "ndim", 0):
        return P()
    return spec


def tp_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for params / train state over a 2-D mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, _spec_for(path, x)), tree)


def shard_state(state, mesh: Mesh):
    """Device-put a train state (or params pytree) with TP shardings."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, _spec_for(path, x))), state)


def jit_tensor_parallel(step_fn, mesh: Mesh, state_template,
                        donate_state: bool = True):
    """jit a (state, batch, rng) train step over a (data, model) mesh:
    TP-sharded weights/moments, data-sharded batch, replicated scalars.
    XLA derives both the data-parallel gradient psum and the tensor-parallel
    activation collectives from the shardings alone."""
    state_sh = tp_shardings(state_template, mesh)
    batch_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,) if donate_state else (),
    )
