"""Fused clip+Adam optimizer: one HBM pass per parameter leaf.

The default optimizer (train/step.py::make_optimizer) is the optax chain
``clip_by_global_norm -> adam`` followed by ``optax.apply_updates`` — a
faithful port of the reference recipe (reference vit_utils/
train_valid_fn.py:76-79, :130).  On TPU that dataflow costs ~4 HBM
round-trips over the parameter set per step (norm pass, clip-scale pass,
Adam moment pass, apply-updates pass); at ViT-B/64 the optimizer is
~5.2 ms of a 71 ms step and it scales linearly with parameter count
(ViT-H: 632M params), see PERF.md's step decomposition.

This module fuses everything after the norm reduction into a single pass:
for each leaf, read (g, mu, nu, p) once and write (mu', nu', p') once —
the bandwidth floor for Adam.  Two implementations with identical math:

* ``xla``  — one ``tree_map`` producing the three outputs per leaf in one
  fused elementwise loop (no intermediate ``updates`` tree, no separate
  ``apply_updates`` pass).
* ``pallas`` — per-leaf Pallas VMEM kernel for large aligned leaves
  (>= 1M elements, last dim % 128 == 0, leading rows % 8 == 0), XLA
  fallback for the small remainder.  Selected with EVT_FUSED_OPT=pallas.

Update rule (bitwise the optax one, eps_root=0):
  s    = min(1, max_norm / ||g||)          # clip_by_global_norm
  mu'  = b1*mu + (1-b1)*(s*g)
  nu'  = b2*nu + (1-b2)*(s*g)^2
  p'   = p - lr * (mu'/(1-b1^t)) / (sqrt(nu'/(1-b2^t)) + eps)

State is a :class:`FusedAdamState` namedtuple carrying a ``hyperparams``
dict so the epoch loop's ReduceLROnPlateau controller
(train/step.py::set_learning_rate / get_learning_rate) works unchanged.
``learning_rate`` may be a float or an optax schedule (count -> lr).

Usage:
    tx = make_fused_adam(5e-4)
    state = tx.init(params)
    new_params, new_state, gnorm = tx.fused_apply(grads, state, params)

``make_train_step``/``make_train_step_sharded`` detect ``fused_apply``
and skip the generic update/apply_updates path.
"""
from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp


class FusedAdamState(NamedTuple):
    count: jnp.ndarray          # int32 step counter
    mu: Any                     # first-moment tree (f32, like params)
    nu: Any                     # second-moment tree
    hyperparams: dict           # {"learning_rate": f32 scalar} — the
    #                             realized LR of the LAST update (matches
    #                             inject_hyperparams semantics for
    #                             get/set_learning_rate)


class FusedAdam(NamedTuple):
    init: Callable
    fused_apply: Callable


def _pallas_leaf_shape(x) -> tuple | None:
    """(rows, cols) view if the leaf qualifies for the Pallas kernel."""
    if x.size < (1 << 20) or x.ndim < 2 or x.dtype != jnp.float32:
        return None
    cols = x.shape[-1]
    rows = x.size // cols
    if cols % 128 or rows % 8:
        return None
    return rows, cols


def _tile_rows(rows: int, cols: int) -> int:
    """Largest row tile <= ~1M elements that divides rows and is % 8."""
    target = max(8, (1 << 20) // cols)
    t = min(rows, target - target % 8 or 8)
    while rows % t or t % 8:
        t -= 8
        if t <= 0:
            return rows
    return t


def _adam_leaf_pallas(g, mu, nu, p, scal, *, b1, b2, eps):
    """One-pass clip+Adam on a single (rows%8, cols%128) f32 leaf.

    ``scal`` is a (1, 4) f32 of (clip_scale, lr, 1-b1^t, 1-b2^t) in SMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = _pallas_leaf_shape(p)
    t = _tile_rows(rows, cols)
    shape2 = (rows, cols)

    def kern(scal_ref, g_ref, mu_ref, nu_ref, p_ref,
             mu_out, nu_out, p_out):
        s = scal_ref[0, 0]
        lr = scal_ref[0, 1]
        c1 = scal_ref[0, 2]
        c2 = scal_ref[0, 3]
        gs = g_ref[:] * s
        mu_n = b1 * mu_ref[:] + (1.0 - b1) * gs
        nu_n = b2 * nu_ref[:] + (1.0 - b2) * gs * gs
        mu_out[:] = mu_n
        nu_out[:] = nu_n
        p_out[:] = p_ref[:] - lr * (mu_n / c1) / (
            jnp.sqrt(nu_n / c2) + eps)

    blk = pl.BlockSpec((t, cols), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    out3 = tuple(jax.ShapeDtypeStruct(shape2, jnp.float32)
                 for _ in range(3))
    mu_n, nu_n, p_n = pl.pallas_call(
        kern,
        grid=(rows // t,),
        in_specs=[scal_spec, blk, blk, blk, blk],
        out_specs=(blk, blk, blk),
        out_shape=out3,
        interpret=os.environ.get("EVT_FUSED_OPT_INTERPRET") == "1",
    )(scal, g.reshape(shape2), mu.reshape(shape2), nu.reshape(shape2),
      p.reshape(shape2))
    return (mu_n.reshape(p.shape), nu_n.reshape(p.shape),
            p_n.reshape(p.shape))


def _adam_leaf_xla(g, mu, nu, p, s, lr, c1, c2, *, b1, b2, eps):
    gs = g.astype(jnp.float32) * s
    mu_n = b1 * mu + (1.0 - b1) * gs
    nu_n = b2 * nu + (1.0 - b2) * gs * gs
    p_n = p - lr * (mu_n / c1) / (jnp.sqrt(nu_n / c2) + eps)
    return mu_n, nu_n, p_n


def make_fused_adam(learning_rate: Union[float, Callable],
                    b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-8,
                    max_grad_norm: float = 1.0) -> FusedAdam:
    """Build the fused clip+Adam optimizer (see module docstring)."""

    def init(params):
        zeros = jax.tree.map(
            lambda x: jnp.zeros_like(x, dtype=jnp.float32), params)
        lr0 = learning_rate(0) if callable(learning_rate) else learning_rate
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=zeros,
            nu=jax.tree.map(jnp.copy, zeros),
            hyperparams={"learning_rate": jnp.asarray(lr0, jnp.float32)})

    def fused_apply(grads, state, params):
        use_pallas = os.environ.get("EVT_FUSED_OPT", "xla") == "pallas"
        gnorm = jnp.sqrt(sum(
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)))
        s = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-16))
        count = state.count + 1
        cf = count.astype(jnp.float32)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf
        if callable(learning_rate):
            # schedules are 0-indexed on the pre-update count, matching
            # optax.inject_hyperparams(adam)(learning_rate=schedule)
            lr = jnp.asarray(learning_rate(state.count), jnp.float32)
        else:
            lr = state.hyperparams["learning_rate"]

        scal = jnp.stack([s, lr, c1, c2]).reshape(1, 4)

        def leaf(g, mu, nu, p):
            if use_pallas and _pallas_leaf_shape(p) is not None:
                return _adam_leaf_pallas(g, mu, nu, p, scal,
                                         b1=b1, b2=b2, eps=eps)
            return _adam_leaf_xla(g, mu, nu, p, s, lr, c1, c2,
                                  b1=b1, b2=b2, eps=eps)

        out = jax.tree.map(leaf, grads, state.mu, state.nu, params)
        # out is a tree of (mu, nu, p) leaf-tuples; transpose to 3 trees
        treedef = jax.tree_util.tree_structure(params)
        mu_n, nu_n, p_n = jax.tree_util.tree_transpose(
            treedef, jax.tree_util.tree_structure((0, 0, 0)),
            out)
        new_state = FusedAdamState(count=count, mu=mu_n, nu=nu_n,
                                   hyperparams={"learning_rate": lr})
        return p_n, new_state, gnorm

    return FusedAdam(init=init, fused_apply=fused_apply)
