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
  fallback for the small remainder.  EVT_FUSED_OPT selects: ``pallas``,
  ``xla``, or ``auto`` (the default: pallas for int8 moments on
  accelerator backends — where the XLA decode/encode overhead grows
  with parameter count — xla otherwise).

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

## Quantized moments (``moment_dtype``)

``make_fused_adam(..., moment_dtype="bf16" | "int8")`` stores the Adam
moments compressed — the large-model memory lever (no reference
counterpart; the reference trains f32 Adam only):

* ``bf16``: mu/nu cast to bfloat16 between steps (2x moment memory cut;
  update math still f32).
* ``int8``: blockwise 8-bit moments — per 2048-element block, an f32
  absmax scale plus a GEOMETRIC 256-level code (closed-form log encode /
  exp decode, no table search), the standard 8-bit-optimizer design
  re-derived for TPU: linear int8 would zero out small-magnitude moments
  (nu spans many orders of magnitude within a block), while a log-spaced
  code bounds the RELATIVE decode error at ~5.6% signed / ~2.8% unsigned.
  nu is stored in the sqrt domain (its dynamic range halves there and the
  update only ever consumes sqrt(nu)).  Moment memory drops 4x — at
  ViT-H (632M params) that is 5.1 GB -> 1.3 GB, the difference between
  fitting and not fitting larger batches on one 16 GB chip.  Optimizer
  HBM traffic drops ~43%/step; the log/exp VPU work eats most of that
  back, so this is a MEMORY feature, not a speed one.

The int8 path keeps the optimizer math f32 end-to-end between
quantize/dequantize and is gated by convergence tests
(tests/test_fused_opt.py) comparing loss trajectories against f32 Adam.
"""
from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def resolve_opt_flavor(moment_dtype: str,
                       env: str | None = None,
                       backend: str | None = None) -> str:
    """Resolve EVT_FUSED_OPT ('auto' default) to 'pallas' or 'xla'.

    'auto' picks the Pallas decode+Adam+encode kernel for int8 moments
    on accelerator backends — the XLA path's decode/encode HBM
    round-trips grow with parameter count (+17% step at ViT-B/86M,
    +27% at ViT-H/632M vs +3-4% kernel, PERF.md) — and XLA everywhere
    else (CPU can't lower Mosaic uninterpreted; f32/bf16 moments showed
    no kernel-vs-XLA gap on-device).
    """
    flavor = env if env is not None else os.environ.get(
        "EVT_FUSED_OPT", "auto")
    if flavor == "auto":
        backend = backend if backend is not None else jax.default_backend()
        flavor = ("pallas" if moment_dtype == "int8" and backend != "cpu"
                  else "xla")
    return flavor


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
    """Largest row tile <= ~0.5M elements that divides rows and is % 8.

    8 VMEM blocks (5 in + 3 out) double-buffered: 0.5M f32 x 16 = 32 MB,
    inside the 64 MB scoped limit (1M-element tiles measured 64.46M on
    a (12288, 256) leaf — over the line)."""
    target = max(8, (1 << 19) // cols)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=os.environ.get("EVT_FUSED_OPT_INTERPRET") == "1",
    )(scal, g.reshape(shape2), mu.reshape(shape2), nu.reshape(shape2),
      p.reshape(shape2))
    return (mu_n.reshape(p.shape), nu_n.reshape(p.shape),
            p_n.reshape(p.shape))


# ---------------------------------------------------------------------------
# Blockwise 8-bit moment codec (geometric map, closed-form encode/decode)

_Q8_BLOCK = 2048
_Q8_LN_EPS = float(np.log(1e-6))  # magnitudes below 1e-6*absmax code to 0


def _q8_encode(x, levels: int):
    """Flatten+pad to blocks, encode magnitudes on a geometric map.

    Returns (codes int8 flat-padded (nb*B,), scales f32 (nb, 1)).
    ``levels`` magnitude levels are log-spaced over [1e-6, 1] * absmax;
    level 0 is exact zero.  Signed when levels=127 (sign folded into the
    int8 code), unsigned when levels=255.
    """
    n = x.size
    nb = -(-n // _Q8_BLOCK)
    xf = jnp.pad(x.astype(jnp.float32).reshape(-1),
                 (0, nb * _Q8_BLOCK - n)).reshape(nb, _Q8_BLOCK)
    absx = jnp.abs(xf)
    scale = jnp.max(absx, axis=1, keepdims=True)
    safe = jnp.maximum(scale, 1e-30)
    r = absx / safe
    # idx 1..levels: ln(r) = _Q8_LN_EPS * (1 - (idx-1)/(levels-1))
    idx = 1.0 + jnp.round((1.0 - jnp.log(jnp.maximum(r, 1e-30))
                           / _Q8_LN_EPS) * (levels - 1))
    idx = jnp.clip(idx, 1.0, float(levels))
    idx = jnp.where(r < 1e-6, 0.0, idx)
    codes = (jnp.sign(xf) * idx) if levels == 127 else idx
    return codes.astype(jnp.int8 if levels == 127 else jnp.uint8
                        ).reshape(-1), scale


def _q8_decode(codes, scale, levels: int, shape):
    """Inverse of :func:`_q8_encode` -> f32 array of ``shape``."""
    cf = codes.astype(jnp.float32).reshape(-1, _Q8_BLOCK)
    mag = jnp.abs(cf)
    r = jnp.exp(_Q8_LN_EPS * (1.0 - (mag - 1.0) / (levels - 1)))
    x = jnp.where(mag < 0.5, 0.0, jnp.sign(cf) * r * scale)
    return x.reshape(-1)[: int(np.prod(shape))].reshape(shape)


def _q8_pallas_rows(x) -> int | None:
    """Quant-block row count if the leaf qualifies for the q8 Pallas kernel.

    The kernel views the leaf as (nb, 2048) f32 with one scale per row and
    tiles T=32 rows per program (int8 VMEM tiling wants sublanes % 32), so
    the leaf must be f32 with size % (32*2048) == 0 — true of every stacked
    block weight at ViT-S/B/L/H.
    """
    if x.dtype != jnp.float32 or x.size < (1 << 20):
        return None
    nb = x.size // _Q8_BLOCK
    if x.size % _Q8_BLOCK or nb % 32:
        return None
    return nb


def _adam_leaf_pallas_q8(g, mq, ms, nq, ns, p, scal, *, b1, b2, eps,
                         interpret=False):
    """One-pass decode + clip+Adam + re-encode on a single leaf.

    The XLA int8-moment path costs ~10 elementwise HBM round-trips over
    the f32 intermediates (measured +17% step time at ViT-B/64); here the
    whole update runs in VMEM: read (g, p) f32 + codes int8, write p' f32
    + codes int8 + scales — the true bandwidth floor (~16 B/param).
    Bitwise the same codec as :func:`_q8_encode` / :func:`_q8_decode`.

    ``scal`` is a (1, 4) f32 of (clip_scale, lr, 1-b1^t, 1-b2^t) in SMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = _q8_pallas_rows(p)
    T = 32
    shape2 = (nb, _Q8_BLOCK)

    def kern(scal_ref, g_ref, mq_ref, ms_ref, nq_ref, ns_ref, p_ref,
             mq_out, ms_out, nq_out, ns_out, p_out):
        s = scal_ref[0, 0]
        lr = scal_ref[0, 1]
        c1 = scal_ref[0, 2]
        c2 = scal_ref[0, 3]
        # decode moments (geometric map, see _q8_decode)
        mqf = mq_ref[:].astype(jnp.float32)
        mag = jnp.abs(mqf)
        mu = jnp.where(
            mag < 0.5, 0.0,
            jnp.sign(mqf)
            * jnp.exp(_Q8_LN_EPS * (1.0 - (mag - 1.0) / 126.0)) * ms_ref[:])
        # Mosaic has no uint8<->f32 casts: go through an int8 bitcast and
        # undo the wrap (codes 128..255 read as negatives)
        raw = jax.lax.bitcast_convert_type(nq_ref[:], jnp.int8
                                           ).astype(jnp.float32)
        nqf = jnp.where(raw < 0, raw + 256.0, raw)
        vs = jnp.where(
            nqf < 0.5, 0.0,
            jnp.exp(_Q8_LN_EPS * (1.0 - (nqf - 1.0) / 254.0)) * ns_ref[:])
        gs = g_ref[:] * s
        mu_n = b1 * mu + (1.0 - b1) * gs
        nu_n = b2 * (vs * vs) + (1.0 - b2) * gs * gs
        p_out[:] = p_ref[:] - lr * (mu_n / c1) / (jnp.sqrt(nu_n / c2) + eps)
        # re-encode (see _q8_encode)
        am = jnp.max(jnp.abs(mu_n), axis=1, keepdims=True)
        ms_out[:] = am
        r = jnp.abs(mu_n) / jnp.maximum(am, 1e-30)
        idx = jnp.clip(1.0 + jnp.round(
            (1.0 - jnp.log(jnp.maximum(r, 1e-30)) / _Q8_LN_EPS) * 126.0),
            1.0, 127.0)
        idx = jnp.where(r < 1e-6, 0.0, idx)
        mq_out[:] = (jnp.sign(mu_n) * idx).astype(jnp.int8)
        vs_n = jnp.sqrt(nu_n)
        an = jnp.max(vs_n, axis=1, keepdims=True)
        ns_out[:] = an
        rn = vs_n / jnp.maximum(an, 1e-30)
        idxn = jnp.clip(1.0 + jnp.round(
            (1.0 - jnp.log(jnp.maximum(rn, 1e-30)) / _Q8_LN_EPS) * 254.0),
            1.0, 255.0)
        idxn = jnp.where(rn < 1e-6, 0.0, idxn)
        wrapped = jnp.where(idxn > 127.5, idxn - 256.0, idxn)
        nq_out[:] = jax.lax.bitcast_convert_type(
            wrapped.astype(jnp.int8), jnp.uint8)

    fblk = pl.BlockSpec((T, _Q8_BLOCK), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct(shape2, jnp.int8),     # mu codes
        jax.ShapeDtypeStruct((nb, 1), jnp.float32),  # mu scales
        jax.ShapeDtypeStruct(shape2, jnp.uint8),    # nu codes
        jax.ShapeDtypeStruct((nb, 1), jnp.float32),  # nu scales
        jax.ShapeDtypeStruct(shape2, jnp.float32),  # params
    )
    mq_n, ms_n, nq_n, ns_n, p_n = pl.pallas_call(
        kern,
        grid=(nb // T,),
        in_specs=[scal_spec, fblk, fblk, sblk, fblk, sblk, fblk],
        out_specs=(fblk, sblk, fblk, sblk, fblk),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal, g.astype(jnp.float32).reshape(shape2), mq.reshape(shape2), ms,
      nq.reshape(shape2), ns, p.reshape(shape2))
    return (mq_n.reshape(-1), ms_n, nq_n.reshape(-1), ns_n,
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
                    max_grad_norm: float = 1.0,
                    moment_dtype: str = "f32") -> FusedAdam:
    """Build the fused clip+Adam optimizer (see module docstring).

    ``moment_dtype``: 'f32' (exact optax math), 'bf16' (half moment
    memory), or 'int8' (blockwise 8-bit moments, 4x memory cut —
    large-model single-chip training)."""
    assert moment_dtype in ("f32", "bf16", "int8"), moment_dtype

    def _zeros_like_moments(params):
        if moment_dtype == "bf16":
            return jax.tree.map(
                lambda x: jnp.zeros(x.shape, jnp.bfloat16), params)
        if moment_dtype == "int8":
            def z(x, dt):
                nb = -(-x.size // _Q8_BLOCK)
                return {"q": jnp.zeros((nb * _Q8_BLOCK,), dt),
                        "s": jnp.zeros((nb, 1), jnp.float32)}
            return {"q_tree": jax.tree.map(lambda x: z(x, jnp.int8)["q"],
                                           params),
                    "s_tree": jax.tree.map(lambda x: z(x, jnp.int8)["s"],
                                           params)}
        return jax.tree.map(
            lambda x: jnp.zeros_like(x, dtype=jnp.float32), params)

    def init(params):
        lr0 = learning_rate(0) if callable(learning_rate) else learning_rate
        mk = _zeros_like_moments
        mu = mk(params)
        nu = jax.tree.map(jnp.copy, mk(params)) if moment_dtype != "int8" \
            else mk(params)
        if moment_dtype == "int8":
            # nu codes are unsigned
            nu = {"q_tree": jax.tree.map(
                      lambda q: q.astype(jnp.uint8), nu["q_tree"]),
                  "s_tree": nu["s_tree"]}
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=mu,
            nu=nu,
            hyperparams={"learning_rate": jnp.asarray(lr0, jnp.float32)})

    def fused_apply(grads, state, params, gnorm=None):
        """``gnorm``: optionally a PRECOMPUTED global gradient norm (the
        in-backward norm from train/fast_step.py) — skips the trailing
        full-gradient reduce that otherwise serializes after the
        backward.  Must equal sqrt(sum of squares of every grad leaf)."""
        use_pallas = resolve_opt_flavor(moment_dtype) == "pallas"
        if gnorm is None:
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
        treedef = jax.tree_util.tree_structure(params)

        if moment_dtype == "int8":
            interp = os.environ.get("EVT_FUSED_OPT_INTERPRET") == "1"

            def leaf8(g, mq, ms, nq, ns, p):
                if use_pallas and _q8_pallas_rows(p) is not None:
                    return _adam_leaf_pallas_q8(
                        g, mq, ms, nq, ns, p, scal,
                        b1=b1, b2=b2, eps=eps, interpret=interp)
                mu = _q8_decode(mq, ms, 127, p.shape)
                nu_sqrt = _q8_decode(nq, ns, 255, p.shape)
                mu_n, nu_n, p_n = _adam_leaf_xla(
                    g, mu, jnp.square(nu_sqrt), p, s, lr, c1, c2,
                    b1=b1, b2=b2, eps=eps)
                mq_n, ms_n = _q8_encode(mu_n, 127)
                nq_n, ns_n = _q8_encode(jnp.sqrt(nu_n), 255)
                return mq_n, ms_n, nq_n, ns_n, p_n

            out = jax.tree.map(leaf8, grads,
                               state.mu["q_tree"], state.mu["s_tree"],
                               state.nu["q_tree"], state.nu["s_tree"],
                               params)
            mq, ms, nq, ns, p_n = jax.tree_util.tree_transpose(
                treedef, jax.tree_util.tree_structure((0, 0, 0, 0, 0)), out)
            new_state = FusedAdamState(
                count=count,
                mu={"q_tree": mq, "s_tree": ms},
                nu={"q_tree": nq, "s_tree": ns},
                hyperparams={"learning_rate": lr})
            return p_n, new_state, gnorm

        def leaf(g, mu, nu, p):
            if moment_dtype == "bf16":
                mu_n, nu_n, p_n = _adam_leaf_xla(
                    g, mu.astype(jnp.float32), nu.astype(jnp.float32), p,
                    s, lr, c1, c2, b1=b1, b2=b2, eps=eps)
                return (mu_n.astype(jnp.bfloat16),
                        nu_n.astype(jnp.bfloat16), p_n)
            if use_pallas and _pallas_leaf_shape(p) is not None:
                return _adam_leaf_pallas(g, mu, nu, p, scal,
                                         b1=b1, b2=b2, eps=eps)
            return _adam_leaf_xla(g, mu, nu, p, s, lr, c1, c2,
                                  b1=b1, b2=b2, eps=eps)

        out = jax.tree.map(leaf, grads, state.mu, state.nu, params)
        # out is a tree of (mu, nu, p) leaf-tuples; transpose to 3 trees
        mu_n, nu_n, p_n = jax.tree_util.tree_transpose(
            treedef, jax.tree_util.tree_structure((0, 0, 0)),
            out)
        new_state = FusedAdamState(count=count, mu=mu_n, nu=nu_n,
                                   hyperparams={"learning_rate": lr})
        return p_n, new_state, gnorm

    return FusedAdam(init=init, fused_apply=fused_apply)
