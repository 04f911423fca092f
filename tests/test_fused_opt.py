"""Fused clip+Adam (train/fused_opt.py) vs the optax chain it replaces:
trajectories must match to float noise, in both the XLA and the
Pallas-kernel flavors, including the clip-active regime and LR schedules.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from easy_vitpose_tpu.train.fused_opt import make_fused_adam
from easy_vitpose_tpu.train.step import (apply_optimizer, get_learning_rate,
                                         make_optimizer,
                                         make_step_lr_schedule,
                                         set_learning_rate)


def _params(key, big=False):
    k1, k2, k3 = jax.random.split(key, 3)
    # 'big' leaf qualifies for the Pallas kernel (>=1M elems, aligned)
    w_shape = (8, 1024, 128) if big else (8, 16, 128)
    return {
        "w": jax.random.normal(k1, w_shape, jnp.float32),
        "b": jax.random.normal(k2, (37,), jnp.float32),
        "nested": {"v": jax.random.normal(k3, (5, 3), jnp.float32)},
    }


def _grads(params, step):
    return jax.tree.map(
        lambda p: jnp.cos(p * (step + 1)) * 0.1 * (step + 1), params)


@pytest.mark.parametrize("gscale", [1.0, 50.0])  # clip inactive / active
def test_matches_optax_chain(gscale):
    params_a = _params(jax.random.PRNGKey(0))
    params_b = jax.tree.map(jnp.copy, params_a)
    tx_a = make_optimizer(3e-3)            # clip(1.0) + adam
    tx_b = make_fused_adam(3e-3)
    sa = tx_a.init(params_a)
    sb = tx_b.init(params_b)
    for step in range(4):
        g = jax.tree.map(lambda x: x * gscale, _grads(params_a, step))
        params_a, sa, gn_a = apply_optimizer(tx_a, g, sa, params_a)
        params_b, sb, gn_b = apply_optimizer(tx_b, g, sb, params_b)
        np.testing.assert_allclose(float(gn_a), float(gn_b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)


def test_pallas_flavor_matches_xla(monkeypatch):
    params = _params(jax.random.PRNGKey(1), big=True)
    tx = make_fused_adam(1e-3)
    g = _grads(params, 0)

    sa = tx.init(params)
    pa, sa, _ = apply_optimizer(tx, g, sa, params)

    monkeypatch.setenv("EVT_FUSED_OPT", "pallas")
    monkeypatch.setenv("EVT_FUSED_OPT_INTERPRET", "1")
    sb = tx.init(params)
    pb, sb, _ = apply_optimizer(tx, g, sb, params)

    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path((pa, sa.mu, sa.nu)),
            jax.tree_util.tree_leaves((pb, sb.mu, sb.nu))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"pallas/xla mismatch at {jax.tree_util.keystr(path)}")


def test_schedule_and_lr_plumbing():
    # schedule flavor matches the optax inject_hyperparams(adam) trace
    sched = make_step_lr_schedule(base_lr=1e-2, steps_per_epoch=2,
                                  milestones=(1, 2), warmup_iters=3,
                                  warmup_ratio=0.1)
    params_a = _params(jax.random.PRNGKey(2))
    params_b = jax.tree.map(jnp.copy, params_a)
    tx_a = optax.chain(optax.clip_by_global_norm(1.0),
                       optax.inject_hyperparams(optax.adam)(
                           learning_rate=sched))
    tx_b = make_fused_adam(sched)
    sa = tx_a.init(params_a)
    sb = tx_b.init(params_b)
    for step in range(6):
        g = _grads(params_a, step)
        u, sa = tx_a.update(g, sa, params_a)
        params_a = optax.apply_updates(params_a, u)
        params_b, sb, _ = apply_optimizer(tx_b, g, sb, params_b)
        # realized LR visible to the loop's logger
        np.testing.assert_allclose(get_learning_rate(sa),
                                   get_learning_rate(sb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-7)


def test_plateau_controller_compat():
    # the loop's ReduceLROnPlateau override must keep working
    params = _params(jax.random.PRNGKey(3))
    tx = make_fused_adam(1e-3)
    s = tx.init(params)
    assert abs(get_learning_rate(s) - 1e-3) < 1e-9
    s = set_learning_rate(s, 5e-4)
    params, s, _ = apply_optimizer(tx, _grads(params, 0), s, params)
    assert abs(get_learning_rate(s) - 5e-4) < 1e-9


def test_orbax_exact_resume_roundtrip(tmp_path):
    """FusedAdamState (namedtuple + hyperparams dict) survives the orbax
    full-train-state save/restore used by elastic resume."""
    from easy_vitpose_tpu.train.orbax_ckpt import (restore_train_state,
                                                   save_train_state)

    params = _params(jax.random.PRNGKey(4))
    tx = make_fused_adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params),
             "bn_state": {}, "step": jnp.asarray(3, jnp.int32)}
    p1, s1, _ = apply_optimizer(tx, _grads(params, 0), state["opt_state"],
                                params)
    state = {"params": p1, "opt_state": s1, "bn_state": {},
             "step": jnp.asarray(4, jnp.int32)}
    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    template = {"params": params, "opt_state": tx.init(params),
                "bn_state": {}, "step": jnp.asarray(0, jnp.int32)}
    restored = restore_train_state(path, template=template)
    assert int(restored["step"]) == 4
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state keeps working
    p2, s2, _ = apply_optimizer(tx, _grads(p1, 1), restored["opt_state"],
                                restored["params"])
    assert int(s2.count) == 2


def test_sharded_train_step_with_fused_opt():
    """FusedAdam composes with the shard_map data-parallel step (the
    loop's default for --fused-block on multi-device): 8-device loss and
    params match the single-device step."""
    from easy_vitpose_tpu.configs import (BackboneConfig, HeadConfig,
                                          ModelConfig)
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.parallel import mesh as meshlib
    from easy_vitpose_tpu.train.step import (init_train_state,
                                             make_train_step,
                                             make_train_step_sharded)

    assert len(jax.devices()) == 8
    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = make_fused_adam(1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (8, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (8, 17, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.ones((8, 17, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    mesh = meshlib.make_mesh()
    state = init_train_state(params, tx)
    state = meshlib.replicate(mesh, state)
    sharded = make_train_step_sharded(
        cfg, tx, mesh, use_amp=False, block_impl="pallas_train_interpret",
        donate_state=False)
    s_a, m_a = sharded(state, batch, key)

    state_b = init_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, tx, use_amp=False,
                                   block_impl="pallas_train_interpret"))
    s_b, m_b = step(state_b, batch, key)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    # pmean-of-shard-means vs full-batch mean reduction order drifts a
    # few ulps in the grads; Adam's rsqrt at t=1 amplifies that — updates
    # are ~lr=1e-3, so 1e-5 is still 100x below corruption scale
    for a, b in zip(jax.tree_util.tree_leaves(s_a["params"]),
                    jax.tree_util.tree_leaves(s_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_q8_codec_roundtrip_bounds():
    """Blockwise geometric 8-bit codec: zeros exact, relative decode error
    within the design bounds (~5.6% signed / ~2.8% unsigned), odd sizes
    (padding) handled."""
    from easy_vitpose_tpu.train.fused_opt import _q8_decode, _q8_encode
    rng = np.random.default_rng(0)
    for shape in [(2048,), (3000,), (7, 311)]:
        x = rng.normal(size=shape).astype(np.float32)
        x.ravel()[:5] = 0.0
        q, s = _q8_encode(jnp.asarray(x), 127)
        assert q.dtype == jnp.int8
        y = np.asarray(_q8_decode(q, s, 127, shape))
        np.testing.assert_array_equal(y.ravel()[:5], 0.0)
        nz = np.abs(x) > 1e-5 * np.abs(x).max()
        rel = np.abs(y[nz] - x[nz]) / np.abs(x[nz])
        assert rel.max() < 0.062, rel.max()

        u = np.abs(rng.normal(size=shape)).astype(np.float32) ** 4
        q, s = _q8_encode(jnp.asarray(u), 255)
        assert q.dtype == jnp.uint8
        yu = np.asarray(_q8_decode(q, s, 255, shape))
        nz = u > 1e-5 * u.max()
        rel = np.abs(yu[nz] - u[nz]) / u[nz]
        assert rel.max() < 0.031, rel.max()


@pytest.mark.parametrize("moments", ["bf16", "int8"])
def test_quantized_moments_converge(moments):
    """8-bit/bf16-moment Adam must track f32 Adam on a least-squares
    problem: same optimizer trajectory family, comparable final loss."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    w_true = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    y = A @ w_true  # consistent system: the optimum is loss 0
    w0 = jnp.zeros((32,), jnp.float32)

    def loss_fn(w):
        return jnp.mean(jnp.square(A @ w - y))

    def run(tx):
        w = {"w": w0}
        s = tx.init(w)
        for _ in range(300):
            g = jax.grad(lambda p: loss_fn(p["w"]))(w)
            w, s, _ = apply_optimizer(tx, g, s, w)
        return float(loss_fn(w["w"]))

    l0 = float(loss_fn(w0))
    lf32 = run(make_fused_adam(3e-2))
    lq = run(make_fused_adam(3e-2, moment_dtype=moments))
    assert lf32 < 0.25 * l0
    # quantization noise must not break optimization: within 25% of the
    # f32 trajectory's achieved loss reduction
    assert (l0 - lq) > 0.75 * (l0 - lf32), (l0, lf32, lq)


def test_int8_state_is_actually_8bit():
    params = _params(jax.random.PRNGKey(5), big=True)
    tx = make_fused_adam(1e-3, moment_dtype="int8")
    s = tx.init(params)
    p1, s1, _ = apply_optimizer(tx, _grads(params, 0), s, params)
    n_param_bytes = sum(x.size * 4 for x in jax.tree_util.tree_leaves(params))
    mom_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves((s1.mu, s1.nu)))
    # 2 moment trees at ~1 byte/param (+ f32 block scales + padding)
    assert mom_bytes < 0.30 * (2 * n_param_bytes), (mom_bytes, n_param_bytes)
    for q in jax.tree_util.tree_leaves(s1.mu["q_tree"]):
        assert q.dtype == jnp.int8
    for q in jax.tree_util.tree_leaves(s1.nu["q_tree"]):
        assert q.dtype == jnp.uint8
    # params actually moved
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(params)))
    assert moved


def test_int8_pallas_kernel_matches_xla(monkeypatch):
    """Fused q8-Adam Pallas kernel (decode+Adam+encode in one VMEM pass)
    vs the XLA int8-moment path: identical codes/scales/params after two
    steps on a mixed tree (big leaf -> kernel, small leaves -> XLA
    fallback)."""
    params = _params(jax.random.PRNGKey(7), big=True)
    tx = make_fused_adam(1e-3, moment_dtype="int8")

    def run():
        w = jax.tree.map(jnp.copy, params)
        s = tx.init(w)
        for step in range(2):
            w, s, _ = apply_optimizer(tx, _grads(w, step), s, w)
        return w, s

    pa, sa = run()
    monkeypatch.setenv("EVT_FUSED_OPT", "pallas")
    monkeypatch.setenv("EVT_FUSED_OPT_INTERPRET", "1")
    pb, sb = run()

    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path((pa, sa.mu, sa.nu)),
            jax.tree_util.tree_leaves((pb, sb.mu, sb.nu))):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype in (np.int8, np.uint8):
            # codes: allow +-1 on exact rounding boundaries (log/exp
            # ulp differences between the lowered paths)
            diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert diff.max() <= 1, \
                f"code mismatch at {jax.tree_util.keystr(path)}"
            assert (diff != 0).mean() < 1e-3
        else:
            np.testing.assert_allclose(
                a, b, rtol=5e-5, atol=1e-7,
                err_msg=f"mismatch at {jax.tree_util.keystr(path)}")


def test_int8_orbax_roundtrip(tmp_path):
    from easy_vitpose_tpu.train.orbax_ckpt import (restore_train_state,
                                                   save_train_state)
    params = _params(jax.random.PRNGKey(6))
    tx = make_fused_adam(1e-3, moment_dtype="int8")
    p1, s1, _ = apply_optimizer(tx, _grads(params, 0), tx.init(params),
                                params)
    state = {"params": p1, "opt_state": s1, "bn_state": {},
             "step": jnp.asarray(1, jnp.int32)}
    path = str(tmp_path / "ckpt8")
    save_train_state(path, state)
    template = {"params": params, "opt_state": tx.init(params),
                "bn_state": {}, "step": jnp.asarray(0, jnp.int32)}
    restored = restore_train_state(path, template=template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_train_step_with_fused_opt():
    """The train step composes with FusedAdam end-to-end (tiny model)."""
    from easy_vitpose_tpu.configs import (BackboneConfig, HeadConfig,
                                          ModelConfig)
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.train.step import init_train_state, make_train_step

    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)

    tx_a = make_optimizer(1e-3)
    tx_b = make_fused_adam(1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 1, (2, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (2, 17, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.ones((2, 17, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    outs = []
    for tx in (tx_a, tx_b):
        state = init_train_state(params, tx)
        step = jax.jit(make_train_step(cfg, tx, use_amp=False))
        for i in range(2):
            state, m = step(state, batch, key)
        outs.append((state["params"], float(m["loss"]),
                     float(m["grad_norm"])))
    (pa, la, ga), (pb, lb, gb) = outs
    assert abs(la - lb) < 1e-6 and abs(ga - gb) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        # clip-scale rounding differs (min(1, max/g) vs optax's where/
        # divide) -> few-ulp drift after two steps
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-6)


def test_resolve_opt_flavor_auto_rules(monkeypatch):
    """'auto' = Pallas q8 kernel on accelerators only (PERF.md: the XLA
    decode/encode overhead grows with parameter count, +17% ViT-B ->
    +27% ViT-H, vs +3-4% kernel); explicit env always wins."""
    from easy_vitpose_tpu.train.fused_opt import resolve_opt_flavor

    # auto: int8 moments -> kernel on accelerators, XLA on CPU
    assert resolve_opt_flavor("int8", env="auto", backend="tpu") == "pallas"
    assert resolve_opt_flavor("int8", env="auto", backend="cpu") == "xla"
    # auto: f32/bf16 moments stay XLA everywhere (no measured gap)
    assert resolve_opt_flavor("f32", env="auto", backend="tpu") == "xla"
    assert resolve_opt_flavor("bf16", env="auto", backend="tpu") == "xla"
    # explicit override beats auto in both directions
    assert resolve_opt_flavor("int8", env="xla", backend="tpu") == "xla"
    assert resolve_opt_flavor("f32", env="pallas", backend="tpu") == "pallas"
    # default env comes from EVT_FUSED_OPT / 'auto'; backend from the
    # live default backend (CPU under the test harness)
    monkeypatch.delenv("EVT_FUSED_OPT", raising=False)
    assert resolve_opt_flavor("int8") == "xla"
