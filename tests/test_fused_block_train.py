"""Custom-VJP fused training block (models/fused_block_train.py) vs
jax.grad of the XLA block: forward values and ALL gradients must agree.

Interpret mode on CPU; TPU A/B timing in scripts/bench_train.py --fused.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig
from easy_vitpose_tpu.models.fused_block_train import make_fused_block_train
from easy_vitpose_tpu.models.vit import block, init_vit_params


@pytest.fixture(scope="module")
def setup():
    cfg = BackboneConfig(embed_dim=96, depth=2, num_heads=4)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    layer = jax.tree.map(lambda a: a[0], params["blocks"])
    x = jax.random.normal(jax.random.PRNGKey(1), (5, cfg.num_tokens, 96),
                          jnp.float32)
    dp = jnp.ones((5,), jnp.float32)
    return cfg, layer, x, dp


def _xla_loss(x, p, dp, cfg):
    out = block(x, p, cfg.num_heads, cfg.layer_norm_eps,
                drop_path_keep=dp[:, None, None])
    # non-trivial scalar so every output element has a distinct cotangent
    w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
    return jnp.sum(out * w)


def _fused_loss(x, p, dp, cfg, fused):
    out = fused(x, p, dp)
    w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
    return jnp.sum(out * w)


def test_forward_matches_xla(setup):
    cfg, layer, x, dp = setup
    fused = make_fused_block_train(cfg, interpret=True)
    a = np.asarray(block(x, layer, cfg.num_heads, cfg.layer_norm_eps,
                         drop_path_keep=dp[:, None, None]))
    b = np.asarray(fused(x, layer, dp))
    np.testing.assert_allclose(b, a, atol=2e-5)  # A&S erf envelope


@pytest.mark.parametrize("attn_mode,mlp_mode",
                         [("saved", "saved"), ("recompute", "recompute"),
                          ("saved", "recompute")])
def test_grads_match_xla(setup, attn_mode, mlp_mode, monkeypatch):
    monkeypatch.setenv("EVT_TRAIN_ATTN", attn_mode)
    monkeypatch.setenv("EVT_TRAIN_MLP", mlp_mode)
    cfg, layer, x, dp = setup
    fused = make_fused_block_train(cfg, interpret=True)
    gx_a, gp_a = jax.grad(_xla_loss, argnums=(0, 1))(x, layer, dp, cfg)
    gx_b, gp_b = jax.grad(_fused_loss, argnums=(0, 1))(x, layer, dp, cfg,
                                                       fused)
    sx = float(jnp.max(jnp.abs(gx_a))) + 1e-9
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_a),
                               atol=2e-4 * sx)
    flat_a = jax.tree_util.tree_leaves_with_path(gp_a)
    flat_b = jax.tree_util.tree_leaves(gp_b)
    for (path, ga), gb in zip(flat_a, flat_b):
        s = float(jnp.max(jnp.abs(ga))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), atol=3e-4 * s,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")


def test_grads_match_with_drop_path(setup):
    """Stochastic-depth masks (some crops dropped, 1/keep scaling) flow
    through both residual branches identically to the XLA block."""
    cfg, layer, x, _ = setup
    keep = jnp.asarray([0.0, 1.25, 1.25, 0.0, 1.25], jnp.float32)
    fused = make_fused_block_train(cfg, interpret=True)
    a = np.asarray(block(x, layer, cfg.num_heads, cfg.layer_norm_eps,
                         drop_path_keep=keep[:, None, None]))
    b = np.asarray(fused(x, layer, keep))
    np.testing.assert_allclose(b, a, atol=2e-5)
    gx_a, gp_a = jax.grad(_xla_loss, argnums=(0, 1))(x, layer, keep, cfg)
    gx_b, gp_b = jax.grad(_fused_loss, argnums=(0, 1))(x, layer, keep, cfg,
                                                       fused)
    sx = float(jnp.max(jnp.abs(gx_a))) + 1e-9
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_a),
                               atol=2e-4 * sx)
    for ga, gb in zip(jax.tree_util.tree_leaves(gp_a),
                      jax.tree_util.tree_leaves(gp_b)):
        s = float(jnp.max(jnp.abs(ga))) + 1e-9
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=3e-4 * s)


def test_odd_batch_padding(setup):
    """B=5 with G=2 exercises the pad-to-multiple path in fwd AND bwd;
    padded rows must not leak into gradients (dp=0 there)."""
    cfg, layer, x, dp = setup
    fused = make_fused_block_train(cfg, interpret=True)
    g3 = jax.grad(lambda xx: jnp.sum(fused(xx, layer, dp[:3]) ** 2))(x[:3])
    g5 = jax.grad(lambda xx: jnp.sum(fused(xx, layer, dp) ** 2))(x)
    # the first 3 crops' input-gradients are independent of the batch tail
    np.testing.assert_allclose(np.asarray(g5[:3]), np.asarray(g3),
                               atol=1e-5)


def test_full_train_step_fused_matches_xla():
    """One full optimizer step (loss, grads, Adam update) with the fused
    train block matches the XLA path at fp32."""
    from easy_vitpose_tpu.configs import HeadConfig, ModelConfig
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.train import step as trainlib

    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4,
                                drop_path_rate=0.2),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(4, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (4, 17, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.asarray(np.ones((4, 17, 1), np.float32)),
    }
    key = jax.random.PRNGKey(5)  # same drop-path draws on both paths

    sa = trainlib.init_train_state(params, tx)
    step_a = trainlib.make_train_step(cfg, tx, use_amp=False)
    sa, ma = step_a(sa, batch, key)

    sb = trainlib.init_train_state(params, tx)
    step_b = trainlib.make_train_step(cfg, tx, use_amp=False,
                                      block_impl="pallas_train_interpret")
    sb, mb = step_b(sb, batch, key)

    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-5
    assert abs(float(ma["grad_norm"]) - float(mb["grad_norm"])) \
        < 1e-3 * float(ma["grad_norm"])
    for a, b in zip(jax.tree_util.tree_leaves(sa["params"]),
                    jax.tree_util.tree_leaves(sb["params"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


@pytest.mark.parametrize("wide_mode,mlp_mode",
                         [("saved", "saved"), ("saved", "recompute"),
                          ("recompute", "recompute")])
def test_grads_match_wide_model_chunked(wide_mode, mlp_mode, monkeypatch):
    """D=1024 triggers the hidden-chunked MLP backward (nj=2): gradients
    must still match XLA exactly across the chunk boundary, in the
    saved-operand (default, with and without saved-m) and
    recompute-per-chunk flavors."""
    monkeypatch.setenv("EVT_TRAIN_WIDE", wide_mode)
    monkeypatch.setenv("EVT_TRAIN_MLP", mlp_mode)
    cfg = BackboneConfig(embed_dim=1024, depth=1, num_heads=8)
    params = init_vit_params(jax.random.PRNGKey(2), cfg)
    layer = jax.tree.map(lambda a: a[0], params["blocks"])
    x = jax.random.normal(jax.random.PRNGKey(3), (4, cfg.num_tokens, 1024),
                          jnp.float32) * 0.5
    dp = jnp.ones((4,), jnp.float32)
    fused = make_fused_block_train(cfg, interpret=True)
    gx_a, gp_a = jax.grad(_xla_loss, argnums=(0, 1))(x, layer, dp, cfg)
    gx_b, gp_b = jax.grad(_fused_loss, argnums=(0, 1))(x, layer, dp, cfg,
                                                       fused)
    sx = float(jnp.max(jnp.abs(gx_a))) + 1e-9
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_a),
                               atol=2e-4 * sx)
    flat_a = jax.tree_util.tree_leaves_with_path(gp_a)
    flat_b = jax.tree_util.tree_leaves(gp_b)
    for (path, ga), gb in zip(flat_a, flat_b):
        s = float(jnp.max(jnp.abs(ga))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(ga), atol=3e-4 * s,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")


def test_grads_match_large_batch_mlp_tile(setup):
    """B=16 activates the G=8 MLP-backward tile (per-kernel tiles, r3):
    gradients must match XLA across the different mlp/attn paddings."""
    cfg, layer, _, _ = setup
    x = jax.random.normal(jax.random.PRNGKey(9), (16, cfg.num_tokens, 96),
                          jnp.float32)
    dp = jnp.ones((16,), jnp.float32)
    fused = make_fused_block_train(cfg, interpret=True)
    gx_a, gp_a = jax.grad(_xla_loss, argnums=(0, 1))(x, layer, dp, cfg)
    gx_b, gp_b = jax.grad(_fused_loss, argnums=(0, 1))(x, layer, dp, cfg,
                                                       fused)
    sx = float(jnp.max(jnp.abs(gx_a))) + 1e-9
    np.testing.assert_allclose(np.asarray(gx_b), np.asarray(gx_a),
                               atol=2e-4 * sx)
    for ga, gb in zip(jax.tree_util.tree_leaves(gp_a),
                      jax.tree_util.tree_leaves(gp_b)):
        s = float(jnp.max(jnp.abs(ga))) + 1e-9
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=3e-4 * s)


@pytest.mark.parametrize(
    "D,heads,B,wide_mode,attn_mode,mlp_mode",
    [(96, 4, 5, "saved", "saved", "saved"),
     (96, 4, 16, "saved", "recompute", "recompute"),
     (1024, 8, 8, "saved", "saved", "saved"),
     (1024, 8, 8, "recompute", "recompute", "recompute")])
def test_tpu_interpret_pipelining(D, heads, B, wide_mode, attn_mode,
                                  mlp_mode, monkeypatch):
    """Run fwd+bwd under the TPU interpreter (pltpu.InterpretParams),
    which simulates real TPU output-block pipelining and raises
    'Revisited block ... of output' for accumulation across
    non-consecutive revisits — the failure mode plain interpret mode
    cannot see (it re-reads HBM every step).  D=1024 exercises the
    hidden-chunked two-kernel MLP backward (nj=2, 2 batch tiles);
    D=96 the narrow fused kernel.  skip_floating_point_ops makes this
    a pure pipelining-structure check (numerics are pinned by the
    plain-interpret tests above, and bit-equality of TPU-interpret vs
    plain interpret was verified for the wide path)."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setenv("EVT_TRAIN_WIDE", wide_mode)
    monkeypatch.setenv("EVT_TRAIN_ATTN", attn_mode)
    monkeypatch.setenv("EVT_TRAIN_MLP", mlp_mode)
    cfg = BackboneConfig(embed_dim=D, depth=1, num_heads=heads)
    params = init_vit_params(jax.random.PRNGKey(2), cfg)
    layer = jax.tree.map(lambda a: a[0], params["blocks"])
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 16, D), jnp.float32)
    dp = jnp.ones((B,), jnp.float32)
    fused = make_fused_block_train(
        cfg, interpret=pltpu.InterpretParams(skip_floating_point_ops=True))
    # any revisit violation raises inside the interpreter io_callback
    jax.grad(lambda xx, pp: jnp.sum(fused(xx, pp, dp)),
             argnums=(0, 1))(x, layer)


def test_fused_train_step_on_8dev_mesh():
    """The fused custom-VJP step composes with the GSPMD data-parallel
    wrapper: 8-device DP loss equals the single-device XLA step (whether
    XLA partitions or replicates the pallas calls, results must agree)."""
    from easy_vitpose_tpu.configs import HeadConfig, ModelConfig
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.parallel import mesh as meshlib
    from easy_vitpose_tpu.train import step as trainlib

    assert len(jax.devices()) == 8
    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    mesh = meshlib.make_mesh()
    step = trainlib.make_train_step(cfg, tx, use_amp=False,
                                    block_impl="pallas_train_interpret")
    jstep = trainlib.jit_data_parallel(step, mesh, donate_state=False)
    rng = np.random.default_rng(0)
    batch_np = {
        "images": rng.normal(size=(16, 256, 192, 3)).astype(np.float32),
        "targets": rng.uniform(0, 1, (16, 17, 64, 48)).astype(np.float32),
        "target_weights": np.ones((16, 17, 1), np.float32)}
    batch = meshlib.shard_batch(mesh, batch_np)
    state_r = meshlib.replicate(mesh, state)
    key = meshlib.replicate(mesh, jax.random.PRNGKey(1))
    _, metrics = jstep(state_r, batch, key)

    step1 = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=False))
    _, m1 = step1(state, {k: jnp.asarray(v) for k, v in batch_np.items()},
                  jax.random.PRNGKey(1))
    assert abs(float(metrics["loss"]) - float(m1["loss"])) < 1e-6
