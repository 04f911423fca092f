"""Data-parallel training tests on the 8-virtual-device CPU mesh — the
multi-chip path exercised without hardware (SURVEY.md §4 strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.parallel import mesh as meshlib
from easy_vitpose_tpu.train import step as trainlib
from easy_vitpose_tpu.train.losses import joints_mse_loss
from tests.test_model_parity import CASES


def make_batch(rng, b, k=17):
    return {
        "images": rng.normal(size=(b, 256, 192, 3)).astype(np.float32),
        "targets": rng.uniform(0, 1, size=(b, k, 64, 48)).astype(np.float32),
        "target_weights": np.ones((b, k, 1), np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = CASES["tiny"]
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    return cfg, tx, state


def test_joints_mse_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p = rng.normal(size=(2, 5, 8, 6)).astype(np.float32)
    t = rng.normal(size=(2, 5, 8, 6)).astype(np.float32)
    w = rng.uniform(0, 1, size=(2, 5, 1)).astype(np.float32)
    # direct transliteration of the torch formula for verification
    crit = torch.nn.MSELoss()
    loss_ref = 0.0
    tp, tt, tw_ = map(torch.from_numpy, (p, t, w))
    for j in range(5):
        loss_ref += crit(tp[:, j].reshape(2, -1) * tw_[:, j],
                         tt[:, j].reshape(2, -1) * tw_[:, j])
    loss_ref = (loss_ref / 5).item()
    got = float(joints_mse_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    assert abs(got - loss_ref) < 1e-6


def test_train_step_runs_on_8dev_mesh(setup):
    cfg, tx, state = setup
    assert len(jax.devices()) == 8
    mesh = meshlib.make_mesh()
    step = trainlib.make_train_step(cfg, tx, use_amp=True)
    jstep = trainlib.jit_data_parallel(step, mesh, donate_state=False)
    rng = np.random.default_rng(0)
    batch = meshlib.shard_batch(mesh, make_batch(rng, 16))
    state_r = meshlib.replicate(mesh, state)
    key = meshlib.replicate(mesh, jax.random.PRNGKey(1))
    new_state, metrics = jstep(state_r, batch, key)
    loss0 = float(metrics["loss"])
    assert np.isfinite(loss0) and float(metrics["grad_norm"]) > 0
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state_r["params"], new_state["params"])
    assert max(jax.tree.leaves(d)) > 0
    # second step decreases loss on the same batch (sanity)
    s2, m2 = jstep(new_state, batch, key)
    assert float(m2["loss"]) < loss0
    assert int(s2["step"]) == 2


def test_sharded_matches_single_device(setup):
    """DP over 8 devices computes the same update as 1 device (f32, no amp)."""
    cfg, _, _ = setup
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    step = trainlib.make_train_step(cfg, tx, use_amp=False)
    rng = np.random.default_rng(1)
    batch = make_batch(rng, 16)
    key = jax.random.PRNGKey(2)

    s1, m1 = jax.jit(step)(state, jax.tree.map(jnp.asarray, batch), key)

    mesh = meshlib.make_mesh()
    jstep = trainlib.jit_data_parallel(step, mesh, donate_state=False)
    s8, m8 = jstep(meshlib.replicate(mesh, state),
                   meshlib.shard_batch(mesh, batch),
                   meshlib.replicate(mesh, key))
    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s1["params"], s8["params"])
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_freeze_backbone(setup):
    cfg, _, _ = setup
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3, freeze_backbone=True)
    state = trainlib.init_train_state(params, tx)
    step = trainlib.make_train_step(cfg, tx, use_amp=False)
    rng = np.random.default_rng(0)
    batch = jax.tree.map(jnp.asarray, make_batch(rng, 4))
    new_state, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    bb_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state["params"]["backbone"],
                           new_state["params"]["backbone"])
    assert max(jax.tree.leaves(bb_diff)) == 0.0
    hd_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                           state["params"]["head"],
                           new_state["params"]["head"])
    assert max(jax.tree.leaves(hd_diff)) > 0


def test_set_learning_rate(setup):
    cfg, tx, state = setup
    new_opt = trainlib.set_learning_rate(state["opt_state"], 1e-5)
    found = []

    def visit(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            found.append(float(s.hyperparams["learning_rate"]))
        return s
    jax.tree.map(visit, new_opt, is_leaf=lambda s: hasattr(s, "hyperparams"))
    assert found and all(abs(v - 1e-5) < 1e-12 for v in found)


def test_amp_train_step_with_drop_path():
    """Regression: bf16-AMP training with stochastic depth (the default
    B/L/H recipes set drop_path_rate>0) must keep the scan carry bf16 —
    the f32 drop-path mask used to promote the residual stream to f32 and
    crash the lax.scan with a carry-dtype mismatch."""
    from dataclasses import replace
    cfg0 = CASES["tiny"]
    cfg = replace(cfg0, backbone=replace(cfg0.backbone, drop_path_rate=0.3))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    step = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=True))
    rng = np.random.default_rng(3)
    new_state, metrics = step(state, make_batch(rng, 4), jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state["step"]) == 1


def test_ema_recursion_exact(setup):
    """ema_decay maintains e' = d*e + (1-d)*p' exactly, starting from the
    initial params; the non-EMA trajectory is untouched."""
    cfg, tx, _ = setup
    params = init_vitpose_params(jax.random.PRNGKey(3), cfg)
    d = 0.75
    state = trainlib.init_train_state(params, tx, ema_decay=d)
    step = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=False,
                                            ema_decay=d))
    plain = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=False))
    state_p = trainlib.init_train_state(params, tx)

    rng = np.random.default_rng(5)
    key = jax.random.PRNGKey(0)
    ema_ref = jax.tree.map(np.asarray, state["params"])
    for i in range(3):
        batch = make_batch(rng, 8)
        state, _ = step(state, batch, key)
        state_p, _ = plain(state_p, batch, key)
        ema_ref = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            ema_ref, state["params"])
        # EMA matches the host-side recursion over the realized params
        for (path, a), b in zip(
                jax.tree_util.tree_leaves_with_path(ema_ref),
                jax.tree.leaves(state["ema_params"])):
            np.testing.assert_allclose(
                a, np.asarray(b), rtol=2e-6, atol=1e-7,
                err_msg=f"step {i} {jax.tree_util.keystr(path)}")
        # params trajectory identical with and without EMA
        for a, b in zip(jax.tree.leaves(state["params"]),
                        jax.tree.leaves(state_p["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_sharded_step_matches_single(setup):
    """The shard_map train step's EMA equals the single-device one."""
    cfg, tx, _ = setup
    params = init_vitpose_params(jax.random.PRNGKey(4), cfg)
    d = 0.9
    mesh = meshlib.make_mesh()
    state_a = trainlib.init_train_state(params, tx, ema_decay=d)
    state_b = trainlib.init_train_state(params, tx, ema_decay=d)
    sharded = trainlib.make_train_step_sharded(
        cfg, tx, mesh, use_amp=False, block_impl="xla",
        donate_state=False, ema_decay=d)
    single = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=False,
                                              ema_decay=d))
    rng = np.random.default_rng(6)
    batch = make_batch(rng, 8)
    key = jax.random.PRNGKey(1)
    state_a, _ = sharded(state_a, meshlib.shard_batch(mesh, batch), key)
    state_b, _ = single(state_b, batch, key)
    for a, b in zip(jax.tree.leaves(state_a["ema_params"]),
                    jax.tree.leaves(state_b["ema_params"])):
        # pmean reduction order vs the single-device sum: float noise only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
