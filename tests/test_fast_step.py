"""In-backward-norm manual-VJP train step (train/fast_step.py) must be
numerically identical to make_train_step(block_impl='pallas_train'):
same kernels, same bf16 cast points, same drop-path draws — the only
difference is WHERE the global grad-norm is reduced."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.train.fast_step import make_train_step_inbwd
from easy_vitpose_tpu.train.fused_opt import make_fused_adam
from easy_vitpose_tpu.train.step import init_train_state, make_train_step

pytestmark = pytest.mark.core


def _setup(drop_path=0.2, ema=0.0):
    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4,
                                drop_path_rate=drop_path),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = make_fused_adam(1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(4, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (4, 17, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.asarray(np.ones((4, 17, 1), np.float32)),
    }
    return cfg, params, tx, batch


@pytest.mark.parametrize("drop_path", [0.0, 0.2])
def test_inbwd_step_matches_custom_vjp_step(drop_path):
    cfg, params, tx, batch = _setup(drop_path)
    key = jax.random.PRNGKey(5)

    ref_step = make_train_step(cfg, tx, use_amp=True,
                               block_impl="pallas_train_interpret")
    fast_step = make_train_step_inbwd(cfg, tx, interpret=True)

    s_ref = init_train_state(params, tx)
    s_fast = init_train_state(params, tx)
    for i in range(2):
        k = jax.random.fold_in(key, i)
        s_ref, m_ref = ref_step(s_ref, batch, k)
        s_fast, m_fast = fast_step(s_fast, batch, k)
        np.testing.assert_allclose(float(m_fast["loss"]),
                                   float(m_ref["loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_fast["grad_norm"]),
                                   float(m_ref["grad_norm"]), rtol=1e-5)

    for a, b in zip(jax.tree.leaves(s_fast["params"]),
                    jax.tree.leaves(s_ref["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)
    for a, b in zip(jax.tree.leaves(s_fast["bn_state"]),
                    jax.tree.leaves(s_ref["bn_state"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(s_fast["step"]) == int(s_ref["step"]) == 2


def test_inbwd_grads_match_jax_grad():
    """The verdict pin: manual-backward gradients vs jax.grad at 1e-4.

    Runs ONE step on both paths from the same state with a CLEAN Adam
    state (count 0), so new_params - params is a pure function of the
    gradients; also cross-checks grad_norm directly."""
    cfg, params, tx, batch = _setup(drop_path=0.0)
    key = jax.random.PRNGKey(7)

    ref_step = make_train_step(cfg, tx, use_amp=True,
                               block_impl="pallas_train_interpret")
    fast_step = make_train_step_inbwd(cfg, tx, interpret=True)
    s0 = init_train_state(params, tx)
    s_ref, m_ref = ref_step(s0, batch, key)
    s_fast, m_fast = fast_step(init_train_state(params, tx), batch, key)

    # at count 1, update = lr * sign-ish(mu/sqrt(nu)) => comparing the
    # updates compares the (clipped) gradients leaf by leaf
    for (pa, pb, p0) in zip(jax.tree.leaves(s_fast["params"]),
                            jax.tree.leaves(s_ref["params"]),
                            jax.tree.leaves(s0["params"])):
        ua = np.asarray(pa) - np.asarray(p0)
        ub = np.asarray(pb) - np.asarray(p0)
        assert np.abs(ua - ub).max() <= 1e-4 * max(np.abs(ub).max(), 1e-3)
    np.testing.assert_allclose(float(m_fast["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-4)


def test_fused_apply_precomputed_gnorm_identity():
    """fused_apply(gnorm=precomputed) == fused_apply() when the
    precomputed value is the true global norm."""
    tx = make_fused_adam(1e-3)
    rng = np.random.default_rng(3)
    params = {"a": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32))
        * 3.0, params)  # *3 so the clip actually engages
    st = tx.init(params)
    gn = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                      for g in jax.tree.leaves(grads)))
    p1, st1, n1 = tx.fused_apply(grads, st, params)
    p2, st2, n2 = tx.fused_apply(grads, st, params, gnorm=gn)
    assert float(n1) == pytest.approx(float(n2), rel=1e-7)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inbwd_ema_matches():
    cfg, params, tx, batch = _setup(drop_path=0.0)
    key = jax.random.PRNGKey(11)
    ref_step = make_train_step(cfg, tx, use_amp=True, ema_decay=0.9,
                               block_impl="pallas_train_interpret")
    fast_step = make_train_step_inbwd(cfg, tx, ema_decay=0.9,
                                      interpret=True)
    s_ref, _ = ref_step(init_train_state(params, tx, ema_decay=0.9),
                        batch, key)
    s_fast, _ = fast_step(init_train_state(params, tx, ema_decay=0.9),
                          batch, key)
    for a, b in zip(jax.tree.leaves(s_fast["ema_params"]),
                    jax.tree.leaves(s_ref["ema_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-8)
