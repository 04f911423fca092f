"""Alternative deconv lowerings (sub-pixel 'phase' and 3x3-'packed') must
reproduce the lhs-dilated lowering to float-reorder noise, value and
gradient, at every geometry the model zoo uses (and odd shapes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.models.head import (conv_transpose_s2,
                                          conv_transpose_s2_packed,
                                          conv_transpose_s2_phase,
                                          head_forward, init_head_params)
from easy_vitpose_tpu.configs import HeadConfig

ALT_IMPLS = {"phase": conv_transpose_s2_phase,
             "packed": conv_transpose_s2_packed}


@pytest.mark.parametrize("impl", sorted(ALT_IMPLS))
@pytest.mark.parametrize("B,H,W,Cin,Cout", [
    (2, 16, 12, 32, 16),   # stage-1 geometry (scaled channels)
    (2, 32, 24, 16, 16),   # stage-2 geometry
    (1, 5, 7, 8, 4),       # odd spatial dims
    (3, 1, 1, 3, 5),       # degenerate 1x1 input
])
def test_alt_impl_matches_dilated(impl, B, H, W, Cin, Cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, Cin, Cout)).astype(np.float32))
    a = conv_transpose_s2(x, w, 4)
    b = ALT_IMPLS[impl](x, w)
    assert a.shape == b.shape == (B, 2 * H, 2 * W, Cout)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("impl", sorted(ALT_IMPLS))
def test_alt_impl_gradients_match_dilated(impl):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 12)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 12, 10)).astype(np.float32))

    def loss(fn):
        def f(w, x):
            return jnp.sum(jnp.sin(fn(x, w)))
        return jax.grad(f, argnums=(0, 1))(w, x)

    ga = loss(lambda x, w: conv_transpose_s2(x, w, 4))
    gb = loss(lambda x, w: ALT_IMPLS[impl](x, w))
    for a, b in zip(ga, gb):
        # same sums in a different accumulation order: tolerance scales
        # with the gradient's magnitude, not element-wise (near-zero
        # elements see ~2e-3 relative reorder noise)
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(np.abs(a).max(), 1.0)


@pytest.mark.parametrize("impl", sorted(ALT_IMPLS))
def test_head_forward_impl_equivalence(impl):
    """Whole head (2x deconv + BN + ReLU + 1x1), train and eval modes."""
    cfg = HeadConfig(in_channels=24, num_keypoints=17,
                     deconv_filters=(16, 16))
    params = init_head_params(jax.random.PRNGKey(0), cfg)
    # give BN non-trivial running stats and the convs real magnitude
    params = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape),
        params)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 16, 12, 24))
    for train in (False, True):
        ya, bna = head_forward(params, x, cfg, train=train,
                               deconv_impl="dilated")
        yb, bnb = head_forward(params, x, cfg, train=train,
                               deconv_impl=impl)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-5, atol=1e-5)
        for sa, sb in zip(bna, bnb):
            np.testing.assert_allclose(np.asarray(sa["mean"]),
                                       np.asarray(sb["mean"]), atol=1e-6)


def test_upsample_simple_variant_ignores_phase():
    """The 'simple' head (0 deconvs, bilinear upsample) has no k=4 stage;
    both impls must be identical by construction."""
    cfg = HeadConfig(in_channels=8, num_keypoints=5, deconv_filters=(),
                     deconv_kernels=(), upsample=4, final_conv_kernel=3)
    params = init_head_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 12, 8))
    ya, _ = head_forward(params, x, cfg, deconv_impl="dilated")
    yb, _ = head_forward(params, x, cfg, deconv_impl="phase")
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
