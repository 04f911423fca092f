"""Forward-parity tests: JAX ViTPose vs reference torch oracle.

Fixtures in tests/golden/model_*.npz hold a reference-format state_dict, a
random input batch (NCHW), and the torch model's output heatmaps (eval mode,
random BN running stats).  We convert with convert/vitpose_torch.py and demand
f32 forward agreement.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import get_model_config, BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.models.vitpose import vitpose_forward, init_vitpose_params

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "tiny": ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17, deconv_filters=(32, 32))),
    "sslim": ModelConfig(
        name="sslim", dataset="coco_25",
        backbone=BackboneConfig(embed_dim=384, depth=3, num_heads=12),
        head=HeadConfig(in_channels=384, num_keypoints=25)),
}


def load_case(name):
    z = np.load(os.path.join(GOLDEN_DIR, f"model_{name}.npz"))
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    return sd, z["__input__"], z["__output__"]


@pytest.mark.parametrize("name", list(CASES))
def test_forward_parity(name):
    cfg = CASES[name]
    sd, x_nchw, y_ref = load_case(name)
    params = convert_vitpose_state_dict(sd, cfg)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    y = np.asarray(vitpose_forward(params, x, cfg))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)


def test_patch_shape_192_tokens():
    cfg = get_model_config("coco", "b")
    assert cfg.backbone.patch_shape == (16, 12)
    assert cfg.backbone.num_tokens == 192


def test_init_and_forward_shapes():
    import jax
    cfg = get_model_config("coco", "s")
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 256, 192, 3))
    y = vitpose_forward(params, x, cfg)
    assert y.shape == (1, 17, 64, 48)


def test_bf16_forward_close_to_f32():
    """bf16 weights/activations (the TPU serving path) stay within heatmap
    tolerance of f32."""
    from easy_vitpose_tpu.models.vitpose import cast_params
    cfg = CASES["tiny"]
    sd, x_nchw, y_ref = load_case("tiny")
    params = convert_vitpose_state_dict(sd, cfg)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    p16 = cast_params(params, jnp.bfloat16)
    y16 = np.asarray(vitpose_forward(p16, x.astype(jnp.bfloat16), cfg),
                     dtype=np.float32)
    rng = np.ptp(y_ref)
    assert np.max(np.abs(y16 - y_ref)) < 0.02 * rng


def test_unroll_and_remat_match_scan():
    import jax
    from easy_vitpose_tpu.models.vit import vit_forward
    from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
    cfg = CASES["tiny"]
    sd, x_nchw, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, cfg)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    base = np.asarray(vit_forward(params["backbone"], x, cfg.backbone))
    unrolled = np.asarray(vit_forward(params["backbone"], x, cfg.backbone,
                                      unroll=True))
    np.testing.assert_allclose(unrolled, base, atol=1e-6)

    def loss(p, use_remat):
        return jnp.sum(vit_forward(p, x, cfg.backbone, remat=use_remat) ** 2)

    g_plain = jax.grad(lambda p: loss(p, False))(params["backbone"])
    g_remat = jax.grad(lambda p: loss(p, True))(params["backbone"])
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         g_plain, g_remat)
    assert max(jax.tree.leaves(diffs)) < 1e-4


def test_sdpa_attention_matches_einsum():
    from easy_vitpose_tpu.models.vit import vit_forward
    from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
    cfg = CASES["tiny"]
    sd, x_nchw, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, cfg)
    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    a = np.asarray(vit_forward(params["backbone"], x, cfg.backbone))
    b = np.asarray(vit_forward(params["backbone"], x, cfg.backbone,
                               attn_impl="sdpa"))
    np.testing.assert_allclose(a, b, atol=2e-5)
