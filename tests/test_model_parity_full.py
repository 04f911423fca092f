"""Production-geometry forward parity vs the LIVE reference torch oracle.

The round-1 goldens covered depth-2 (96d) and depth-3 (384d) toys only;
these tests instantiate the actual reference model (random init, randomized
BN running stats) at the real geometries — ViT-B 12x768/K=17, ViT-L
24x1024/16 heads, ViT-H 32x1280 with the wholebody 133-keypoint head
(reference configs/ViTPose_common.py:98-195) — and demand f32 forward
agreement with our converted JAX model.

Full-size state dicts are GB-scale, so instead of stored goldens we run the
torch oracle live from /root/reference (present in the build/judge
environment); tests skip cleanly where it isn't.
"""
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import get_model_config
from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.models.vitpose import vitpose_forward

REFERENCE = "/root/reference/easy_ViTPose"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")
torch = pytest.importorskip("torch")


def _reference_vitpose(embed_dim, depth, num_heads, K):
    """Build the reference torch ViTPose at a production geometry
    (backbone args per configs/ViTPose_common.py:65-195; drop_path_rate is
    inert in eval mode so we pass 0)."""
    for name in ("torchvision", "torchvision.transforms", "matplotlib",
                 "matplotlib.pyplot", "ffmpeg"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from vit_models.model import ViTPose
    cfg = dict(
        backbone=dict(type="ViT", img_size=(256, 192), patch_size=16,
                      embed_dim=embed_dim, depth=depth, num_heads=num_heads,
                      ratio=1, use_checkpoint=False, mlp_ratio=4,
                      qkv_bias=True, drop_path_rate=0.0),
        keypoint_head=dict(type="TopdownHeatmapSimpleHead",
                           in_channels=embed_dim, num_deconv_layers=2,
                           num_deconv_filters=(256, 256),
                           num_deconv_kernels=(4, 4),
                           extra=dict(final_conv_kernel=1),
                           out_channels=K))
    return ViTPose(cfg)


CASES = {
    # (dataset, size) -> geometry matching get_model_config
    "b-coco": ("coco", "b", 768, 12, 12, 17),
    "l-coco": ("coco", "l", 1024, 24, 16, 17),
    "h-wholebody": ("wholebody", "h", 1280, 32, 16, 133),
}


@pytest.mark.parametrize("name", list(CASES))
def test_production_geometry_forward_parity(name):
    dataset, size, embed_dim, depth, num_heads, K = CASES[name]
    torch.manual_seed(hash(name) % 2**31)
    model = _reference_vitpose(embed_dim, depth, num_heads, K)
    model.eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
        model.keypoint_head.final_layer.bias.normal_(0, 0.02)
        x = torch.randn(1, 3, 256, 192)
        y_ref = model(x).numpy()

    cfg = get_model_config(dataset, size)
    assert cfg.backbone.embed_dim == embed_dim
    assert cfg.backbone.depth == depth
    assert cfg.backbone.num_heads == num_heads
    assert cfg.head.num_keypoints == K

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model
    params = convert_vitpose_state_dict(sd, cfg)
    del sd
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    y = np.asarray(vitpose_forward(params, x_jax, cfg))

    assert y.shape == y_ref.shape == (1, K, 64, 48)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)
