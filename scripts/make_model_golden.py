"""Generate model-parity golden fixtures: random-init the *reference* torch
ViTPose (oracle), save its state_dict + input + output heatmaps.

Two sizes: a tiny config (fast CI) and a slim ViT-S-width config (3 layers,
real 384-dim geometry).  Tests convert the state_dict with our converter and
check forward parity of the JAX model.
"""
import sys
import types

import numpy as np
import torch

for name in ("torchvision", "torchvision.transforms", "matplotlib",
             "matplotlib.pyplot", "ffmpeg"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.path.insert(0, "/root/reference/easy_ViTPose")

from vit_models.model import ViTPose  # noqa: E402


def make_cfg(embed_dim, depth, num_heads, K=17, deconv_filters=(32, 32)):
    return dict(
        backbone=dict(type="ViT", img_size=(256, 192), patch_size=16,
                      embed_dim=embed_dim, depth=depth, num_heads=num_heads,
                      ratio=1, use_checkpoint=False, mlp_ratio=4,
                      qkv_bias=True, drop_path_rate=0.0),
        keypoint_head=dict(type="TopdownHeatmapSimpleHead",
                           in_channels=embed_dim, num_deconv_layers=2,
                           num_deconv_filters=deconv_filters,
                           num_deconv_kernels=(4, 4),
                           extra=dict(final_conv_kernel=1),
                           out_channels=K),
    )


def dump(name, cfg_kwargs, seed):
    torch.manual_seed(seed)
    model = ViTPose(make_cfg(**cfg_kwargs))
    model.eval()
    # randomize BN running stats so folding is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
        fl = model.keypoint_head.final_layer
        fl.bias.normal_(0, 0.02)
        x = torch.randn(2, 3, 256, 192)
        y = model(x)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        f"/root/repo/tests/golden/model_{name}.npz",
        __input__=x.numpy(), __output__=y.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()})
    print(name, "out", tuple(y.shape),
          "params", sum(v.size for v in sd.values()))


if __name__ == "__main__":
    dump("tiny", dict(embed_dim=96, depth=2, num_heads=4, K=17,
                      deconv_filters=(32, 32)), seed=0)
    dump("sslim", dict(embed_dim=384, depth=3, num_heads=12, K=25,
                       deconv_filters=(256, 256)), seed=1)
