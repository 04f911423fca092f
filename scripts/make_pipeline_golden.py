"""End-to-end pipeline golden: frame + boxes -> keypoints via the REFERENCE
path (bbox inflate -> crop -> pad_image -> cv2.resize uint8 -> normalize ->
torch tiny ViTPose -> keypoints_from_heatmaps UDP -> un-crop), mirroring
easy_ViTPose/inference.py:259-272 + :314-328 exactly, using the committed
tiny model fixture as weights.
"""
import sys
import types

import cv2
import numpy as np
import torch

for name in ("torchvision", "torchvision.transforms", "matplotlib",
             "matplotlib.pyplot", "ffmpeg"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.path.insert(0, "/root/reference/easy_ViTPose")

from vit_models.model import ViTPose  # noqa: E402
from vit_utils.inference import pad_image  # noqa: E402
from vit_utils.top_down_eval import keypoints_from_heatmaps  # noqa: E402

MEAN = [0.485, 0.456, 0.406]
STD = [0.229, 0.224, 0.225]


def main():
    z = np.load("/root/repo/tests/golden/model_tiny.npz")
    sd = {k[4:]: torch.from_numpy(z[k]) for k in z.files if k.startswith("sd::")}
    cfg = dict(
        backbone=dict(type="ViT", img_size=(256, 192), patch_size=16,
                      embed_dim=96, depth=2, num_heads=4, ratio=1,
                      use_checkpoint=False, mlp_ratio=4, qkv_bias=True,
                      drop_path_rate=0.0),
        keypoint_head=dict(type="TopdownHeatmapSimpleHead", in_channels=96,
                           num_deconv_layers=2, num_deconv_filters=(32, 32),
                           num_deconv_kernels=(4, 4),
                           extra=dict(final_conv_kernel=1), out_channels=17))
    model = ViTPose(cfg)
    model.eval()
    model.load_state_dict(sd)

    rng = np.random.default_rng(42)
    H, W = 480, 640
    # smooth structured frame (sinusoid mixture): peaked, stable heatmaps —
    # pixel noise would make argmax flip under 1-LSB resize differences
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    chans = []
    for c in range(3):
        f = (np.sin(xx / (17 + 11 * c)) + np.cos(yy / (23 + 7 * c))
             + np.sin((xx + yy) / (31 + 5 * c)))
        chans.append(f)
    frame = np.stack(chans, -1)
    frame = ((frame - frame.min()) / (np.ptp(frame) + 1e-9) * 255).astype(np.uint8)
    # boxes including edge-clipping and skinny/wide aspect cases
    boxes = np.array([
        [100.3, 50.7, 220.9, 330.2],     # tall box -> pad width
        [300.0, 200.0, 620.0, 300.0],    # wide box -> pad height
        [-5.0, -10.0, 90.0, 120.0],      # clipped at origin
        [500.0, 300.0, 700.0, 500.0],    # clipped at far edge
        [10.5, 10.49999, 330.5, 250.5],  # banker's rounding cases
    ], dtype=np.float32)

    kpts_all, crops_all = [], []
    for bb in boxes:
        bbox = np.round(bb).astype(int)
        bbox[[0, 2]] = np.clip(bbox[[0, 2]] + [-10, 10], 0, W)
        bbox[[1, 3]] = np.clip(bbox[[1, 3]] + [-10, 10], 0, H)
        crop = frame[bbox[1]:bbox[3], bbox[0]:bbox[2]]
        crop, (left_pad, top_pad) = pad_image(crop, 3 / 4)
        org_h, org_w = crop.shape[:2]
        # float32 resize: same bilinear math as the on-device sampler.  The
        # reference resizes uint8 (fixed-point, quantized); that difference is
        # bounded separately by the crop-parity test — chaining it through the
        # random-weight model + Newton decode would make keypoint comparison
        # meaningless (argmax ties flip chaotically).
        img_input = cv2.resize(crop.astype(np.float32), (192, 256),
                               interpolation=cv2.INTER_LINEAR) / 255
        crops_all.append(img_input.astype(np.float32))
        img_input = ((img_input - MEAN) / STD).transpose(2, 0, 1)[None].astype(np.float32)
        with torch.no_grad():
            heat = model(torch.from_numpy(img_input)).numpy()
        pts, prob = keypoints_from_heatmaps(
            heatmaps=heat,
            center=np.array([[org_w // 2, org_h // 2]]),
            scale=np.array([[org_w, org_h]]),
            unbiased=True, use_udp=True)
        k = np.concatenate([pts[:, :, ::-1], prob], axis=2)[0]  # (K, 3) y,x,score
        k[:, :2] += bbox[:2][::-1] - [top_pad, left_pad]
        kpts_all.append(k.astype(np.float32))

    np.savez_compressed(
        "/root/repo/tests/golden/pipeline_golden.npz",
        frame=frame, boxes=boxes,
        keypoints=np.stack(kpts_all),
        crops=np.stack(crops_all))
    print("wrote pipeline golden:", np.stack(kpts_all).shape)


if __name__ == "__main__":
    main()
