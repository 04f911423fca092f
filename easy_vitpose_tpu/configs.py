"""Typed model/config registry.

Replaces the reference's dynamic python-module config system
(reference: easy_ViTPose/configs/ViTPose_common.py:65-195 and the 8 per-dataset
modules, selected via vit_utils/util.py:37-41) with a single typed dataclass
registry keyed by ``(dataset, size)``.  The filename-inference UX
(vit_utils/util.py:28-34) is preserved in :func:`infer_dataset_by_path`.
"""
from __future__ import annotations

import dataclasses
import os
import re
from typing import Optional, Tuple

# Architecture constants shared by every ViTPose size
# (reference: configs/ViTPose_common.py:29-40).
IMAGE_SIZE: Tuple[int, int] = (192, 256)   # (W, H) of the pose crop
HEATMAP_SIZE: Tuple[int, int] = (48, 64)   # (W, H) of the output heatmaps
PATCH_SIZE = 16
PATCH_PADDING = 2                           # PatchEmbed padding = 4+2*(ratio//2-1) = 2 for ratio=1 (vit.py:222)

# ImageNet normalization (reference: easy_ViTPose/inference.py:32-33).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

DATASETS = ("coco", "coco_25", "wholebody", "mpii", "aic", "ap10k", "apt36k", "custom")

# keypoint count per dataset (reference: configs/ViTPose_{dataset}.py out_channels)
NUM_KEYPOINTS = {
    "coco": 17,
    "coco_25": 25,
    "wholebody": 133,
    "mpii": 16,
    "aic": 14,
    "ap10k": 17,
    "apt36k": 17,
    "custom": 18,
}

MODEL_ABBR = {"s": "small", "b": "base", "l": "large", "h": "huge"}


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """ViT backbone hyper-parameters (reference: configs/ViTPose_common.py:68-80 etc)."""

    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0   # only used in training
    patch_size: int = PATCH_SIZE
    patch_padding: int = PATCH_PADDING
    img_size: Tuple[int, int] = (256, 192)  # (H, W)
    in_chans: int = 3
    layer_norm_eps: float = 1e-6
    # Hybrid CNN-stem embedding (reference HybridEmbed, vit.py:231-260):
    # per-stage output channels of the stride-2 conv stem replacing
    # PatchEmbed; None (default, all shipped configs) = plain PatchEmbed.
    stem_channels: Optional[Tuple[int, ...]] = None

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_shape(self) -> Tuple[int, int]:
        """(Hp, Wp) token grid. 256x192/p16/pad4 -> (16, 12) = 192 tokens.

        With a hybrid stem the grid is the stem's output resolution
        (SAME-padded stride-2 stages): ceil(H / 2**n_stages)."""
        if self.stem_channels:
            s = 2 ** len(self.stem_channels)
            return (-(-self.img_size[0] // s), -(-self.img_size[1] // s))
        h = (self.img_size[0] + 2 * self.patch_padding - self.patch_size) // self.patch_size + 1
        w = (self.img_size[1] + 2 * self.patch_padding - self.patch_size) // self.patch_size + 1
        return (h, w)

    @property
    def num_tokens(self) -> int:
        hp, wp = self.patch_shape
        return hp * wp


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Deconv heatmap head (reference: head/topdown_heatmap_simple_head.py:43-135).

    Two ConvTranspose(k4,s2) + BN + ReLU stages then a 1x1 conv to
    ``num_keypoints`` channels; the ``*_simple_*`` train variant uses 0 deconvs,
    bilinear x4 upsample and a 3x3 final conv
    (reference: train_configs/ViTPose_base_simple_coco_256x192.py:63-67).
    """

    in_channels: int
    num_keypoints: int
    deconv_filters: Tuple[int, ...] = (256, 256)
    deconv_kernels: Tuple[int, ...] = (4, 4)
    final_conv_kernel: int = 1
    upsample: int = 0  # used by the "simple" head variant (no deconvs)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str                 # e.g. "b"
    dataset: str              # e.g. "coco"
    backbone: BackboneConfig
    head: HeadConfig

    @property
    def num_keypoints(self) -> int:
        return self.head.num_keypoints


_BACKBONES = {
    # reference: configs/ViTPose_common.py model_small/base/large/huge
    "s": BackboneConfig(embed_dim=384, depth=12, num_heads=12, drop_path_rate=0.1),
    "b": BackboneConfig(embed_dim=768, depth=12, num_heads=12, drop_path_rate=0.3),
    "l": BackboneConfig(embed_dim=1024, depth=24, num_heads=16, drop_path_rate=0.5),
    "h": BackboneConfig(embed_dim=1280, depth=32, num_heads=16, drop_path_rate=0.55),
}


def get_model_config(dataset: str, size: str, *, num_keypoints: Optional[int] = None,
                     simple_head: bool = False,
                     stem_channels: Optional[Tuple[int, ...]] = None
                     ) -> ModelConfig:
    """Config for ``(dataset, size)`` — the typed replacement for
    ``dyn_model_import`` (reference vit_utils/util.py:37-41).

    ``stem_channels``: opt-in hybrid CNN-stem embedding (reference
    HybridEmbed, vit.py:231-260); e.g. (64, 128, 256, 512) for the /16
    grid. No shipped config uses it — experiments only."""
    if size not in _BACKBONES:
        raise ValueError(f"model size {size!r} not in {list(_BACKBONES)}")
    if dataset not in DATASETS:
        raise ValueError(f"dataset {dataset!r} not in {DATASETS}")
    bb = _BACKBONES[size]
    if stem_channels is not None:
        bb = dataclasses.replace(bb, stem_channels=tuple(stem_channels))
    k = num_keypoints if num_keypoints is not None else NUM_KEYPOINTS[dataset]
    if simple_head:
        head = HeadConfig(in_channels=bb.embed_dim, num_keypoints=k,
                          deconv_filters=(), deconv_kernels=(),
                          final_conv_kernel=3, upsample=4)
    else:
        head = HeadConfig(in_channels=bb.embed_dim, num_keypoints=k)
    return ModelConfig(name=size, dataset=dataset, backbone=bb, head=head)


def infer_dataset_by_path(model_path: str) -> str:
    """Infer dataset name from a checkpoint filename, e.g.
    ``vitpose-b-coco_25.pth`` -> ``coco_25``
    (same UX as reference vit_utils/util.py:28-34)."""
    name = os.path.basename(model_path)
    m = re.search(r"-([a-zA-Z0-9_]+)\.(pth|onnx|engine|npz|safetensors|orbax)", name)
    if not m:
        raise ValueError(
            f"Could not infer the dataset from ckpt name {name!r}; pass dataset=...")
    return m.group(1)


# detection class -> COCO class ids for the detector
# (reference: easy_ViTPose/inference.py:36-48)
DETC_TO_YOLO_YOLOC = {
    "human": [0],
    "cat": [15],
    "dog": [16],
    "horse": [17],
    "sheep": [18],
    "cow": [19],
    "elephant": [20],
    "bear": [21],
    "zebra": [22],
    "giraffe": [23],
    "animals": [15, 16, 17, 18, 19, 20, 21, 22, 23],
}
