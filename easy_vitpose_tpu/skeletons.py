"""Skeleton registry: keypoint names, bones, flip pairs and OKS sigmas.

Data lives in :mod:`easy_vitpose_tpu.skeletons_data` (extracted public dataset
taxonomy; reference joints_dict at vit_utils/visualization.py:13-355).
Flip pairs are derived from left_/right_ name symmetry rather than hard-coded
tables, so every dataset (incl. wholebody-133) gets correct flip behaviour.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

from .skeletons_data import JOINTS

# COCO-17 OKS per-keypoint sigmas (public COCO eval constants, used by the
# OKS-NMS path; reference post_processing/nms.py oks_iou uses them via caller).
COCO_SIGMAS = np.array([
    .026, .025, .025, .035, .035, .079, .079, .072, .072,
    .062, .062, .107, .107, .087, .087, .089, .089], dtype=np.float32)


def joints_dict() -> Dict[str, dict]:
    """Same shape as the reference API: {dataset: {'keypoints': {...}, 'skeleton': [...]}}"""
    return JOINTS


@lru_cache(maxsize=None)
def keypoint_names(dataset: str) -> Tuple[str, ...]:
    kp = JOINTS[dataset]["keypoints"]
    return tuple(kp[i] for i in range(len(kp)))


@lru_cache(maxsize=None)
def skeleton_bones(dataset: str) -> Tuple[Tuple[int, int], ...]:
    return tuple(tuple(b) for b in JOINTS[dataset]["skeleton"])


@lru_cache(maxsize=None)
def flip_pairs(dataset: str) -> Tuple[Tuple[int, int], ...]:
    """(left, right) index pairs derived from name symmetry.

    Matches the hand-coded COCO table used by the reference dataset
    (reference datasets/COCO.py:114) for coco and extends uniformly to all
    supported skeletons.
    """
    names = keypoint_names(dataset)
    index = {n: i for i, n in enumerate(names)}
    pairs: List[Tuple[int, int]] = []
    for n, i in index.items():
        for lp, rp in (("left_", "right_"), ("l_", "r_")):
            if n.startswith(lp):
                r = rp + n[len(lp):]
                if r in index:
                    pairs.append((i, index[r]))
    pairs.sort()
    return tuple(pairs)


def num_keypoints(dataset: str) -> int:
    return len(JOINTS[dataset]["keypoints"])
