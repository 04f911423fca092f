"""Single-dispatch detection frames: detector + pose in ONE jitted program.

On frames where detection runs, the standard pipeline pays two device
round-trips: dispatch detector -> fetch boxes -> host track -> dispatch
pose -> fetch keypoints (the reference pays the same boundary twice per
PERSON, easy_ViTPose/inference.py:237-241,320-328).  Here the NMS output
feeds the pose crop sampler *inside one program*:

    frame -> letterbox+YOLO+DFL+NMS -> packed rows (score-sorted, valid
    prefix) -> first `slots` rows become pose slots (masked at the
    pipeline's confidence gate) -> fused crop+ViT+decode -> keypoints

and the host fetches (packed, keypoints) once.  The tracker still runs on
host, AFTER the fetch, associating IDs to the already-posed detections.

Semantics vs the two-program path:
* tracker-less modes (images, single_pose): EXACT — the pose boxes are the
  same conf-gated score-prefix the host path builds (nms_fixed compacts
  valid rows to a score-sorted prefix, so host-side conf gating + score
  capping select precisely ``rows[:slots]``).
* video tracker mode: pose runs on the RAW detection boxes rather than the
  tracker's Kalman-updated boxes (which need the host association in the
  loop).  Keypoints differ by the sub-pixel crop shift between a detection
  and its KF posterior; IDs are identical.  Tracks the tracker emits
  WITHOUT a matching detection this frame (coast output on an empty
  detection frame, or a detection beyond the slot count) fall back to one
  extra pose dispatch on their boxes — the rare path is the old path.

The slot count is STATIC per compile: ``fixed_slots`` pins it outright;
otherwise VitInference passes its grow-only high-water bucket (ratcheted
from past frames — it cannot depend on THIS frame's detection count, that
fetch-before-shape dependency is exactly what the fusion removes).
Detections beyond the current bucket ride the fallback dispatch above
and the bucket catches up on the next detection frame.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..detect.yolo import detect_frame_core
from .pose_step import pose_step


@functools.partial(jax.jit, static_argnames=(
    "geom", "spec", "imgsz", "classes", "conf_nms", "iou_t", "max_det",
    "det_dtype", "cfg", "slots", "gate", "compute_dtype", "modulate_kernel",
    "flip_pairs", "sampler", "block_impl"))
def detect_pose_jit(yolo_params, pose_params, frame,
                    geom, spec, imgsz: int, classes, conf_nms: float,
                    iou_t: float, max_det: int, det_dtype,
                    cfg: ModelConfig, slots: int, gate: float,
                    compute_dtype=jnp.float32, modulate_kernel: int = 11,
                    flip_pairs=None, sampler: str = "gather",
                    block_impl: str = "xla"):
    """frame (H, W, 3) uint8 -> (packed (max_det, 7), keypoints (slots, K, 3)).

    Pose slot i is packed row i: valid, above the pipeline ``gate``, clipped
    to the frame and non-degenerate (the host path's unpack-clip +
    sanitize_detections, fused on device).  Masked slots return zeros.
    """
    packed = detect_frame_core(yolo_params, frame, geom, spec, imgsz,
                               classes, conf_nms, iou_t, max_det, det_dtype)
    H, W = frame.shape[0], frame.shape[1]
    rows = packed[:slots]
    wh = jnp.asarray([W, H, W, H], jnp.float32)
    boxes = jnp.clip(rows[:, :4], 0.0, wh)      # YoloDetector.unpack clip
    mask = ((rows[:, 6] > 0)
            & (rows[:, 4] > gate)
            & jnp.isfinite(boxes).all(axis=1)   # sanitize_detections
            & (boxes[:, 2] > boxes[:, 0])
            & (boxes[:, 3] > boxes[:, 1]))
    kpts = pose_step(pose_params, frame, boxes, mask, cfg,
                     compute_dtype=compute_dtype,
                     modulate_kernel=modulate_kernel,
                     flip_pairs=flip_pairs, sampler=sampler,
                     block_impl=block_impl)
    return packed, kpts
