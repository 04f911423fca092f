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
from ..detect.yolo import detect_batch_core, detect_frame_core
from .pose_step import pose_step


def _slot_rows(packed, slots: int, max_det: int):
    """First ``slots`` packed detection rows along the last-but-one axis,
    zero-padded when ``slots > max_det`` (the grow-only slot bucket rounds
    up to powers of two, so it can legally exceed the detector's max_det;
    zero rows fail the validity gate below, so padded slots stay masked
    instead of silently truncating — or crashing — the pose batch)."""
    if slots <= max_det:
        return packed[..., :slots, :]
    pad = [(0, 0)] * (packed.ndim - 2) + [(0, slots - max_det), (0, 0)]
    return jnp.pad(packed, pad)


def _slot_mask(rows, W, H, gate: float):
    """Clip + confidence gate + sanitize for pose slots — the host path's
    unpack clip (detect/yolo.py::YoloDetector.unpack) + sanitize_detections
    (track/sort.py), fused on device.  One home for the single- and
    multi-stream fused programs.  Returns (boxes, mask)."""
    wh = jnp.asarray([W, H, W, H], jnp.float32)
    boxes = jnp.clip(rows[:, :4], 0.0, wh)
    mask = ((rows[:, 6] > 0)
            & (rows[:, 4] > gate)
            & jnp.isfinite(boxes).all(axis=1)
            & (boxes[:, 2] > boxes[:, 0])
            & (boxes[:, 3] > boxes[:, 1]))
    return boxes, mask


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
    rows = _slot_rows(packed, slots, max_det)
    boxes, mask = _slot_mask(rows, W, H, gate)
    kpts = pose_step(pose_params, frame, boxes, mask, cfg,
                     compute_dtype=compute_dtype,
                     modulate_kernel=modulate_kernel,
                     flip_pairs=flip_pairs, sampler=sampler,
                     block_impl=block_impl)
    return packed, kpts


def detect_pose_multi(yolo_params, pose_params, frames,
                      geom, spec, classes, conf_nms: float, iou_t: float,
                      max_det: int, det_dtype, cfg: ModelConfig,
                      slots: int, gate: float,
                      compute_dtype=jnp.float32, modulate_kernel: int = 11,
                      flip_pairs=None, block_impl: str = "xla"):
    """Traceable fused MULTI-STREAM tick: frames (S, H, W, 3) uint8 ->
    (packed (S, max_det, 7), keypoints (S*slots, K, 3)).

    The multi-stream twin of :func:`detect_pose_jit`: ONE program runs the
    batched detector over all S stream frames and feeds each stream's first
    ``slots`` packed rows (its per-stream pose slot block — slot s*slots+j is
    detection j of stream s) straight into the batched pose step, each crop
    gathering from its own frame.  The host fetches (packed, keypoints) once
    per tick and the per-stream trackers associate IDs afterwards — instead
    of detect-dispatch -> fetch -> host track -> pose-dispatch -> fetch every
    tick (the reference pays that boundary per PERSON per frame,
    easy_ViTPose/inference.py:237-241,320-328).

    Shared by the jit wrapper below and MultiStreamPose's shard_map twin
    (frames shard on the stream axis; the per-stream slot blocks keep every
    crop's frame gather shard-local, so there are no collectives).
    """
    packed = detect_batch_core(yolo_params, frames, geom, spec, classes,
                               conf_nms, iou_t, max_det, det_dtype)
    S, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
    rows = _slot_rows(packed, slots, max_det).reshape(S * slots, 7)
    boxes, mask = _slot_mask(rows, W, H, gate)
    fidx = jnp.arange(S * slots, dtype=jnp.int32) // slots
    kpts = pose_step(pose_params, frames, boxes, mask, cfg,
                     compute_dtype=compute_dtype,
                     modulate_kernel=modulate_kernel,
                     flip_pairs=flip_pairs, frame_idx=fidx,
                     block_impl=block_impl)
    return packed, kpts


@functools.partial(jax.jit, static_argnames=(
    "geom", "spec", "classes", "conf_nms", "iou_t", "max_det", "det_dtype",
    "cfg", "slots", "gate", "compute_dtype", "modulate_kernel", "flip_pairs",
    "block_impl"))
def detect_pose_multi_jit(yolo_params, pose_params, frames,
                          geom, spec, classes, conf_nms: float, iou_t: float,
                          max_det: int, det_dtype, cfg: ModelConfig,
                          slots: int, gate: float,
                          compute_dtype=jnp.float32,
                          modulate_kernel: int = 11,
                          flip_pairs=None, block_impl: str = "xla"):
    return detect_pose_multi(yolo_params, pose_params, frames, geom, spec,
                             classes, conf_nms, iou_t, max_det, det_dtype,
                             cfg, slots, gate, compute_dtype=compute_dtype,
                             modulate_kernel=modulate_kernel,
                             flip_pairs=flip_pairs, block_impl=block_impl)
