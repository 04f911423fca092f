"""Multi-stream batched serving (BASELINE.json config 5).

Runs N video streams through ONE detector batch and ONE pose batch per tick:
frames from all streams are stacked, YOLO runs once over the stacked
letterboxes, per-stream SORT tracking stays on host, and all streams' person
crops share a single fused pose_step program — so chip utilization scales
with stream count instead of per-stream dispatch overhead.

The reference has no equivalent (its TODO list asks for "parallel batched
inference", reference README.md:320-328).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ModelConfig
from ..track.sort import Sort
from .pose_step import pose_step
import functools


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype",
                                             "block_impl"))
def _pose_multi_frame(params, frames, boxes, frame_idx, mask, cfg: ModelConfig,
                      compute_dtype=jnp.bfloat16, block_impl: str = "xla"):
    """Pose over crops drawn from a STACK of frames.

    frames: (S, H, W, 3); boxes: (M, 4); frame_idx: (M,) which stream-frame
    each box belongs to.  Implemented by sampling each crop from its own
    frame via a gather on the leading axis inside the crop sampler.
    """
    # Select per-box frames by building a "tall" virtual frame: stack frames
    # vertically and offset each box's y coords by its frame's row offset.
    S, H, W, C = frames.shape
    tall = frames.reshape(S * H, W, C)
    off = (frame_idx * H).astype(jnp.float32)
    boxes_off = boxes.at[:, 1].add(off)
    boxes_off = boxes_off.at[:, 3].add(off)
    # per-crop y bounds stop the +/-10px inflation crossing stream
    # boundaries (matches the reference's clip-at-frame-edge behaviour)
    y_bounds = jnp.stack([frame_idx * H, frame_idx * H + H], axis=-1)
    out = pose_step(params, tall, boxes_off, mask, cfg,
                    compute_dtype=compute_dtype, y_bounds=y_bounds,
                    block_impl=block_impl)
    return out.at[..., 0].add(-off[:, None] * mask[:, None].astype(jnp.float32))


class MultiStreamPose:
    """Batched multi-stream pose serving over one chip.

    Per tick: call :meth:`step` with one RGB frame per stream (same
    resolution).  Detection cadence follows ``yolo_step`` like the
    single-stream pipeline.
    """

    def __init__(self, params, cfg: ModelConfig, detector=None,
                 n_streams: int = 8, yolo_step: int = 1,
                 max_people_per_stream: int = 8,
                 compute_dtype=jnp.bfloat16):
        self.params = params
        self.cfg = cfg
        self.detector = detector
        self.n = n_streams
        self.yolo_step = yolo_step
        self.max_pp = max_people_per_stream
        self.dtype = compute_dtype
        self.trackers = [Sort(max_age=yolo_step,
                              min_hits=3 if yolo_step == 1 else 1,
                              iou_threshold=0.3) for _ in range(n_streams)]
        self.frame_counter = 0
        from .pose_step import default_block_impl
        self.block_impl = default_block_impl()

    def step(self, frames: Sequence[np.ndarray],
             boxes_per_stream: Optional[List[np.ndarray]] = None
             ) -> List[Dict[int, np.ndarray]]:
        """frames: list of n (H, W, 3) uint8 RGB. Returns per-stream
        {track_id: (K, 3) (y, x, score)}."""
        assert len(frames) == self.n
        H, W = frames[0].shape[:2]
        # one host->HBM upload per tick, shared by detector and pose
        frames_dev = jnp.asarray(np.stack(frames)) \
            if not isinstance(frames, jnp.ndarray) else frames

        if boxes_per_stream is None:
            run_det = (self.frame_counter % self.yolo_step == 0
                       or self.frame_counter < 3)
            if run_det and self.detector is not None:
                if hasattr(self.detector, "detect_batch"):
                    raw = self.detector.detect_batch(frames_dev)
                else:
                    raw = [self.detector(frames_dev[i], frame_hw=(H, W))
                           for i in range(self.n)]
                boxes_per_stream = [
                    (r[r[:, 4] > 0.35][:, :5] if len(r)
                     else np.empty((0, 5), np.float32)) for r in raw]
            else:
                boxes_per_stream = [np.empty((0, 5), np.float32)
                                    for _ in range(self.n)]
        self.frame_counter += 1

        all_boxes, all_ids, all_fidx, stream_of = [], [], [], []
        for si in range(self.n):
            tracked = self.trackers[si].update(boxes_per_stream[si])
            tracked = tracked[np.isfinite(tracked[:, :4]).all(1)]
            tracked = tracked[:self.max_pp]
            for row in tracked:
                all_boxes.append(row[:4])
                all_ids.append(int(row[5]))
                all_fidx.append(si)
                stream_of.append(si)

        results: List[Dict[int, np.ndarray]] = [dict() for _ in range(self.n)]
        if not all_boxes:
            return results
        nb = len(all_boxes)
        # FIXED slot count: track counts drift tick to tick, and letting the
        # bucket flap between powers of two retriggers XLA compilation of the
        # pose program mid-stream (~10 s for ViT-H).  Serving wants exactly
        # one compiled shape.
        M = self.n * self.max_pp
        boxes = np.zeros((M, 4), np.float32)
        fidx = np.zeros((M,), np.int32)
        mask = np.zeros((M,), bool)
        boxes[:nb] = np.stack(all_boxes)
        # clip to per-stream frame bounds (tall-frame safety)
        boxes[:nb, 0::2] = np.clip(boxes[:nb, 0::2], 0, W)
        boxes[:nb, 1::2] = np.clip(boxes[:nb, 1::2], 0, H)
        fidx[:nb] = all_fidx
        mask[:nb] = True

        out = _pose_multi_frame(self.params, frames_dev,
                                jnp.asarray(boxes), jnp.asarray(fidx),
                                jnp.asarray(mask), self.cfg,
                                compute_dtype=self.dtype,
                                block_impl=self.block_impl)
        out = np.asarray(out)
        for i in range(nb):
            results[stream_of[i]][all_ids[i]] = out[i]
        return results
