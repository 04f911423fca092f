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
                                             "block_impl", "flip_pairs"))
def _pose_multi_frame(params, frames, boxes, frame_idx, mask, cfg: ModelConfig,
                      compute_dtype=jnp.bfloat16, block_impl: str = "xla",
                      flip_pairs=None):
    """Pose over crops drawn from a STACK of frames.

    frames: (S, H, W, 3); boxes: (M, 4) frame-local coords; frame_idx: (M,)
    which stream-frame each box belongs to.  Each crop samples from its own
    frame (gather over the stack axis inside the crop sampler), so boxes
    stay in frame coordinates, the +/-10px inflation clips at the frame's
    own edges (reference behaviour), and the interpolation intermediates
    stay at single-frame scale — a "tall virtual frame" formulation scaled
    them by S and OOM'd at 16x1080p batched windows.
    """
    return pose_step(params, frames, boxes, mask, cfg,
                     compute_dtype=compute_dtype, block_impl=block_impl,
                     frame_idx=frame_idx, flip_pairs=flip_pairs)


class MultiStreamPose:
    """Batched multi-stream pose serving over one chip — or over a device
    mesh (``mesh=``): streams shard across chips and XLA runs the same
    batched detector/pose programs data-parallel over ICI.

    Per tick: call :meth:`step` with one RGB frame per stream (same
    resolution).  Detection cadence follows ``yolo_step`` like the
    single-stream pipeline.
    """

    def __init__(self, params, cfg: ModelConfig, detector=None,
                 n_streams: int = 8, yolo_step: int = 1,
                 max_people_per_stream: int = 8,
                 compute_dtype=jnp.bfloat16, quant: bool = False,
                 mesh=None, smooth: bool = False,
                 smooth_params=None, tracker: str = "sort",
                 single_dispatch: bool = False):
        # persist compiled programs across process restarts, exactly like
        # VitInference: a serve restart reloads the (large) fused ViT-H
        # multi-stream program instead of recompiling it
        from ..utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()
        self.params = params
        self.cfg = cfg
        self.detector = detector
        self.n = n_streams
        self.yolo_step = yolo_step
        self.max_pp = max_people_per_stream
        self.dtype = compute_dtype
        assert tracker in ("sort", "bytetrack"), \
            f"tracker must be 'sort' or 'bytetrack', got {tracker!r}"
        if tracker == "bytetrack":
            from ..track.bytetrack import ByteTrack
            self.trackers = [ByteTrack(max_age=yolo_step,
                                       min_hits=3 if yolo_step == 1 else 1,
                                       iou_threshold=0.3, high_thresh=0.35,
                                       det_stride=yolo_step)
                             for _ in range(n_streams)]
            self._det_gate = self.trackers[0].low_thresh
        else:
            self.trackers = [Sort(max_age=yolo_step,
                                  min_hits=3 if yolo_step == 1 else 1,
                                  iou_threshold=0.3)
                             for _ in range(n_streams)]
            self._det_gate = 0.35  # reference inference.py:240-241
        self.frame_counter = 0
        # per-stream One-Euro smoothing (same filter the single-stream
        # pipeline wires with smooth=True; ops/one_euro.py)
        self.smooth = bool(smooth)
        self._smooth_kw = dict(smooth_params or {})
        self._smoothers = [dict() for _ in range(n_streams)]
        # Single-dispatch ticks (pipeline/fused_detect.py::detect_pose_multi):
        # detection ticks run batched detector + batched pose as ONE jitted
        # program and fetch once; trackers associate afterwards.  Same
        # semantics contract as the single-stream fusion: IDs identical,
        # pose runs on the RAW detection boxes instead of the Kalman-updated
        # ones (opt-in, like VitInference's video tracker mode).  Needs a
        # real parameterized detector (the duck-typed stub protocol only has
        # detect_batch_async).
        self.single_dispatch = bool(single_dispatch and detector is not None
                                    and hasattr(detector, "params"))
        self._pending = None  # ("plain", frames_dev, det) | ("fused", frames_dev, handles)
        # grow-only bucket for the fused path's fallback pose dispatch:
        # coast/over-slot row counts drift tick to tick, and letting the
        # bucket flap retriggers XLA compilation mid-stream (~10 s+ for
        # ViT-H) — same ratchet policy as VitInference._slots_highwater
        self._fb_highwater = 0
        from .pose_step import default_block_impl
        self.block_impl = default_block_impl(compute_dtype=compute_dtype)
        if quant:
            # W8A8 int8 serving (models/quant.py): caller passes params from
            # quantize_vit_params(); compute_dtype should be bf16.
            self.block_impl = ("pallas_q8" if self.block_impl == "pallas"
                               else "xla_q8")
        # Stream-parallel serving over a device mesh: frames shard on the
        # stream axis and person slots shard in per-stream blocks (slot
        # s*max_pp+j belongs to stream s, so each crop's frame gather is
        # shard-local); params replicate. jit propagates the input
        # shardings (GSPMD), so the same programs run DP over ICI.
        self.mesh = mesh
        if mesh is not None:
            nd = int(np.prod(list(mesh.shape.values())))
            assert n_streams % nd == 0, \
                f"n_streams={n_streams} must be a multiple of mesh size {nd}"
            from ..parallel.mesh import batch_sharded, replicated
            axis = mesh.axis_names[0]
            self._stream_sh = batch_sharded(mesh, axis)
            self.params = jax.device_put(self.params, replicated(mesh))
            self._sharded_pose = self._build_sharded_pose(mesh, axis)
            if self.single_dispatch:
                self.detector.params = jax.device_put(self.detector.params,
                                                      replicated(mesh))
        self._sharded_fused_cache = {}  # geom -> compiled shard_map tick

    # ------------------------------------------------------------ plumbing

    def _build_sharded_pose(self, mesh, axis):
        """Stream-parallel pose tick via shard_map: each device runs the
        SAME single-chip pose program (including the fused/int8 Pallas
        kernels, which have no GSPMD partitioning rule and so couldn't run
        under a plain sharded jit) over its local streams.  The per-stream
        block slot layout makes everything shard-local: a shard with k
        streams holds slots [0, k*max_pp) whose local frame index is just
        slot // max_pp — no collectives at all."""
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        max_pp = self.max_pp
        cfg, dtype, impl = self.cfg, self.dtype, self.block_impl

        def inner(params, frames, boxes, mask):
            fidx = jnp.arange(boxes.shape[0], dtype=jnp.int32) // max_pp
            return pose_step(params, frames, boxes, mask, cfg,
                             compute_dtype=dtype, block_impl=impl,
                             frame_idx=fidx)

        return jax.jit(shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False))

    def _upload(self, frames):
        assert len(frames) == self.n
        arr = (jnp.asarray(np.stack(frames))
               if not isinstance(frames, jnp.ndarray) else frames)
        if self.mesh is not None:
            arr = jax.device_put(arr, self._stream_sh)
        return arr

    def _det_due(self) -> bool:
        """Detection cadence for this tick (reference inference.py:235-236)."""
        return (self.frame_counter % self.yolo_step == 0
                or self.frame_counter < 3)

    def _dispatch_detect(self, frames_dev):
        """Dispatch detection for this tick (cadence-gated) WITHOUT fetching.
        Returns a device handle (batched path), a list of numpy results
        (per-frame fallback), or None (skipped tick)."""
        run_det = self._det_due()
        self.frame_counter += 1
        if not run_det or self.detector is None:
            return None
        if hasattr(self.detector, "detect_batch_async"):
            return self.detector.detect_batch_async(frames_dev)
        H, W = frames_dev.shape[1:3]
        return [self.detector(frames_dev[i], frame_hw=(H, W))
                for i in range(self.n)]

    def _boxes_from_detect(self, det, frame_hw):
        if det is None:
            return [np.empty((0, 5), np.float32) for _ in range(self.n)]
        if not isinstance(det, list):  # packed device array -> fetch here
            det = self.detector.unpack_batch(np.asarray(det), frame_hw)
        return [(r[r[:, 4] > self._det_gate][:, :5] if len(r)
                 else np.empty((0, 5), np.float32)) for r in det]

    def step(self, frames: Sequence[np.ndarray],
             boxes_per_stream: Optional[List[np.ndarray]] = None
             ) -> List[Dict[int, np.ndarray]]:
        """Synchronous tick: frames -> per-stream {track_id: (K, 3)}."""
        frames_dev = self._upload(frames)
        H, W = frames_dev.shape[1:3]
        if boxes_per_stream is None and self.single_dispatch \
                and self._det_due():
            handles = self._dispatch_fused(frames_dev)
            return self._collect_fused(handles, frames_dev)
        if boxes_per_stream is None:
            boxes_per_stream = self._boxes_from_detect(
                self._dispatch_detect(frames_dev), (H, W))
        else:
            self.frame_counter += 1
        handle, book = self._track_and_pose(frames_dev, boxes_per_stream)
        return self._collect(handle, book)

    def step_pipelined(self, frames: Sequence[np.ndarray]
                       ) -> Optional[List[Dict[int, np.ndarray]]]:
        """Pipelined tick: returns results for the PREVIOUS frames (None on
        the first call; call :meth:`flush` for the final tick).

        Two-program mode hides one RTT: fetch detect(t-1) (its compute
        already overlapped last tick's host time) -> host track -> dispatch
        pose(t-1) -> dispatch detect(t) -> fetch pose(t-1); the detect(t)
        program runs while the host waits on the pose fetch and does
        tracking bookkeeping (VERDICT r1 item 6).

        Single-dispatch mode hides EVERYTHING: the fused detect+pose program
        for tick t depends only on tick t's frames (the pose boxes are the
        raw detections, not tracker state), so it is dispatched before tick
        t-1 is even fetched — the device pipeline stays 2 deep and all host
        tracking + both RTTs overlap device work."""
        frames_dev = self._upload(frames)
        # dispatch tick t FIRST — neither tick kind depends on host tracker
        # state at dispatch time, so it always overlaps the t-1 fetches below
        if self.single_dispatch and self._det_due():
            tick = ("fused", frames_dev, self._dispatch_fused(frames_dev))
        else:
            tick = ("plain", frames_dev, self._dispatch_detect(frames_dev))
        results = self._process_pending() if self._pending is not None else None
        self._pending = tick
        return results

    def flush(self) -> Optional[List[Dict[int, np.ndarray]]]:
        """Drain the pipeline: process and return the last pending tick."""
        if self._pending is None:
            return None
        return self._process_pending()

    def _process_pending(self) -> List[Dict[int, np.ndarray]]:
        kind, prev_dev, payload = self._pending
        self._pending = None
        if kind == "fused":
            return self._collect_fused(payload, prev_dev)
        H, W = prev_dev.shape[1:3]
        boxes = self._boxes_from_detect(payload, (H, W))
        handle, book = self._track_and_pose(prev_dev, boxes)
        return self._collect(handle, book)

    # ------------------------------------------------ single-dispatch tick

    def _dispatch_fused(self, frames_dev):
        """Dispatch the fused detect+pose program for this tick WITHOUT
        fetching; returns the (packed, keypoints) device handles."""
        from ..detect.yolo import letterbox_geometry
        det = self.detector
        H, W = frames_dev.shape[1:3]
        geom = letterbox_geometry(H, W, det.imgsz,
                                  rect=getattr(det, "rect", False))
        self.frame_counter += 1
        if self.mesh is not None:
            return self._sharded_fused(geom)(det.params, self.params,
                                             frames_dev)
        from .fused_detect import detect_pose_multi_jit
        return detect_pose_multi_jit(
            det.params, self.params, frames_dev, geom, det.spec,
            det.classes, det.conf, det.iou, det.max_det, det.dtype,
            self.cfg, self.max_pp, float(self._det_gate),
            compute_dtype=self.dtype, block_impl=self.block_impl)

    def _sharded_fused(self, geom):
        """Stream-parallel fused tick via shard_map (one compiled program per
        letterbox geometry): each device runs the SAME single-chip fused
        detect+pose program over its local streams.  The per-stream slot
        blocks keep every crop's frame gather shard-local — no collectives
        (same layout argument as _build_sharded_pose)."""
        fn = self._sharded_fused_cache.get(geom)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .fused_detect import detect_pose_multi
            det = self.detector
            cfg, dtype, impl = self.cfg, self.dtype, self.block_impl
            slots, gate = self.max_pp, float(self._det_gate)
            spec, classes = det.spec, det.classes
            conf, iou = det.conf, det.iou
            max_det, ddtype = det.max_det, det.dtype

            def inner(yolo_params, pose_params, frames):
                return detect_pose_multi(
                    yolo_params, pose_params, frames, geom, spec, classes,
                    conf, iou, max_det, ddtype, cfg, slots, gate,
                    compute_dtype=dtype, block_impl=impl)

            axis = self.mesh.axis_names[0]
            fn = jax.jit(shard_map(inner, mesh=self.mesh,
                                   in_specs=(P(), P(), P(axis)),
                                   out_specs=(P(axis), P(axis)),
                                   check_vma=False))
            self._sharded_fused_cache[geom] = fn
        return fn

    def _collect_fused(self, handles, frames_dev
                       ) -> List[Dict[int, np.ndarray]]:
        """Fetch the fused tick ONCE, then associate per-stream track IDs to
        the already-posed detections (pose slot si*max_pp+j is detection j of
        stream si — nms_fixed compacts valid rows to a score-sorted prefix,
        so the host conf gate keeps a prefix and indices line up).  Tracker
        rows emitted WITHOUT an in-slot detection this tick (coast rows, or
        detections beyond max_pp) ride one batched fallback pose dispatch on
        their tracker boxes — the rare path is the old path."""
        from ..track.sort import track_and_cap
        H, W = frames_dev.shape[1:3]
        packed, kpts = jax.device_get(handles)
        # _boxes_from_detect owns the host-side gate: the fused program's
        # slot alignment requires it to exactly match the device gate, so
        # there must be exactly one copy of the expression
        gated = self._boxes_from_detect(packed, (H, W))

        results: List[Dict[int, np.ndarray]] = [dict() for _ in range(self.n)]
        fb_boxes: List[np.ndarray] = []
        fb_keys: List[tuple] = []  # (stream, track_id)
        for si in range(self.n):
            rows, det_idx = track_and_cap(self.trackers[si], gated[si],
                                          self.max_pp)
            for row, di in zip(rows, det_idx):
                tid = int(row[5])
                di = int(di)
                if 0 <= di < self.max_pp:
                    results[si][tid] = kpts[si * self.max_pp + di]
                else:
                    fb_keys.append((si, tid))
                    fb_boxes.append(row[:4])

        if fb_boxes:
            from .pose_step import bucket_slots
            nb = len(fb_boxes)
            self._fb_highwater = max(
                self._fb_highwater,
                bucket_slots(nb, max_slots=self.n * self.max_pp))
            M = self._fb_highwater
            boxes = np.zeros((M, 4), np.float32)
            fidx = np.zeros((M,), np.int32)
            mask = np.zeros((M,), bool)
            boxes[:nb] = np.stack(fb_boxes)
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, W)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, H)
            fidx[:nb] = [si for si, _ in fb_keys]
            mask[:nb] = True
            # fallback runs unsharded (single-chip program) even under a
            # mesh: coast rows are rare and arbitrary (stream, slot) pairs
            # don't respect the per-stream block layout.  The frame stack
            # moves device-to-device (ICI resharding, never through host
            # memory — a host round-trip of the full stack per coast tick
            # would stall the pipeline the fusion exists to hide)
            frames_local = (jax.device_put(frames_dev,
                                           self.mesh.devices.flat[0])
                            if self.mesh is not None else frames_dev)
            out = np.asarray(_pose_multi_frame(
                self.params, jnp.asarray(frames_local), jnp.asarray(boxes),
                jnp.asarray(fidx), jnp.asarray(mask), self.cfg,
                compute_dtype=self.dtype, block_impl=self.block_impl))
            for j, (si, tid) in enumerate(fb_keys[:M]):
                results[si][tid] = out[j]

        if self.smooth:
            from ..ops.one_euro import apply_track_smoothing
            results = [apply_track_smoothing(r, self._smoothers[si],
                                             **self._smooth_kw)
                       for si, r in enumerate(results)]
        return results

    def _track_and_pose(self, frames_dev, boxes_per_stream):
        H, W = frames_dev.shape[1:3]
        # FIXED slot count in per-stream BLOCKS (slot si*max_pp+j = person j
        # of stream si): track counts drift tick to tick, and letting the
        # bucket flap between powers of two retriggers XLA compilation of
        # the pose program mid-stream (~10 s for ViT-H) — serving wants
        # exactly one compiled shape. The block layout also makes every
        # crop's frame gather shard-local under stream-parallel meshes.
        M = self.n * self.max_pp
        boxes = np.zeros((M, 4), np.float32)
        mask = np.zeros((M,), bool)
        fidx = (np.arange(M, dtype=np.int32) // self.max_pp)
        book = []  # (slot, stream, track_id)
        for si in range(self.n):
            from ..track.sort import track_and_cap
            tracked, _ = track_and_cap(self.trackers[si],
                                       boxes_per_stream[si], self.max_pp)
            for j, row in enumerate(tracked):
                slot = si * self.max_pp + j
                boxes[slot] = row[:4]
                mask[slot] = True
                book.append((slot, si, int(row[5])))

        if not book:
            return None, book
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, W)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, H)

        if self.mesh is not None:
            boxes_d = jax.device_put(jnp.asarray(boxes), self._stream_sh)
            mask_d = jax.device_put(jnp.asarray(mask), self._stream_sh)
            out = self._sharded_pose(self.params, frames_dev, boxes_d,
                                     mask_d)
        else:
            out = _pose_multi_frame(self.params, frames_dev,
                                    jnp.asarray(boxes), jnp.asarray(fidx),
                                    jnp.asarray(mask), self.cfg,
                                    compute_dtype=self.dtype,
                                    block_impl=self.block_impl)
        return out, book  # device handle, no fetch yet

    def _collect(self, out_handle, book) -> List[Dict[int, np.ndarray]]:
        results: List[Dict[int, np.ndarray]] = [dict() for _ in range(self.n)]
        if out_handle is None:
            if self.smooth:  # all tracks gone -> drop their filters too
                for d in self._smoothers:
                    d.clear()
            return results
        out = np.asarray(out_handle)
        for slot, si, tid in book:
            results[si][tid] = out[slot]
        if self.smooth:
            from ..ops.one_euro import apply_track_smoothing
            results = [apply_track_smoothing(r, self._smoothers[si],
                                             **self._smooth_kw)
                       for si, r in enumerate(results)]
        return results
