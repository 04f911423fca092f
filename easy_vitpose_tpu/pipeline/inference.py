"""VitInference: the public orchestrator (API-compatible with the reference's
single public class, easy_ViTPose/inference.py:51-337).

Capability parity:
* ctor args: model, yolo, model_name, det_class, dataset, yolo_size, device,
  is_video, single_pose, yolo_step (same names/semantics).
* ``inference(img) -> {id: (K, 3) ndarray of (y, x, score)}``; ``draw()``;
  ``reset()``; classmethod ``postprocess``.
* dataset inference from the checkpoint filename; det-class -> COCO classes.

TPU-first differences:
* the detector, per-person crops, pose forward and UDP decode all run in
  fused jitted device programs — no per-person host round-trips
  (the reference does 2 device crossings per person per frame).
* person slots are bucketed to powers of two so XLA compiles a handful of
  program shapes per video.
* weights can run in bf16 (``dtype='bf16'``), the TPU-native serving dtype.
* ``inference(img, bboxes=...)`` accepts precomputed boxes (detector-free
  usage, BASELINE config 1).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (DETC_TO_YOLO_YOLOC, NUM_KEYPOINTS, get_model_config,
                       infer_dataset_by_path)
from ..models.vitpose import cast_params
from ..ops import decode as decode_ops
from ..skeletons import joints_dict
from ..track.sort import Sort
from ..utils.visualization import draw_bboxes, draw_points_and_skeleton
from .pose_step import bucket_slots, pose_step_jit

__all__ = ["VitInference"]

YOLO_CONF_THRESHOLD = 0.35   # reference easy_ViTPose/inference.py:241


class VitInference:
    def __init__(self, model: str,
                 yolo: Optional[str] = None,
                 model_name: Optional[str] = None,
                 det_class: Optional[str] = None,
                 dataset: Optional[str] = None,
                 yolo_size: Optional[int] = 320,
                 device: Optional[str] = None,
                 is_video: bool = False,
                 single_pose: bool = False,
                 yolo_step: int = 1,
                 dtype: str = "fp32",
                 max_people: int = 64,
                 model_cfg=None,
                 flip_test: bool = False,
                 fixed_slots: Optional[int] = None,
                 yolo_rect: Optional[bool] = None,
                 task: Optional[str] = None,
                 smooth: bool = False,
                 smooth_params: Optional[dict] = None,
                 tracker: str = "sort",
                 single_dispatch: Optional[bool] = None):
        assert os.path.exists(model), f"The model file {model} does not exist"
        if yolo is not None:
            assert os.path.exists(yolo), f"The YOLO model {yolo} does not exist"

        # persist compiled programs across process restarts (the
        # reference's precompiled-engine-file role; EVT_COMPILE_CACHE)
        from ..utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()

        self.yolo_size = yolo_size
        self.yolo_step = yolo_step
        self.is_video = is_video
        # One-Euro temporal keypoint smoothing (video only) — the
        # reference ships the filter but never wires it
        # (post_processing/__init__.py:3 exports it unused); here
        # smooth=True applies it per track id across frames
        self.smooth = bool(smooth) and is_video
        self._smooth_kw = dict(smooth_params or {})
        self._smoothers = {}
        self.single_pose = single_pose
        self.max_people = max_people
        # Fuse detector + pose into ONE program on detection frames
        # (pipeline/fused_detect.py): one dispatch + one fetch instead of
        # two of each — measured 1.69x per detection frame through a
        # tunnel-attached host.  Tracker-less modes (images, single_pose)
        # are EXACT vs the two-program path (tests/test_fused_detect.py),
        # so the default (None) turns fusion ON there; in video tracker
        # mode pose runs on the RAW detection boxes instead of the
        # Kalman-updated ones (IDs identical; sub-pixel crop shift on the
        # keypoints), so it stays opt-in (pass single_dispatch=True).
        if single_dispatch is None:
            single_dispatch = not (is_video and not single_pose)
        self.single_dispatch = single_dispatch
        # 'sort' (reference behaviour) | 'bytetrack' (BYTE second
        # association: low-confidence detections sustain — never create —
        # tracks; see track/bytetrack.py)
        assert tracker in ("sort", "bytetrack"), \
            f"tracker must be 'sort' or 'bytetrack', got {tracker!r}"
        self.tracker_type = tracker
        # Serving shape policy. Bucket flapping (person count crossing a
        # power of two) retriggers XLA compilation of the pose program
        # mid-stream (~10 s for ViT-H) — the failure mode stream.py:118-124
        # fixes with ONE compiled shape. Here:
        #   * fixed_slots=N pins the slot count outright;
        #   * video mode defaults to grow-only high-water bucketing: the
        #     slot count only ever ratchets up, so fluctuating person counts
        #     never flap between compiled shapes;
        #   * image mode keeps plain power-of-two bucketing.
        if fixed_slots is not None:
            assert 0 < fixed_slots <= max_people, \
                f"fixed_slots must be in 1..max_people, got {fixed_slots}"
        self.fixed_slots = fixed_slots
        self._slots_highwater = 0
        # Reference auto-picks cuda->mps->cpu (inference.py:94-101); the JAX
        # default backend order (tpu else cpu) is the TPU-native analog, so
        # device=None keeps it. An explicit platform name ('tpu'|'cpu')
        # commits the params there and computation follows them.
        self.device = device
        self._jax_device = None
        if device is not None:
            try:
                self._jax_device = jax.devices(device)[0]
            except RuntimeError as e:
                raise ValueError(
                    f"unknown device {device!r} (expected a JAX platform "
                    f"name like 'tpu' or 'cpu')") from e

        # dataset from filename if not given (reference :123-128); a
        # multi-task checkpoint's task IS its dataset (skeleton + K)
        if task is not None and dataset is None:
            dataset = task
        if dataset is None:
            dataset = infer_dataset_by_path(model)
        assert dataset in NUM_KEYPOINTS, f"invalid dataset {dataset!r}"
        self.dataset = dataset

        if det_class is None:
            det_class = "animals" if dataset in ("ap10k", "apt36k") else "human"
        self.det_class = det_class
        self.yolo_classes = DETC_TO_YOLO_YOLOC[det_class]

        assert model_name in (None, "s", "b", "l", "h"), \
            f"The model name {model_name} is not valid"
        if model_cfg is not None:
            self.cfg = model_cfg  # custom architecture override
        else:
            if model_name is None:
                raise ValueError("model_name ('s'|'b'|'l'|'h') is required")
            self.cfg = get_model_config(dataset, model_name)
        # flip-test averaging (off by default, like the reference's actual
        # inference path; its configs declare flip_test but never wire it)
        if flip_test:
            from ..skeletons import flip_pairs as _fp
            self._flip_pairs = _fp(dataset)
        else:
            self._flip_pairs = None

        # --- weights ---
        if model.endswith(".pth"):
            from ..convert.vitpose_torch import load_torch_checkpoint
            params = load_torch_checkpoint(model, self.cfg)
        elif model.endswith(".npz"):
            from ..utils.checkpoint import load_params
            params = load_params(model)
        else:
            raise ValueError(f"unsupported checkpoint format: {model}")
        # live multi-task ViTPose+ checkpoint (cli/convert plus): splice the
        # requested task's expert + head into a single-task tree so the
        # whole fast serving path (incl. the fused Pallas block) applies
        from ..convert.vitpose_plus import is_plus_params, select_task
        if is_plus_params(params):
            params = select_task(params, task or dataset)
        elif task is not None:
            raise ValueError("task= requires a multi-task (ViTPose+) "
                             "checkpoint from 'cli/convert plus'")
        # dtype='int8' is the W8A8 quantized serving path (models/quant.py):
        # per-channel int8 block weights + dynamic per-token activation
        # quantization ride the MXU's 2x int8 throughput; attention/LN/head
        # stay bf16/f32. Beyond the reference (whose fastest path is fp16 TRT).
        self.quant = dtype in ("int8", "w8a8")
        self.compute_dtype = (jnp.bfloat16
                              if self.quant or dtype in ("bf16", "bfloat16")
                              else jnp.float32)
        # MXU matmul sampler is ~7% faster e2e; the gather sampler is the
        # f32 bit-parity path (see ops/preprocess.py)
        self._sampler = ("matmul" if self.compute_dtype == jnp.bfloat16
                         else "gather")
        from .pose_step import default_block_impl
        self._block_impl = default_block_impl(self._jax_device,
                                              self.compute_dtype)
        if self.quant:
            self._block_impl = ("pallas_q8"
                                if self._block_impl == "pallas" else "xla_q8")
        params = jax.tree.map(jnp.asarray, params)
        if self.quant:
            from ..models.quant import quantize_vit_params
            params = quantize_vit_params(params, self.compute_dtype)
        elif self.compute_dtype == jnp.bfloat16:
            params = cast_params(params, jnp.bfloat16)
        if self._jax_device is not None:
            params = jax.device_put(params, self._jax_device)
        self._params = params

        # --- detector ---
        self._detector = None
        if yolo is not None:
            from ..detect.yolo import YoloDetector
            # video default: rect (minimal-rectangle) letterbox — one
            # compiled shape per video aspect ratio, ~44% fewer detector
            # FLOPs on 16:9 (ultralytics predict-mode auto=True equivalent).
            # image mode keeps the square canvas: one compiled shape for
            # arbitrary mixed-AR stills (e.g. COCO eval).
            if yolo_rect is None:
                yolo_rect = is_video
            # bytetrack needs the full low-confidence band: the detector's
            # default 0.25 NMS gate would discard [low_thresh, 0.25) boxes
            # on device before the BYTE second association saw them
            from ..track.bytetrack import LOW_THRESHOLD
            det_conf = (LOW_THRESHOLD if self.tracker_type == "bytetrack"
                        else 0.25)
            self._detector = YoloDetector(yolo, imgsz=yolo_size,
                                          classes=self.yolo_classes,
                                          conf=det_conf,
                                          dtype=self.compute_dtype,
                                          device=self._jax_device,
                                          rect=yolo_rect)

        self.reset()

        # state for draw()
        self.save_state = True
        self._img = None
        self._yolo_res = None
        self._tracker_res = None
        self._keypoints = None
        self._scores_bbox = {}

    # ------------------------------------------------------------------ api

    def set_yolo_step(self, step: int):
        """Retune the detection cadence mid-stream (webcam auto-tuning,
        pipeline/autotune.py).  Mirrors reset()'s tracker coupling —
        max_age follows yolo_step so tracks coast across skipped detections
        (reference inference.py:180-184) — without dropping live tracks."""
        step = max(1, int(step))
        if step == self.yolo_step:
            return
        self.yolo_step = step
        if self.tracker is not None:
            self.tracker.max_age = step
            self.tracker.min_hits = 3 if step == 1 else 1
            if hasattr(self.tracker, "det_stride"):
                self.tracker.det_stride = step

    @property
    def has_detector(self) -> bool:
        """True when a YOLO checkpoint was loaded (without one, only the
        precomputed-``bboxes`` inference path is available)."""
        return self._detector is not None

    def reset(self):
        """Reset per-video state (frame counter + tracker); reference :174-185."""
        min_hits = 3 if self.yolo_step == 1 else 1
        use_tracker = self.is_video and not self.single_pose
        if not use_tracker:
            self.tracker = None
        elif self.tracker_type == "bytetrack":
            from ..track.bytetrack import ByteTrack
            self.tracker = ByteTrack(max_age=self.yolo_step,
                                     min_hits=min_hits, iou_threshold=0.3,
                                     high_thresh=YOLO_CONF_THRESHOLD,
                                     det_stride=self.yolo_step)
        else:
            self.tracker = Sort(max_age=self.yolo_step, min_hits=min_hits,
                                iou_threshold=0.3)
        self._smoothers = {}
        self.frame_counter = 0
        # new video, new high-water mark (shrinking is free: previously
        # compiled shapes stay in the jit cache)
        self._slots_highwater = 0
        self._batched_slots = 0
        self._pipe_pending = None  # (img, frame_dev, detect handle)

    @classmethod
    def postprocess(cls, heatmaps: np.ndarray, org_w: int, org_h: int
                    ) -> np.ndarray:
        """Heatmaps -> (N, K, 3) (y, x, score); reference :187-205."""
        center = np.array([[org_w // 2, org_h // 2]], np.float32)
        center = np.repeat(center, heatmaps.shape[0], 0)
        scale = np.repeat(np.array([[org_w, org_h]], np.float32),
                          heatmaps.shape[0], 0)
        pts, prob = decode_ops.keypoints_from_heatmaps_udp(
            jnp.asarray(heatmaps), jnp.asarray(center), jnp.asarray(scale))
        pts = np.asarray(pts)
        prob = np.asarray(prob)
        return np.concatenate([pts[:, :, ::-1], prob], axis=2)

    def _detect_due(self) -> bool:
        """Detection cadence for this frame (reference :235-236)."""
        return (self.tracker is None
                or self.frame_counter % self.yolo_step == 0
                or self.frame_counter < 3)

    def _filter_dets(self, results: np.ndarray) -> np.ndarray:
        """Detector rows [x1,y1,x2,y2,conf,cls] -> (N,5) tracker candidates.

        SORT mode gates at 0.35 (reference inference.py:240-241).  ByteTrack
        mode keeps everything down to the tracker's low_thresh — the BYTE
        second association needs the low-confidence boxes (which can only
        sustain existing tracks, never spawn or directly confirm one)."""
        thr = (self.tracker.low_thresh
               if self.tracker is not None
               and self.tracker_type == "bytetrack"
               else YOLO_CONF_THRESHOLD)
        return results[results[:, 4] > thr][:, :5]

    def inference(self, img: np.ndarray,
                  bboxes: Optional[np.ndarray] = None
                  ) -> Dict[Any, np.ndarray]:
        """Detect (or take given boxes) -> track -> pose. img is RGB HWC uint8.

        Returns {person_id: (K, 3) float32 (y, x, score)}.
        """
        if (bboxes is None and self.single_dispatch
                and self._detector is not None and self._detect_due()):
            return self._inference_fused(img)
        res_pd = np.empty((0, 5), np.float32)
        results = None
        # upload the frame once; detector and pose step share the buffer
        frame_dev = jnp.asarray(img)
        if bboxes is not None:
            bb = np.asarray(bboxes, np.float32).reshape(-1, 5)
            res_pd = bb
        elif self._detector is not None and self._detect_due():
            results = self._detector(frame_dev, frame_hw=img.shape[:2])
            if len(results):
                # detector rows are [x1,y1,x2,y2,conf,cls]; keep first 5
                # (conf gate per tracker mode, reference inference.py:240-241)
                res_pd = self._filter_dets(results)
        self.frame_counter += 1
        return self._track_and_pose(img, frame_dev, res_pd, results)

    def _inference_fused(self, img: np.ndarray) -> Dict[Any, np.ndarray]:
        """Single-dispatch detection frame: detector + pose in ONE jitted
        program, keypoints keyed to tracks AFTER the (single) fetch.  See
        pipeline/fused_detect.py for the semantics contract."""
        from ..detect.yolo import YoloDetector, letterbox_geometry
        from .fused_detect import detect_pose_jit
        det = self._detector
        frame_dev = jnp.asarray(img)
        H, W = img.shape[:2]
        geom = letterbox_geometry(H, W, det.imgsz, rect=det.rect)
        # Slot policy: same grow-only high-water bucket as _track_and_pose
        # — NOT max_people, which would pose 64 static crops per frame in
        # a 2-person scene. The count must be picked before this frame's
        # detector runs (one program), so ratchet from PAST frames; rows
        # beyond it ride the fallback pose dispatch below and the ratchet
        # catches up on the next detection frame.
        if self.fixed_slots is not None:
            slots = self.fixed_slots
        else:
            slots = max(self._slots_highwater,
                        bucket_slots(1, max_slots=self.max_people))
        gate = (self.tracker.low_thresh
                if self.tracker is not None
                and self.tracker_type == "bytetrack"
                else YOLO_CONF_THRESHOLD)
        packed_dev, kpts_dev = detect_pose_jit(
            det.params, self._params, frame_dev, geom, det.spec, det.imgsz,
            det.classes, det.conf, det.iou, det.max_det, det.dtype,
            self.cfg, slots, gate, compute_dtype=self.compute_dtype,
            flip_pairs=self._flip_pairs, sampler=self._sampler,
            block_impl=self._block_impl)
        packed, kpts = jax.device_get((packed_dev, kpts_dev))
        self.frame_counter += 1

        results = YoloDetector.unpack(packed, (H, W))
        res_pd0 = self._filter_dets(results)
        # _track_boxes returns per-output-row indices into res_pd0, and
        # pose slot j == res_pd0 row j: nms_fixed compacts valid rows to a
        # score-sorted prefix, so the conf gate keeps a prefix and indices
        # line up with pose slots.
        rows, ids, scores, emitted_di = self._track_boxes(res_pd0)
        if self.fixed_slots is None:
            # ratchet for the next detection frame (grow-only: person
            # counts crossing a power of two never flap the compiled shape)
            self._slots_highwater = max(
                self._slots_highwater,
                bucket_slots(max(len(res_pd0), len(rows)),
                             max_slots=self.max_people))

        frame_keypoints: Dict[Any, np.ndarray] = {}
        scores_bbox: Dict[Any, float] = {}
        fallback = []          # rows emitted without an in-slot detection
        for i, (pid, score) in enumerate(zip(ids, scores)):
            di = int(emitted_di[i])
            if 0 <= di < slots:
                frame_keypoints[pid] = kpts[di]
            else:
                fallback.append(i)
            scores_bbox[pid] = score
        if fallback:
            # rare path = old path: coast-emitted tracks (no detection this
            # frame) or detections beyond the slot count get one standard
            # pose dispatch on their (tracker) boxes
            M = bucket_slots(len(fallback), max_slots=self.max_people)
            boxes_p = np.zeros((M, 4), np.float32)
            mask = np.zeros((M,), bool)
            for j, i in enumerate(fallback[:M]):
                boxes_p[j] = rows[i, :4]
                mask[j] = True
            out = np.asarray(pose_step_jit(
                self._params, frame_dev, jnp.asarray(boxes_p),
                jnp.asarray(mask), self.cfg,
                compute_dtype=self.compute_dtype,
                flip_pairs=self._flip_pairs, sampler=self._sampler,
                block_impl=self._block_impl))
            for j, i in enumerate(fallback[:M]):
                frame_keypoints[ids[i]] = out[j]
        if self.smooth:
            frame_keypoints = self._apply_smoothing(frame_keypoints)

        if self.save_state:
            self._img = img
            self._yolo_res = results
            self._tracker_res = (self._saved_bboxes(rows, img.shape[:2]),
                                 ids, scores)
            self._keypoints = frame_keypoints
            self._scores_bbox = scores_bbox
        return frame_keypoints

    def inference_pipelined(self, img: np.ndarray
                            ) -> Optional[Dict[Any, np.ndarray]]:
        """Pipelined video inference: returns keypoints for the PREVIOUS
        frame (None on the first call; :meth:`flush` drains the last one).

        Ordering hides the detector under the previous frame's pose (and
        one tunnel RTT): fetch detect(t-1) -> host track -> dispatch
        pose(t-1) -> dispatch detect(t) -> fetch pose(t-1).  Per-frame
        results/draw()/state are identical to :meth:`inference`, one frame
        late."""
        frame_dev = jnp.asarray(img)
        out_prev = None
        if self._pipe_pending is not None:
            prev_img, prev_dev, det_h = self._pipe_pending
            res_pd = np.empty((0, 5), np.float32)
            results = None
            if det_h is not None:
                results = self._detector.unpack(np.asarray(det_h),
                                                prev_img.shape[:2])
                if len(results):
                    res_pd = self._filter_dets(results)
            det_t = self._dispatch_detect_async(frame_dev, img.shape[:2])
            out_prev = self._track_and_pose(prev_img, prev_dev, res_pd,
                                            results)
        else:
            det_t = self._dispatch_detect_async(frame_dev, img.shape[:2])
        self._pipe_pending = (img, frame_dev, det_t)
        return out_prev

    def flush(self) -> Optional[Dict[Any, np.ndarray]]:
        """Drain the pipelined stream: process and return the last frame."""
        if getattr(self, "_pipe_pending", None) is None:
            return None
        prev_img, prev_dev, det_h = self._pipe_pending
        self._pipe_pending = None
        res_pd = np.empty((0, 5), np.float32)
        results = None
        if det_h is not None:
            results = self._detector.unpack(np.asarray(det_h),
                                            prev_img.shape[:2])
            if len(results):
                res_pd = self._filter_dets(results)
        return self._track_and_pose(prev_img, prev_dev, res_pd, results)

    def inference_batched(self, frames,
                          bboxes_per_frame=None) -> list:
        """Offline batched video inference: F consecutive same-size frames ->
        F result dicts using TWO device programs total (one batched detector
        program + one batched pose program) instead of 2F.

        Semantics match calling :meth:`inference` frame-by-frame — same
        detection cadence (``yolo_step`` + first-3-frames), conf>0.35
        filter, SORT evolution, score-capping, flip-test — so track IDs
        line up with the sequential path.  Two bounded numeric caveats:
        the detector runs batched (f32-noise differences from per-frame
        runs), and bf16 serving samples crops via the per-frame gather
        sampler here vs the matmul sampler sequentially (the two are
        equal to ~1e-5 at f32; bf16 rounding differs at that scale).

        This is the offline-throughput mode (video files, COCO eval): it
        amortizes per-program dispatch and host<->device round-trips over
        the window, which dominates single-frame latency on tunnel/remote
        hosts.  The reference has no equivalent (its TODO asks for
        "parallel batched inference", reference README.md:320-328).

        Args:
          frames: sequence of (H, W, 3) uint8 RGB frames (same size).
          bboxes_per_frame: optional list of (N_i, 5) [x1,y1,x2,y2,conf]
            arrays to skip detection (detector-free usage).
        Returns:
          list of {person_id: (K, 3) float32 (y, x, score)} — one per frame.
          draw() state is left at the LAST frame of the window.
        """
        frames = list(frames)
        F = len(frames)
        if F == 0:
            return []
        stack = np.stack(frames)
        frames_dev = jnp.asarray(stack)
        H, W = stack.shape[1:3]

        # detection cadence per frame, respecting the running counter
        due = []
        for _ in range(F):
            due.append(bboxes_per_frame is None
                       and self._detector is not None and self._detect_due())
            self.frame_counter += 1
        dets = None
        if any(due):
            if hasattr(self._detector, "detect_batch_async"):
                h = self._detector.detect_batch_async(frames_dev)
                dets = self._detector.unpack_batch(np.asarray(h), (H, W))
            else:
                # per-frame fallback: only the cadence-due frames
                dets = [self._detector(frames_dev[i], frame_hw=(H, W))
                        if due[i] else None for i in range(F)]

        # host tracking, sequential in frame order (identical evolution to
        # the frame-by-frame path)
        per_frame = []
        all_boxes, all_fidx = [], []
        for i in range(F):
            results = None
            res_pd = np.empty((0, 5), np.float32)
            if bboxes_per_frame is not None:
                res_pd = np.asarray(bboxes_per_frame[i],
                                    np.float32).reshape(-1, 5)
            elif due[i] and dets is not None and dets[i] is not None:
                results = dets[i]
                if len(results):
                    res_pd = self._filter_dets(results)
            res_pd, ids, scores, _ = self._track_boxes(res_pd)
            per_frame.append((res_pd, ids, scores, results))
            for row in res_pd:
                all_boxes.append(row[:4])
                all_fidx.append(i)

        outputs = [dict() for _ in range(F)]
        nb = len(all_boxes)
        if nb:
            from .stream import _pose_multi_frame
            # grow-only slot high-water over the whole window: one compiled
            # pose shape per (frame-count, slots) as the window content varies
            self._batched_slots = max(
                self._batched_slots,
                bucket_slots(nb, max_slots=F * self.max_people))
            M = self._batched_slots
            boxes = np.zeros((M, 4), np.float32)
            fidx = np.zeros((M,), np.int32)
            mask = np.zeros((M,), bool)
            boxes[:nb] = np.stack(all_boxes)
            boxes[:nb, 0::2] = np.clip(boxes[:nb, 0::2], 0, W)
            boxes[:nb, 1::2] = np.clip(boxes[:nb, 1::2], 0, H)
            fidx[:nb] = all_fidx
            mask[:nb] = True
            out = np.asarray(_pose_multi_frame(
                self._params, frames_dev, jnp.asarray(boxes),
                jnp.asarray(fidx), jnp.asarray(mask), self.cfg,
                compute_dtype=self.compute_dtype,
                block_impl=self._block_impl,
                flip_pairs=self._flip_pairs))
            k = 0
            for i in range(F):
                res_pd, ids, scores, _ = per_frame[i]
                for pid, score in zip(ids, scores):
                    outputs[i][pid] = out[k]
                    k += 1
        if self.smooth:
            # sequential in frame order: identical filter evolution to the
            # frame-by-frame path
            outputs = [self._apply_smoothing(o) for o in outputs]

        if self.save_state:
            self._window_states = []
            for i in range(F):
                res_pd, ids, scores, results = per_frame[i]
                self._window_states.append(
                    (frames[i], results,
                     (self._saved_bboxes(res_pd, frames[i].shape[:2]),
                      ids, scores),
                     outputs[i], dict(zip(ids, scores))))
            self.select_frame_state(F - 1)
        return outputs

    @staticmethod
    def _saved_bboxes(rows, hw):
        """State-saving bbox convention: the reference mutates each rounded
        bbox in its pose loop (±10 px inflation clipped to the frame,
        reference inference.py:258-263) BEFORE stashing it in
        ``_tracker_res`` — so ``draw()`` renders the actual crop rects.
        Mirror of the device-side ``ops/preprocess.py::crop_geometry``."""
        from ..ops.preprocess import PAD_BBOX
        H, W = hw
        b = np.asarray(rows[:, :4]).round().astype(int)
        if len(b):
            b[:, [0, 2]] = np.clip(b[:, [0, 2]] + [-PAD_BBOX, PAD_BBOX],
                                   0, W)
            b[:, [1, 3]] = np.clip(b[:, [1, 3]] + [-PAD_BBOX, PAD_BBOX],
                                   0, H)
        return b

    def _apply_smoothing(self, kps):
        """Per-track One-Euro smoothing (ops/one_euro.py
        ``apply_track_smoothing``; y/x smoothed, scores pass through)."""
        from ..ops.one_euro import apply_track_smoothing
        return apply_track_smoothing(kps, self._smoothers,
                                     **self._smooth_kw)

    def select_frame_state(self, i: int):
        """Point draw() at frame ``i`` of the last :meth:`inference_batched`
        window (batched mode computes a whole window before any drawing)."""
        (self._img, self._yolo_res, self._tracker_res, self._keypoints,
         self._scores_bbox) = self._window_states[i]

    def _dispatch_detect_async(self, frame_dev, hw):
        due = self._detector is not None and self._detect_due()
        self.frame_counter += 1
        return self._detector.detect_async(frame_dev, frame_hw=hw) \
            if due else None

    def _track_boxes(self, res_pd):
        """Host tracking stage shared by the sequential, batched, and fused
        paths: sanitize -> tracker update -> finite filter -> score-cap.

        Returns (rows, ids, scores, det_idx) where ``det_idx`` maps each
        output row to its index in the INPUT ``res_pd`` (-1 for tracker
        coast rows with no detection this frame).  The single-dispatch
        pipeline keys pre-computed pose slots with it; the plain paths
        ignore it."""
        from ..track.sort import track_and_cap
        rows, det_idx = track_and_cap(self.tracker, res_pd,
                                      self.fixed_slots or self.max_people)
        ids = (rows[:, 5].astype(int).tolist() if self.tracker is not None
               else list(range(len(rows))))
        return rows, ids, rows[:, 4].tolist(), det_idx

    def _track_and_pose(self, img, frame_dev, res_pd, results
                        ) -> Dict[Any, np.ndarray]:
        res_pd, ids, scores, _ = self._track_boxes(res_pd)
        bboxes_i = res_pd[:, :4].round().astype(int)

        frame_keypoints: Dict[Any, np.ndarray] = {}
        scores_bbox: Dict[Any, float] = {}
        n = len(bboxes_i)
        if n:
            if self.fixed_slots is not None:
                M = self.fixed_slots
            elif self.is_video:
                self._slots_highwater = max(
                    self._slots_highwater,
                    bucket_slots(n, max_slots=self.max_people))
                M = self._slots_highwater
            else:
                M = bucket_slots(n, max_slots=self.max_people)
            boxes_p = np.zeros((M, 4), np.float32)
            boxes_p[:n] = res_pd[:n, :4]
            mask = np.zeros((M,), bool)
            mask[:n] = True
            out = pose_step_jit(self._params, frame_dev,
                                jnp.asarray(boxes_p), jnp.asarray(mask),
                                self.cfg, compute_dtype=self.compute_dtype,
                                flip_pairs=self._flip_pairs,
                                sampler=self._sampler,
                                block_impl=self._block_impl)
            out = np.asarray(out)
            for i, (pid, score) in enumerate(zip(ids, scores)):
                frame_keypoints[pid] = out[i]
                scores_bbox[pid] = score
        if self.smooth:
            frame_keypoints = self._apply_smoothing(frame_keypoints)

        if self.save_state:
            self._img = img
            self._yolo_res = results
            self._tracker_res = (self._saved_bboxes(res_pd, img.shape[:2]),
                                 ids, scores)
            self._keypoints = frame_keypoints
            self._scores_bbox = scores_bbox
        return frame_keypoints

    def draw(self, show_yolo: bool = True, show_raw_yolo: bool = False,
             confidence_threshold: float = 0.5) -> np.ndarray:
        """Render stored keypoints/bboxes; returns RGB image (reference :283-312)."""
        img = np.array(self._img)[..., ::-1].copy()  # RGB -> BGR for cv2
        bboxes, ids, scores = self._tracker_res
        if show_raw_yolo or (self.tracker is None and show_yolo):
            if self._yolo_res is not None and len(self._yolo_res):
                r = self._yolo_res
                img = draw_bboxes(img, r[:, :4].astype(int),
                                  range(len(r)), r[:, 4].tolist())
        if show_yolo and self.tracker is not None:
            img = draw_bboxes(img, bboxes, ids, scores)
        for idx, k in self._keypoints.items():
            img = draw_points_and_skeleton(
                img.copy(), k, joints_dict()[self.dataset]["skeleton"],
                person_index=idx,
                points_color_palette="gist_rainbow",
                skeleton_color_palette="jet",
                points_palette_samples=10,
                confidence_threshold=confidence_threshold)
        return img[..., ::-1]  # back to RGB
