"""Inference CLI — feature parity with the reference driver
(reference inference.py:19-209): image / video / webcam / directory-of-videos
input, FPS stats, annotated image/video output, JSON keypoint dumps.

Usage:
  python -m easy_vitpose_tpu.cli.infer --input video.mp4 --model ckpt.npz \
      --model-name b [--yolo yolov8n.npz] [--output-path out/] [--save-json]
"""
from __future__ import annotations

import argparse
import json
import os
import time
from glob import glob

import numpy as np

from ..pipeline.inference import VitInference
from ..skeletons import joints_dict
from ..utils.io import NumpyEncoder, VideoReader, video_metadata

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native ViTPose inference")
    p.add_argument("--input", required=True,
                   help="image / video path, webcam index, or directory")
    p.add_argument("--output-path", default="",
                   help="output dir (annotated media + json)")
    p.add_argument("--model", required=True, help=".npz or .pth checkpoint")
    p.add_argument("--model-name", default=None, choices=["s", "b", "l", "h"])
    p.add_argument("--yolo", default=None, help="YOLOv8 .npz/.pt checkpoint")
    p.add_argument("--dataset", default=None)
    p.add_argument("--det-class", default=None)
    p.add_argument("--yolo-size", type=int, default=320)
    p.add_argument("--yolo-step", type=int, default=1)
    p.add_argument("--rotate", type=int, default=0, choices=[0, 90, 180, 270])
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32", "int8"])
    p.add_argument("--single-pose", action="store_true")
    p.add_argument("--tracker", default="sort",
                   choices=["sort", "bytetrack"],
                   help="video tracker: 'sort' (reference behaviour) or "
                        "'bytetrack' (BYTE second association — "
                        "low-confidence detections sustain tracks through "
                        "blur/occlusion instead of dropping the identity)")
    p.add_argument("--smooth", action="store_true",
                   help="One-Euro temporal keypoint smoothing per track "
                        "(video only; the reference ships this filter "
                        "but never wires it)")
    p.add_argument("--show", action="store_true")
    p.add_argument("--show-yolo", action="store_true")
    p.add_argument("--show-raw-yolo", action="store_true")
    p.add_argument("--save-img", action="store_true")
    p.add_argument("--save-json", action="store_true")
    p.add_argument("--conf-threshold", type=float, default=0.5)
    p.add_argument("--fixed-slots", type=int, default=None,
                   help="pin the pose-batch slot count to one compiled "
                        "shape (video defaults to grow-only high-water "
                        "bucketing already)")
    p.add_argument("--device", default=None,
                   help="JAX platform to run on ('tpu'|'cpu'); default "
                        "auto-picks like the reference's cuda->mps->cpu")
    p.add_argument("--pipelined", action="store_true",
                   help="overlap detection with the previous frame's pose "
                        "(one-frame output latency, higher video FPS)")
    p.add_argument("--batch", type=int, default=0,
                   help="offline batched mode for video files: process N "
                        "frames per device program pair (max throughput; "
                        "results identical to frame-by-frame)")
    p.add_argument("--target-fps", type=float, default=None,
                   help="auto-tune yolo_step to hold this FPS on live/video "
                        "input (detection cadence is the elastic cost; the "
                        "tracker coasts between detections)")
    p.add_argument("--single-dispatch", action="store_true", default=None,
                   help="fuse detector+pose into ONE device program on "
                        "detection frames (one dispatch + one fetch; see "
                        "pipeline/fused_detect.py for the exact semantics). "
                        "Default: ON for images / --single-pose, where the "
                        "fused path is pinned exactly equivalent; opt-in "
                        "for video tracker mode (pose crops come from the "
                        "raw detection boxes there — IDs identical, "
                        "sub-pixel crop shift on keypoints)")
    p.add_argument("--no-single-dispatch", dest="single_dispatch",
                   action="store_false",
                   help="force the two-program (detect, then pose) path "
                        "even where fusion is the default")
    p.add_argument("--trace", default="", metavar="LOGDIR",
                   help="capture a TensorBoard-viewable jax.profiler device "
                        "trace of the run into LOGDIR (utils/profiling.py; "
                        "the reference has no profiler hooks at all)")
    return p


VIDEO_EXTS = (".mp4", ".mov", ".avi", ".mkv", ".webm")
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def run_one(args, input_path: str) -> None:
    ext = os.path.splitext(str(input_path))[1].lower()
    is_video = ext in VIDEO_EXTS or str(input_path).isdigit()

    out_writer = None
    keypoints_log = []
    fps_hist = []

    if is_video:
        frames = VideoReader(input_path, rotate=args.rotate)
        meta = (video_metadata(input_path)
                if not str(input_path).isdigit() else {"fps": 30})
    else:
        img = cv2.imread(str(input_path))
        assert img is not None, f"cannot read {input_path}"
        frames = [cv2.cvtColor(img, cv2.COLOR_BGR2RGB)]
        meta = {"fps": 1}

    # Mode-conflict checks BEFORE the (expensive) model load
    if args.batch and (args.target_fps or args.pipelined):
        raise SystemExit(
            "--batch is the offline windowed mode; it is incompatible with "
            "the live-pacing flags --target-fps (the auto-tuner needs "
            "steady per-frame timing, not whole-window bursts) and "
            "--pipelined (the window already overlaps detect and pose)")
    if args.single_dispatch and (args.batch or args.pipelined):
        raise SystemExit(
            "--single-dispatch fuses detector+pose into one program on "
            "plain per-frame inference only; --pipelined and --batch route "
            "through their own dispatch schedules and would silently "
            "ignore it")
    single_dispatch = args.single_dispatch
    if single_dispatch is None and (args.batch or args.pipelined):
        # the default-ON resolution (images / --single-pose) must not
        # leak into modes with their own dispatch schedules, where the
        # explicit flag is rejected above — force the two-program path
        single_dispatch = False

    # One-Euro timestep from the clip's real frame rate
    smooth_params = ({"fps": float(meta["fps"])}
                     if args.smooth and is_video and meta.get("fps")
                     else None)
    model = VitInference(args.model, yolo=args.yolo,
                         model_name=args.model_name,
                         det_class=args.det_class, dataset=args.dataset,
                         yolo_size=args.yolo_size, is_video=is_video,
                         single_pose=args.single_pose,
                         yolo_step=args.yolo_step, dtype=args.dtype,
                         smooth=args.smooth, smooth_params=smooth_params,
                         fixed_slots=args.fixed_slots, device=args.device,
                         tracker=args.tracker,
                         single_dispatch=single_dispatch)
    print(f">>> model loaded: {args.model} (dataset={model.dataset}, "
          f"dtype={args.dtype})")

    save_media = (args.save_img or args.show) or bool(args.output_path)
    base = os.path.splitext(os.path.basename(str(input_path)))[0]

    tuner = None
    if args.target_fps and is_video:
        from ..pipeline.autotune import YoloStepAutoTuner
        tuner = YoloStepAutoTuner(args.target_fps,
                                  min_step=args.yolo_step)

    use_pipeline = args.pipelined and is_video and args.yolo
    frame_iter = iter(frames)

    def stream():
        if args.batch and is_video and not str(input_path).isdigit():
            # offline windowed mode: one batched detect + one batched pose
            # program per window of N frames
            def emit(window):
                outs = model.inference_batched(window)
                for k, (fr, out) in enumerate(zip(window, outs)):
                    if save_media:
                        model.select_frame_state(k)  # draw() per frame
                    yield fr, out

            window = []
            for f in frame_iter:
                window.append(f)
                if len(window) == args.batch:
                    yield from emit(window)
                    window = []
            if window:
                yield from emit(window)
            return
        if not use_pipeline:
            for f in frame_iter:
                yield f, model.inference(f)
            return
        prev = None
        for f in frame_iter:
            out = model.inference_pipelined(f)
            if out is not None:
                yield prev, out
            prev = f
        out = model.flush()
        if out is not None:
            yield prev, out

    t_prev = time.perf_counter()
    for i, (frame, kpts) in enumerate(stream()):
        now = time.perf_counter()
        dt = now - t_prev
        t_prev = now
        fps_hist.append(1.0 / max(dt, 1e-9))
        if tuner is not None and i >= 3:  # skip compile frames
            new_step = tuner.update(dt)
            if new_step != model.yolo_step:
                print(f">>> auto-tune: yolo_step -> {new_step} "
                      f"(ema {1.0 / max(tuner._avg_dt, 1e-9):.1f} fps, "
                      f"target {args.target_fps})")
                model.set_yolo_step(new_step)
        if args.save_json:
            keypoints_log.append({str(k): v for k, v in kpts.items()})
        if save_media:
            drawn = model.draw(show_yolo=args.show_yolo,
                               show_raw_yolo=args.show_raw_yolo,
                               confidence_threshold=args.conf_threshold)
            bgr = drawn[..., ::-1]
            if args.show:
                cv2.imshow("easy_vitpose_tpu", bgr)
                cv2.waitKey(1)
            if args.output_path:
                os.makedirs(args.output_path, exist_ok=True)
                if is_video:
                    if out_writer is None:
                        h, w = bgr.shape[:2]
                        # codec probing with fallback (reference
                        # inference.py:75-85 tries avc1 then falls back)
                        for codec in ("avc1", "mp4v", "MJPG"):
                            out_writer = cv2.VideoWriter(
                                os.path.join(args.output_path,
                                             base + "_out.mp4"),
                                cv2.VideoWriter_fourcc(*codec),
                                meta.get("fps", 30) or 30, (w, h))
                            if out_writer.isOpened():
                                break
                    out_writer.write(bgr)
                elif args.save_img:
                    cv2.imwrite(os.path.join(args.output_path,
                                             base + "_out.png"), bgr)

    if out_writer is not None:
        out_writer.release()
    if args.save_json and args.output_path:
        os.makedirs(args.output_path, exist_ok=True)
        out_json = os.path.join(args.output_path, base + "_keypoints.json")
        with open(out_json, "w") as f:
            json.dump({"keypoints": keypoints_log,
                       "skeleton": joints_dict()[model.dataset]["keypoints"]},
                      f, cls=NumpyEncoder)
        print(f">>> keypoints saved to {out_json}")
    if fps_hist:
        # skip warmup frames in the mean (compilation)
        steady = fps_hist[3:] or fps_hist
        print(f">>> frames: {len(fps_hist)}  mean FPS (steady): "
              f"{np.mean(steady):.1f}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    import contextlib

    from ..utils.profiling import device_trace
    trace = (device_trace(args.trace) if args.trace
             else contextlib.nullcontext())
    with trace:
        if os.path.isdir(args.input):
            inputs = sorted(sum((glob(os.path.join(args.input, "*" + e))
                                 for e in VIDEO_EXTS + IMAGE_EXTS), []))
            assert inputs, f"no media found in {args.input}"
            for p in inputs:
                run_one(args, p)
        else:
            run_one(args, args.input)
    if args.trace:
        print(f">>> device trace written to {args.trace} "
              f"(view: tensorboard --logdir {args.trace})")


if __name__ == "__main__":
    main()
