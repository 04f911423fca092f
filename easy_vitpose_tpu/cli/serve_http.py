"""HTTP pose-estimation endpoint: one chip behind a JSON API.

The reference stops at file/webcam CLIs (reference inference.py:19-146);
production serving usually wants a network API in front of the chip.
This CLI wraps ``VitInference`` in a stdlib ``ThreadingHTTPServer`` —
zero extra dependencies — with the shape discipline the TPU needs:
``fixed_slots`` pins ONE compiled pose program (no slot-count flapping
between requests), arbitrary request resolutions are zero-padded onto a
64-px shape grid (bounded program count instead of one recompile per
novel size; see ``_bucket_pad``), and a process-wide lock serializes
device dispatch (one chip executes one program at a time anyway;
queueing in front of it beats interleaving).

Routes:

* ``POST /pose``  — body: JPEG/PNG bytes (``Content-Type: image/*``) or
  ``application/json`` ``{"image": <base64>, "boxes": [[x1,y1,x2,y2,score]...]?}``.
  Response: ``{"keypoints": {id: [[y,x,score] x K]}, "scores": {id: conf},
  "ms": float}``. Optional ``boxes`` skips the detector (precomputed-bbox
  mode, BASELINE config 1).
* ``GET /healthz`` — 200 once the model is compiled-and-warm (a load
  balancer can gate on it), with model metadata.
* ``GET /metrics`` — request count, error count, p50/p95/max latency ms,
  total crops — enough for a scraper without pulling in a client lib.

Usage:
  python -m easy_vitpose_tpu.cli.serve_http --model vitpose-b-coco.npz \
      --model-name b --yolo yolov8n.npz [--port 8080] [--dtype bf16] \
      [--fixed-slots 16]
"""
from __future__ import annotations

import argparse
import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..utils.io import NumpyEncoder


def build_parser():
    p = argparse.ArgumentParser(description="HTTP pose serving")
    p.add_argument("--model", required=True)
    p.add_argument("--model-name", default=None, choices=["s", "b", "l", "h"])
    p.add_argument("--dataset", default=None)
    p.add_argument("--yolo", default=None)
    p.add_argument("--yolo-size", type=int, default=320)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32", "int8"])
    p.add_argument("--fixed-slots", type=int, default=16,
                   help="person slots of the single compiled pose program")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-requests", type=int, default=0,
                   help="shut down cleanly after N /pose requests (0 = "
                        "serve forever) — for benchmarks and smoke runs "
                        "where killing a TPU-attached process is costly")
    p.add_argument("--max-body-mb", type=int, default=32,
                   help="reject request bodies larger than this (413) — "
                        "an uncapped read would let one request OOM the "
                        "device-attached process")
    return p


class _Metrics:
    """Lock-guarded request counters + a latency reservoir."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.crops = 0
        self._lat_ms: list[float] = []

    def record(self, ms: float, crops: int):
        with self._lock:
            self.requests += 1
            self.crops += crops
            self._lat_ms.append(ms)
            if len(self._lat_ms) > 10_000:   # bounded memory
                self._lat_ms = self._lat_ms[-5_000:]

    def error(self):
        with self._lock:
            self.errors += 1

    def count(self) -> int:
        with self._lock:
            return self.requests

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat_ms)
            pct = (lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
                   if lat else 0.0)
            return {"requests": self.requests, "errors": self.errors,
                    "crops": self.crops, "latency_ms_p50": round(pct(.5), 2),
                    "latency_ms_p95": round(pct(.95), 2),
                    "latency_ms_max": round(lat[-1], 2) if lat else 0.0}


class PoseService:
    """Model + dispatch lock + metrics; handler-independent so tests can
    drive it without sockets."""

    def __init__(self, args):
        from ..pipeline.inference import VitInference
        self.model = VitInference(
            args.model, args.yolo, model_name=args.model_name,
            dataset=args.dataset, yolo_size=args.yolo_size,
            dtype=args.dtype, is_video=False, fixed_slots=args.fixed_slots)
        self.metrics = _Metrics()
        self._lock = threading.Lock()
        self.info = {"model": args.model, "model_name": args.model_name,
                     "dataset": self.model.dataset, "dtype": args.dtype,
                     "fixed_slots": args.fixed_slots}
        self.warm = False

    def warmup(self):
        """Compile the detector+pose programs on a dummy frame so the
        first real request doesn't pay 20-40 s (healthz gates on this).
        Holds the dispatch lock: the socket is already live, and a /pose
        that raced the warmup would interleave with its tracker state."""
        with self._lock:
            img = np.zeros((256, 320, 3), np.uint8)
            boxes = np.array([[10., 10., 200., 240., 1.0]], np.float32)
            self.model.inference(img, bboxes=boxes)
            if self.model.has_detector:
                self.model.inference(img)
            self.model.reset()
            self.warm = True

    def pose(self, img: np.ndarray, boxes=None) -> dict:
        t0 = time.perf_counter()
        img = _bucket_pad(img)
        with self._lock:
            kp = self.model.inference(img, bboxes=boxes)
            scores = dict(self.model._scores_bbox)
            self.model.reset()   # stateless endpoint: no cross-request tracks
        ms = (time.perf_counter() - t0) * 1e3
        self.metrics.record(ms, len(kp))
        return {"keypoints": {int(k): v for k, v in kp.items()},
                "scores": {int(k): float(v) for k, v in scores.items()},
                "ms": round(ms, 2)}


def _bucket_pad(img: np.ndarray, multiple: int = 64) -> np.ndarray:
    """Zero-pad bottom/right so (H, W) are multiples of ``multiple``.

    XLA compiles one program per frame shape; a public endpoint sees
    arbitrary resolutions, which would recompile (20-40 s on TPU) per
    new size.  Padding to a 64-px grid caps the program count at
    #buckets while changing no geometry: content stays at the origin, so
    request boxes and returned keypoints need no re-mapping, and crops
    never read the margin (the detector sees black borders, which it was
    trained to ignore in letterboxed inference)."""
    h, w = img.shape[:2]
    ph = -h % multiple
    pw = -w % multiple
    if ph == 0 and pw == 0:
        return img
    return np.pad(img, ((0, ph), (0, pw), (0, 0)))


def _decode_image(body: bytes, content_type: str):
    """(image ndarray RGB, optional boxes) from an HTTP request body."""
    boxes = None
    if content_type.startswith("application/json"):
        payload = json.loads(body)
        data = base64.b64decode(payload["image"])
        if payload.get("boxes") is not None:
            boxes = np.asarray(payload["boxes"], np.float32).reshape(-1, 5)
    else:
        data = body
    import cv2
    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("body is not a decodable image")
    return img[..., ::-1], boxes   # BGR -> RGB (reference reads RGB)


def make_handler(service: PoseService, max_requests: int = 0,
                 shutdown=None, max_body_bytes: int = 32 << 20):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            data = json.dumps(obj, cls=NumpyEncoder).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                if service.warm:
                    self._send(200, {"status": "ok", **service.info})
                else:
                    self._send(503, {"status": "warming up"})
            elif self.path == "/metrics":
                self._send(200, service.metrics.snapshot())
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/pose":
                self._send(404, {"error": f"no route {self.path}"})
                return
            responded = False
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body_bytes:
                    service.metrics.error()
                    responded = True
                    self._send(413, {"error": f"body {n} bytes exceeds "
                                              f"the {max_body_bytes} cap"})
                    return
                img, boxes = _decode_image(
                    self.rfile.read(n), self.headers.get("Content-Type", ""))
                if boxes is None and not service.model.has_detector:
                    raise ValueError(
                        "no detector loaded (--yolo): pass precomputed "
                        "'boxes' in a JSON body")
                result = service.pose(img, boxes)
                responded = True
                self._send(200, result)
                if max_requests and service.metrics.count() >= max_requests \
                        and shutdown is not None:
                    # shutdown() joins the serve loop — must not be
                    # called from a request thread synchronously
                    threading.Thread(target=shutdown, daemon=True).start()
            except Exception as e:
                if responded:
                    # the 200 write itself failed (client hung up):
                    # nothing sensible to send on the broken socket
                    return
                service.metrics.error()
                # malformed input is the client's fault; a device/runtime
                # failure must read as 5xx so load balancers eject us
                client_fault = isinstance(
                    e, (ValueError, KeyError, TypeError,
                        json.JSONDecodeError))
                self._send(400 if client_fault else 500, {"error": str(e)})

        def log_message(self, fmt, *a):   # quiet per-request stderr spam
            pass

    return Handler


def main(argv=None, ready_event: threading.Event = None,
         server_box: list = None):
    args = build_parser().parse_args(argv)
    service = PoseService(args)
    # bind BEFORE the warmup compile: a load balancer probing /healthz
    # sees the documented 503 "warming up" during the 20-40 s compile
    # instead of connection-refused
    httpd = ThreadingHTTPServer((args.host, args.port), None)
    httpd.RequestHandlerClass = make_handler(
        service, max_requests=args.max_requests, shutdown=httpd.shutdown,
        max_body_bytes=args.max_body_mb << 20)
    serve_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    serve_thread.start()
    print(f">>> compiling (fixed_slots={args.fixed_slots}, "
          f"dtype={args.dtype}) on "
          f"http://{args.host}:{httpd.server_address[1]} ...", flush=True)
    try:
        service.warmup()
    except BaseException:
        httpd.shutdown()
        httpd.server_close()
        raise
    if server_box is not None:
        server_box.append((httpd, service))
    print(f">>> serving on http://{args.host}:{httpd.server_address[1]} "
          f"(POST /pose, GET /healthz, GET /metrics)", flush=True)
    if ready_event is not None:
        ready_event.set()
    try:
        serve_thread.join()
    except KeyboardInterrupt:
        httpd.shutdown()
    finally:
        httpd.server_close()
        print(json.dumps(service.metrics.snapshot()), flush=True)


if __name__ == "__main__":
    main()
