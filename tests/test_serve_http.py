"""HTTP serving endpoint (cli/serve_http): routes, JSON schema, error
paths, metrics — against a live localhost server on an ephemeral port."""
import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax
    from easy_vitpose_tpu.cli import serve_http
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ck = tmp_path_factory.mktemp("w") / "vitpose-s-coco.npz"
    save_params(str(ck), init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))

    ready = threading.Event()
    box: list = []
    t = threading.Thread(
        target=serve_http.main,
        args=(["--model", str(ck), "--model-name", "s", "--port", "0",
               "--dtype", "fp32", "--fixed-slots", "4"], ready, box),
        daemon=True)
    t.start()
    assert ready.wait(timeout=600), "server did not come up"
    httpd, service = box[0]
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, service
    httpd.shutdown()
    t.join(timeout=30)


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, body, content_type):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _jpeg(img):
    ok, buf = cv2.imencode(".jpg", img[..., ::-1])
    assert ok
    return buf.tobytes()


def test_healthz_reports_warm_and_metadata(server):
    code, body = _get(server[0] + "/healthz")
    assert code == 200
    assert body["status"] == "ok"
    assert body["dataset"] == "coco" and body["fixed_slots"] == 4


def test_pose_json_body_with_precomputed_boxes(server):
    img = np.random.default_rng(0).integers(0, 255, (240, 320, 3), np.uint8)
    payload = {"image": base64.b64encode(_jpeg(img)).decode(),
               "boxes": [[40.0, 30.0, 280.0, 220.0, 0.9]]}
    code, body = _post(server[0] + "/pose", json.dumps(payload).encode(),
                       "application/json")
    assert code == 200, body
    kps = body["keypoints"]
    assert len(kps) == 1
    (kp,) = kps.values()
    assert np.asarray(kp).shape == (17, 3)
    assert body["ms"] > 0 and len(body["scores"]) == 1


def test_pose_raw_image_without_detector_is_a_client_error(server):
    # server has no --yolo: a raw image body can't be detected
    img = np.zeros((64, 64, 3), np.uint8)
    code, body = _post(server[0] + "/pose", _jpeg(img), "image/jpeg")
    assert code == 400 and "boxes" in body["error"]


def test_pose_garbage_body_is_a_client_error(server):
    code, body = _post(server[0] + "/pose", b"not an image", "image/jpeg")
    assert code == 400 and "error" in body


def test_metrics_count_requests_and_errors(server):
    """Self-sufficient (runs under test selection / random order): issues
    its own success + error and asserts the counters moved."""
    before = _get(server[0] + "/metrics")[1]
    img = np.random.default_rng(3).integers(0, 255, (128, 128, 3), np.uint8)
    payload = json.dumps({
        "image": base64.b64encode(_jpeg(img)).decode(),
        "boxes": [[10.0, 10.0, 100.0, 100.0, 0.9]]}).encode()
    assert _post(server[0] + "/pose", payload, "application/json")[0] == 200
    assert _post(server[0] + "/pose", b"garbage", "image/jpeg")[0] == 400
    code, after = _get(server[0] + "/metrics")
    assert code == 200
    assert after["requests"] == before["requests"] + 1
    assert after["errors"] == before["errors"] + 1
    assert after["latency_ms_p95"] >= after["latency_ms_p50"] > 0


def test_oversized_body_rejected_413(server):
    req = urllib.request.Request(
        server[0] + "/pose", data=b"x", method="POST",
        headers={"Content-Type": "image/jpeg",
                 "Content-Length": str(1 << 30)})
    # urllib would block trying to send 1 GiB it doesn't have; hand-set
    # the header and a tiny body via a raw socket instead
    import socket
    host, port = server[0].replace("http://", "").split(":")
    with socket.create_connection((host, int(port)), timeout=60) as s:
        s.sendall((f"POST /pose HTTP/1.1\r\nHost: {host}\r\n"
                   f"Content-Type: image/jpeg\r\n"
                   f"Content-Length: {1 << 30}\r\n\r\n").encode())
        s.sendall(b"tiny")
        resp = s.recv(4096).decode()
    assert "413" in resp.split("\r\n")[0]


def test_unknown_route_404(server):
    try:
        urllib.request.urlopen(server[0] + "/nope", timeout=60)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_shape_bucketing_matches_direct_inference(server):
    """An odd-resolution request is zero-padded onto the 64-px shape grid;
    padding must not change the keypoints vs direct VitInference on the
    raw image (content stays at the origin, crops never read the margin)."""
    url, service = server
    from easy_vitpose_tpu.cli.serve_http import _bucket_pad
    img = np.random.default_rng(2).integers(0, 255, (233, 317, 3), np.uint8)
    padded = _bucket_pad(img)
    assert padded.shape == (256, 320, 3)
    np.testing.assert_array_equal(padded[:233, :317], img)
    assert not padded[233:].any() and not padded[:, 317:].any()
    # same-shape input passes through untouched (no copy-of-a-copy)
    assert _bucket_pad(padded) is padded

    boxes = np.array([[30.0, 20.0, 300.0, 215.0, 0.9]], np.float32)
    payload = json.dumps({
        "image": base64.b64encode(_jpeg(img)).decode(),
        "boxes": boxes.tolist()}).encode()
    code, body = _post(url + "/pose", payload, "application/json")
    assert code == 200, body

    # run the model directly on the raw (unpadded) image the server
    # decoded — JPEG is lossy, so decode the same bytes
    raw = cv2.imdecode(np.frombuffer(_jpeg(img), np.uint8),
                       cv2.IMREAD_COLOR)[..., ::-1]
    with service._lock:
        direct = service.model.inference(raw, bboxes=boxes)
        service.model.reset()
    np.testing.assert_allclose(
        np.asarray(list(body["keypoints"].values())),
        np.stack(list(direct.values())), atol=1e-4)


@pytest.fixture(scope="module")
def batch_server(tmp_path_factory):
    """A second server with micro-batching on (25 ms window, 2-frame cap),
    sharing nothing with the plain `server` fixture."""
    import jax
    from easy_vitpose_tpu.cli import serve_http
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
    from easy_vitpose_tpu.detect.yolo import YoloSpec, init_yolo_params

    d = tmp_path_factory.mktemp("wb")
    ck = d / "vitpose-s-coco.npz"
    save_params(str(ck), init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))
    yp = d / "yolov8n.npz"
    save_yolo_npz(str(yp),
                  init_yolo_params(jax.random.PRNGKey(1), YoloSpec("n")),
                  "n", 80)
    ready = threading.Event()
    box: list = []
    t = threading.Thread(
        target=serve_http.main,
        args=(["--model", str(ck), "--model-name", "s", "--port", "0",
               "--dtype", "fp32", "--fixed-slots", "4",
               "--yolo", str(yp), "--yolo-size", "160",
               "--batch-window-ms", "25", "--batch-max-frames", "2"],
              ready, box),
        daemon=True)
    t.start()
    assert ready.wait(timeout=600)
    httpd, service = box[0]
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()
    t.join(timeout=30)


def _pose_payload(img, boxes):
    return json.dumps({"image": base64.b64encode(_jpeg(img)).decode(),
                       "boxes": boxes}).encode()


def test_microbatch_single_request_works(batch_server):
    url, _ = batch_server
    img = np.random.default_rng(5).integers(0, 255, (128, 128, 3), np.uint8)
    code, body = _post(url + "/pose",
                       _pose_payload(img, [[10.0, 10.0, 100.0, 100.0, 0.7]]),
                       "application/json")
    assert code == 200, body
    assert body["batched_frames"] == 1
    assert np.asarray(body["keypoints"]["0"]).shape == (17, 3)
    assert body["scores"]["0"] == pytest.approx(0.7)


def test_microbatch_detector_mode_raw_image(batch_server):
    """Raw image bodies (no boxes) route through the batched YOLO pass:
    concurrent posts coalesce and each gets a well-formed response
    (random detector weights on noise: usually zero detections)."""
    url, _ = batch_server
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (128, 128, 3), np.uint8) for _ in range(2)]
    results = [None, None]

    def _go(i):
        results[i] = _post(url + "/pose", _jpeg(imgs[i]), "image/jpeg")

    ts = [threading.Thread(target=_go, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    for code, body in results:
        assert code == 200, body
        assert "keypoints" in body and "batched_frames" in body
        for kp in body["keypoints"].values():
            assert np.asarray(kp).shape == (17, 3)


def test_microbatch_coalesces_and_matches_plain(server, batch_server):
    """Concurrent same-shape requests coalesce into one multi-frame
    program, and the batched keypoints equal the plain (lock-serialized)
    server's for the same image+boxes."""
    url, _ = batch_server
    rng = np.random.default_rng(6)
    imgs = [rng.integers(0, 255, (128, 128, 3), np.uint8) for _ in range(4)]
    # last request: an out-of-frame box — must equal the plain path too
    # (crop_geometry clips identically on both paths)
    boxes = [[[8.0 + i, 6.0, 110.0, 120.0, 0.9]] for i in range(3)] \
        + [[[-20.0, -15.0, 400.0, 300.0, 0.9]]]

    payloads = [_pose_payload(imgs[i], boxes[i]) for i in range(4)]
    results = [None] * 4
    # timing-sensitive (requests must land inside the 25 ms server
    # window): synchronize the posts with a barrier and retry the round
    # a few times before calling it a failure
    for _ in range(4):
        barrier = threading.Barrier(4)

        def _go(i):
            barrier.wait()
            results[i] = _post(url + "/pose", payloads[i],
                               "application/json")

        threads = [threading.Thread(target=_go, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(r is not None and r[0] == 200 for r in results), results
        if any(r[1]["batched_frames"] == 2 for r in results):
            break
    else:
        raise AssertionError(
            "no pair coalesced in 4 barrier-synchronized rounds: "
            f"{[r[1]['batched_frames'] for r in results]}")

    # equality vs the plain server (same fp32 decode math, no batching)
    plain_url = server[0]
    for i in range(4):
        code, plain = _post(plain_url + "/pose",
                            _pose_payload(imgs[i], boxes[i]),
                            "application/json")
        assert code == 200
        np.testing.assert_allclose(
            np.asarray(results[i][1]["keypoints"]["0"]),
            np.asarray(list(plain["keypoints"].values())[0]), atol=1e-3)


def test_max_requests_shuts_down_cleanly(tmp_path):
    """--max-requests N exits the serve loop after N pose requests — the
    kill-free shutdown used for TPU smoke runs (killing a TPU-attached
    process wedges the device tunnel)."""
    import jax
    from easy_vitpose_tpu.cli import serve_http
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ck = tmp_path / "vitpose-s-coco.npz"
    save_params(str(ck), init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))
    ready = threading.Event()
    box: list = []
    t = threading.Thread(
        target=serve_http.main,
        args=(["--model", str(ck), "--model-name", "s", "--port", "0",
               "--dtype", "fp32", "--fixed-slots", "4",
               "--max-requests", "1", "--warmup-shapes", "100x150"],
              ready, box),
        daemon=True)
    t.start()
    assert ready.wait(timeout=600)
    url = f"http://127.0.0.1:{box[0][0].server_address[1]}"
    img = np.zeros((128, 128, 3), np.uint8)
    payload = json.dumps({
        "image": base64.b64encode(_jpeg(img)).decode(),
        "boxes": [[10.0, 10.0, 100.0, 100.0, 0.9]]}).encode()
    code, _ = _post(url + "/pose", payload, "application/json")
    assert code == 200
    t.join(timeout=120)
    assert not t.is_alive(), "server did not shut down after max-requests"


def test_requests_are_stateless_and_repeatable(server):
    img = np.random.default_rng(1).integers(0, 255, (240, 320, 3), np.uint8)
    payload = json.dumps({
        "image": base64.b64encode(_jpeg(img)).decode(),
        "boxes": [[40.0, 30.0, 280.0, 220.0, 0.9]]}).encode()
    _, a = _post(server[0] + "/pose", payload, "application/json")
    _, b = _post(server[0] + "/pose", payload, "application/json")
    assert list(a["keypoints"]) == list(b["keypoints"])  # ids don't drift
    np.testing.assert_allclose(
        np.asarray(list(a["keypoints"].values())),
        np.asarray(list(b["keypoints"].values())), rtol=0, atol=0)
