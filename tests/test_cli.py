"""CLI smoke tests: image and video inference end-to-end (CPU, ViT-S random
weights, precollapsed to run within CI time)."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def vits_ckpt(tmp_path_factory):
    import jax
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params
    p = tmp_path_factory.mktemp("w") / "vitpose-s-coco.npz"
    save_params(str(p), init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))
    return str(p)


def test_infer_cli_image(vits_ckpt, tmp_path):
    from easy_vitpose_tpu.cli.infer import main
    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    ip = str(tmp_path / "img.png")
    cv2.imwrite(ip, img)
    out = str(tmp_path / "out")
    main(["--input", ip, "--model", vits_ckpt, "--model-name", "s",
          "--output-path", out, "--save-json", "--save-img",
          "--dtype", "fp32"])
    assert os.path.exists(os.path.join(out, "img_out.png"))
    with open(os.path.join(out, "img_keypoints.json")) as f:
        data = json.load(f)
    assert "keypoints" in data and "skeleton" in data


def test_infer_cli_video(vits_ckpt, tmp_path):
    from easy_vitpose_tpu.cli.infer import main
    vp = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 10, (160, 120))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.write(rng.integers(0, 255, (120, 160, 3), np.uint8))
    w.release()
    out = str(tmp_path / "out")
    # video path requires VIDEO_EXTS; .avi included
    main(["--input", vp, "--model", vits_ckpt, "--model-name", "s",
          "--output-path", out, "--save-json", "--dtype", "fp32"])
    assert os.path.exists(os.path.join(out, "clip_out.mp4"))
    with open(os.path.join(out, "clip_keypoints.json")) as f:
        data = json.load(f)
    assert len(data["keypoints"]) == 3


@pytest.mark.slow
def test_infer_cli_video_modes_agree(vits_ckpt, tmp_path):
    """The reference's primary entry point is video inference
    (reference inference.py:19-146).  Full e2e: synthetic clip with a
    moving high-contrast 'person' rectangle, a real (random-weight)
    YOLOv8n detector, then the SAME clip through the plain, --pipelined
    and --batch CLI paths — the three modes must produce the same
    per-frame track ids and keypoints, and a playable annotated video."""
    import jax

    from easy_vitpose_tpu.cli.infer import main
    from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
    from easy_vitpose_tpu.detect import yolo as Y

    yolo_p = str(tmp_path / "yolov8n.npz")
    save_yolo_npz(yolo_p,
                  Y.init_yolo_params(jax.random.PRNGKey(0), Y.YoloSpec("n")),
                  "n", 80)

    vp = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 10, (160, 120))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    n_frames = 5
    for t in range(n_frames):
        frame = rng.integers(0, 40, (120, 160, 3), np.uint8)
        x0 = 20 + 6 * t
        frame[20:100, x0:x0 + 40] = (220, 180, 160)  # moving "person"
        w.write(frame)
    w.release()

    results = {}
    for name, extra in [("plain", []), ("pipelined", ["--pipelined"]),
                        ("batch", ["--batch", "3"])]:
        out = str(tmp_path / f"out_{name}")
        main(["--input", vp, "--model", vits_ckpt, "--model-name", "s",
              "--yolo", yolo_p, "--yolo-size", "160", "--single-pose",
              "--output-path", out, "--save-json", "--dtype", "fp32"]
             + extra)
        assert os.path.exists(os.path.join(out, "clip_out.mp4"))
        with open(os.path.join(out, "clip_keypoints.json")) as f:
            results[name] = json.load(f)["keypoints"]

    assert all(len(r) == n_frames for r in results.values())
    for t in range(n_frames):
        ids = {name: sorted(results[name][t]) for name in results}
        assert ids["pipelined"] == ids["plain"], f"frame {t}: {ids}"
        assert ids["batch"] == ids["plain"], f"frame {t}: {ids}"
        for tid in ids["plain"]:
            a = np.asarray(results["plain"][t][tid])
            for other in ("pipelined", "batch"):
                np.testing.assert_allclose(
                    np.asarray(results[other][t][tid]), a, atol=1e-3,
                    err_msg=f"{other} diverges at frame {t} track {tid}")

    # annotated output is a playable video with every frame written
    cap = cv2.VideoCapture(os.path.join(str(tmp_path / "out_plain"),
                                        "clip_out.mp4"))
    count = 0
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        assert fr.shape == (120, 160, 3)
        count += 1
    cap.release()
    assert count == n_frames


def test_videoreader_prefetch(tmp_path):
    from easy_vitpose_tpu.utils.io import VideoReader, video_metadata
    vp = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    rng = np.random.default_rng(0)
    frames_in = [rng.integers(0, 255, (48, 64, 3), np.uint8)
                 for _ in range(5)]
    for f in frames_in:
        w.write(f)
    w.release()
    frames = list(VideoReader(vp, prefetch=2))
    assert len(frames) == 5
    assert frames[0].shape == (48, 64, 3)
    frames_sync = list(VideoReader(vp, prefetch=0))
    for a, b in zip(frames, frames_sync):
        np.testing.assert_array_equal(a, b)
    meta = video_metadata(vp)
    assert meta["frames"] == 5 and meta["width"] == 64


def test_train_cli_end_to_end(tmp_path):
    """cli.train main() on a tiny synthetic COCO set, 1 epoch, ViT-S."""
    import json
    from easy_vitpose_tpu.cli.train import main
    root = tmp_path / "coco"
    (root / "train2017").mkdir(parents=True)
    (root / "annotations").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(8):
        img = rng.integers(0, 255, (240, 320, 3), np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(root / "train2017" / name), img)
        images.append({"id": i, "file_name": name, "width": 320,
                       "height": 240})
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(40, 280, 17)
        kp[:, 1] = rng.uniform(40, 200, 17)
        kp[:, 2] = 2
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "keypoints": kp.ravel().tolist(), "num_keypoints": 17,
            "bbox": [40.0, 40.0, 240.0, 160.0], "area": 240.0 * 160.0,
            "iscrowd": 0})
    ann = {"images": images, "annotations": annotations}
    for v in ("train2017", "val2017"):
        with open(root / "annotations" / f"person_keypoints_{v}.json",
                  "w") as f:
            json.dump(ann, f)
    (root / "val2017").mkdir()
    for im in images:
        (root / "val2017" / im["file_name"]).symlink_to(
            root / "train2017" / im["file_name"])

    work = str(tmp_path / "run")
    main(["--data-root", str(root), "--model-name", "s", "--dataset", "coco",
          "--epochs", "1", "--batch-size", "8", "--no-amp",
          "--work-dir", work])
    assert os.path.exists(os.path.join(work, "last.npz"))
    with open(os.path.join(work, "history.json")) as f:
        hist = json.load(f)
    assert len(hist) == 1 and np.isfinite(hist[0]["train_loss"])


def test_train_cli_fused_block_impl_tracks_backend():
    """--fused-block selects the Pallas kernels on TPU and their
    interpret-mode twins elsewhere (a compiled Mosaic call would crash
    the CLI on CPU/GPU backends)."""
    from easy_vitpose_tpu.cli.train import _fused_train_impl
    import jax
    expected = ("pallas_train" if jax.default_backend() == "tpu"
                else "pallas_train_interpret")
    assert _fused_train_impl() == expected


def test_infer_cli_trace(vits_ckpt, tmp_path):
    """--trace captures a jax.profiler device trace directory."""
    from easy_vitpose_tpu.cli.infer import main
    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    ip = str(tmp_path / "img.png")
    cv2.imwrite(ip, img)
    trace_dir = str(tmp_path / "trace")
    main(["--input", ip, "--model", vits_ckpt, "--model-name", "s",
          "--dtype", "fp32", "--trace", trace_dir])
    import glob as _glob
    files = _glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True)
    assert files, "no trace artifacts written"


def test_infer_cli_mode_conflicts_fail_before_model_load(tmp_path):
    """--single-dispatch with --pipelined/--batch (and --batch with live
    pacing) must error out BEFORE the expensive model load; pass a
    nonexistent checkpoint path to prove the load is never attempted."""
    from easy_vitpose_tpu.cli.infer import main
    img = np.random.default_rng(0).integers(0, 255, (60, 80, 3), np.uint8)
    ip = str(tmp_path / "img.png")
    cv2.imwrite(ip, img)
    missing = str(tmp_path / "nope" / "vitpose-s-coco.npz")
    base = ["--input", ip, "--model", missing, "--model-name", "s"]
    with pytest.raises(SystemExit, match="single-dispatch"):
        main(base + ["--single-dispatch", "--pipelined"])
    with pytest.raises(SystemExit, match="single-dispatch"):
        main(base + ["--single-dispatch", "--batch", "4"])
    with pytest.raises(SystemExit, match="offline windowed"):
        main(base + ["--batch", "4", "--pipelined"])


def test_infer_cli_single_dispatch_default_stays_out_of_scheduled_modes(
        tmp_path, monkeypatch):
    """--pipelined/--batch reject an EXPLICIT --single-dispatch (above);
    the default-ON resolution (images / --single-pose) must not leak into
    those modes either — the CLI forces the two-program path when the
    flag was not given."""
    from easy_vitpose_tpu.cli import infer as cli_infer

    seen = {}

    class _Capture(Exception):
        pass

    def fake_vitinference(*a, **kw):
        seen.update(kw)
        raise _Capture

    monkeypatch.setattr(cli_infer, "VitInference", fake_vitinference)

    # a real video file so mode resolution reaches the model construction
    vp = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 5, (80, 60))
    frm = np.random.default_rng(0).integers(0, 255, (60, 80, 3), np.uint8)
    for _ in range(3):
        w.write(frm)
    w.release()

    base = ["--input", vp, "--model", "unused.npz", "--model-name", "s",
            "--single-pose"]
    for extra in (["--pipelined"], ["--batch", "2"]):
        seen.clear()
        with pytest.raises((_Capture, AssertionError, SystemExit)):
            cli_infer.main(base + extra)
        assert seen.get("single_dispatch") is False, (extra, seen)

    # plain mode keeps the default-resolution (None -> ctor decides)
    seen.clear()
    with pytest.raises((_Capture, AssertionError, SystemExit)):
        cli_infer.main(base)
    assert seen.get("single_dispatch") is None
