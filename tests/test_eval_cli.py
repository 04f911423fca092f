"""End-to-end COCO evaluation CLI test: synthetic val set + gt-bbox mode."""
import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_eval_coco_cli_runs(tmp_path):
    import jax
    from easy_vitpose_tpu.cli.eval_coco import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ckpt = str(tmp_path / "vitpose-s-coco.npz")
    save_params(ckpt, init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))

    imgdir = tmp_path / "val"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(3):
        img = rng.integers(0, 255, (240, 320, 3), np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(imgdir / name), img)
        images.append({"id": i, "file_name": name, "width": 320,
                       "height": 240})
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(60, 260, 17)
        kp[:, 1] = rng.uniform(40, 200, 17)
        kp[:, 2] = 2
        x0, y0 = float(kp[:, 0].min()), float(kp[:, 1].min())
        bw = float(kp[:, 0].max() - x0)
        bh = float(kp[:, 1].max() - y0)
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "keypoints": kp.ravel().tolist(), "num_keypoints": 17,
            "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0})
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)

    out = str(tmp_path / "results.json")
    stats = main(["--ann", ann, "--imgdir", str(imgdir), "--model", ckpt,
                  "--model-name", "s", "--use-gt-bbox", "--dtype", "fp32",
                  "--out", out])
    assert set(stats) >= {"AP", "AR", "AP .5", "AP (M)"}
    with open(out) as f:
        results = json.load(f)
    assert len(results) == 3
    for r in results:
        assert len(r["keypoints"]) == 17 * 3
        assert np.isfinite(r["score"])


def test_eval_coco_gt_crops_batched(tmp_path):
    """--gt-crops-batched: dataset-crop fast path produces one detection
    per gt instance (incl. a non-full tail batch) and a valid AP summary."""
    import jax
    from easy_vitpose_tpu.cli.eval_coco import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ckpt = str(tmp_path / "vitpose-s-coco.npz")
    save_params(ckpt, init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))

    imgdir = tmp_path / "val"
    imgdir.mkdir()
    rng = np.random.default_rng(1)
    images, annotations = [], []
    for i in range(5):
        img = rng.integers(0, 255, (240, 320, 3), np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(imgdir / name), img)
        images.append({"id": i, "file_name": name, "width": 320,
                       "height": 240})
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(60, 260, 17)
        kp[:, 1] = rng.uniform(40, 200, 17)
        kp[:, 2] = 2
        x0, y0 = float(kp[:, 0].min()), float(kp[:, 1].min())
        bw = float(kp[:, 0].max() - x0)
        bh = float(kp[:, 1].max() - y0)
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "keypoints": kp.ravel().tolist(), "num_keypoints": 17,
            "bbox": [x0, y0, bw, bh], "area": bw * bh, "iscrowd": 0})
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)

    out = str(tmp_path / "results.json")
    # batch 2 over 5 instances -> 2 full batches + a 1-row tail (padded)
    stats = main(["--ann", ann, "--imgdir", str(imgdir), "--model", ckpt,
                  "--model-name", "s", "--gt-crops-batched", "2",
                  "--dtype", "fp32", "--out", out])
    assert set(stats) >= {"AP", "AR", "AP .5", "AP (M)"}
    with open(out) as f:
        results = json.load(f)
    assert len(results) == 5
    ids = sorted(r["image_id"] for r in results)
    assert ids == [0, 1, 2, 3, 4]
    for r in results:
        assert len(r["keypoints"]) == 17 * 3
        assert np.isfinite(r["score"])


def test_gt_crops_batched_flip_test_consistency(tmp_path):
    """--flip-test on a horizontally-symmetric model must not move the AP
    summary structure (smoke: runs, finite scores, same detection count)."""
    import jax
    from easy_vitpose_tpu.cli.eval_coco import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ckpt = str(tmp_path / "vitpose-s-coco.npz")
    save_params(ckpt, init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))
    imgdir = tmp_path / "val"
    imgdir.mkdir()
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    cv2.imwrite(str(imgdir / "000000000000.jpg"), img)
    kp = np.zeros((17, 3))
    kp[:, 0] = rng.uniform(60, 260, 17)
    kp[:, 1] = rng.uniform(40, 200, 17)
    kp[:, 2] = 2
    x0, y0 = float(kp[:, 0].min()), float(kp[:, 1].min())
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": [{"id": 0, "file_name": "000000000000.jpg",
                               "width": 320, "height": 240}],
                   "annotations": [{"id": 1, "image_id": 0,
                                    "category_id": 1,
                                    "keypoints": kp.ravel().tolist(),
                                    "num_keypoints": 17,
                                    "bbox": [x0, y0, 100.0, 150.0],
                                    "area": 15000.0, "iscrowd": 0}]}, f)
    out = str(tmp_path / "results.json")
    stats = main(["--ann", ann, "--imgdir", str(imgdir), "--model", ckpt,
                  "--model-name", "s", "--gt-crops-batched", "1",
                  "--dtype", "fp32", "--flip-test", "--out", out])
    assert np.isfinite(stats["AP"]) or stats["AP"] == -1
    with open(out) as f:
        results = json.load(f)
    assert len(results) == 1 and np.isfinite(results[0]["score"])


def test_gt_crops_batched_data_parallel(tmp_path):
    """batch % n_devices == 0 routes the batched eval through the sharded
    forward (params replicated, crops 'data'-sharded over the 8-virtual-
    device mesh) and produces the same detections as implied single-device
    decode semantics (count + finite scores)."""
    import jax
    from easy_vitpose_tpu.cli.eval_coco import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    assert len(jax.devices()) == 8
    ckpt = str(tmp_path / "vitpose-s-coco.npz")
    save_params(ckpt, init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))
    imgdir = tmp_path / "val"
    imgdir.mkdir()
    rng = np.random.default_rng(3)
    images, annotations = [], []
    for i in range(10):
        img = rng.integers(0, 255, (240, 320, 3), np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(imgdir / name), img)
        images.append({"id": i, "file_name": name, "width": 320,
                       "height": 240})
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(60, 260, 17)
        kp[:, 1] = rng.uniform(40, 200, 17)
        kp[:, 2] = 2
        x0, y0 = float(kp[:, 0].min()), float(kp[:, 1].min())
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "keypoints": kp.ravel().tolist(), "num_keypoints": 17,
            "bbox": [x0, y0, 120.0, 160.0], "area": 19200.0, "iscrowd": 0})
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    out = str(tmp_path / "results.json")
    # batch 8 == n_devices -> sharded path; 10 instances -> padded tail
    stats = main(["--ann", ann, "--imgdir", str(imgdir), "--model", ckpt,
                  "--model-name", "s", "--gt-crops-batched", "8",
                  "--dtype", "fp32", "--out", out])
    assert set(stats) >= {"AP", "AR"}
    with open(out) as f:
        results = json.load(f)
    assert len(results) == 10
    assert all(np.isfinite(r["score"]) for r in results)


def test_per_keypoint_report(tmp_path, capsys):
    """--per-keypoint prints a named PCK table from gt-matched instances."""
    import jax
    from easy_vitpose_tpu.cli.eval_coco import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ckpt = str(tmp_path / "vitpose-s-coco.npz")
    save_params(ckpt, init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))
    imgdir = tmp_path / "val"
    imgdir.mkdir()
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    cv2.imwrite(str(imgdir / "000000000000.jpg"), img)
    kp = np.zeros((17, 3))
    kp[:, 0] = rng.uniform(60, 260, 17)
    kp[:, 1] = rng.uniform(40, 200, 17)
    kp[:, 2] = 2
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": [{"id": 0, "file_name": "000000000000.jpg",
                               "width": 320, "height": 240}],
                   "annotations": [{"id": 9, "image_id": 0,
                                    "category_id": 1,
                                    "keypoints": kp.ravel().tolist(),
                                    "num_keypoints": 17,
                                    "bbox": [50.0, 30.0, 220.0, 180.0],
                                    "area": 39600.0, "iscrowd": 0}]}, f)
    main(["--ann", ann, "--imgdir", str(imgdir), "--model", ckpt,
          "--model-name", "s", "--gt-crops-batched", "1",
          "--dtype", "fp32", "--per-keypoint",
          "--out", str(tmp_path / "r.json")])
    out = capsys.readouterr().out
    assert "per-keypoint PCK@0.05" in out
    assert "nose" in out and "mean" in out  # COCO skeleton names resolved


def test_gt_crops_batched_int8(tmp_path):
    """dtype=int8 routes through quantize_vit_params + the q8 block and
    produces finite detections (W8A8 AP-delta lane)."""
    import jax
    from easy_vitpose_tpu.cli.eval_coco import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ckpt = str(tmp_path / "vitpose-s-coco.npz")
    save_params(ckpt, init_vitpose_params(
        jax.random.PRNGKey(0), get_model_config("coco", "s")))
    imgdir = tmp_path / "val"
    imgdir.mkdir()
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    cv2.imwrite(str(imgdir / "000000000000.jpg"), img)
    kp = np.zeros((17, 3))
    kp[:, 0] = rng.uniform(60, 260, 17)
    kp[:, 1] = rng.uniform(40, 200, 17)
    kp[:, 2] = 2
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump({"images": [{"id": 0, "file_name": "000000000000.jpg",
                               "width": 320, "height": 240}],
                   "annotations": [{"id": 1, "image_id": 0,
                                    "category_id": 1,
                                    "keypoints": kp.ravel().tolist(),
                                    "num_keypoints": 17,
                                    "bbox": [50.0, 30.0, 220.0, 180.0],
                                    "area": 39600.0, "iscrowd": 0}]}, f)
    out = str(tmp_path / "r.json")
    stats = main(["--ann", ann, "--imgdir", str(imgdir), "--model", ckpt,
                  "--model-name", "s", "--gt-crops-batched", "1",
                  "--dtype", "int8", "--out", out])
    assert "AP" in stats
    with open(out) as f:
        results = json.load(f)
    assert len(results) == 1 and np.isfinite(results[0]["score"])
