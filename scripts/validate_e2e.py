"""End-to-end self-consistency validation: overfit a tiny model on synthetic
data, then confirm COCO AP ~= 1 through the inference pipeline.

Validates, in one loop, that these agree geometrically:
  dataset crop warp + Gaussian target rendering  (train side)
  fused crop sampler + UDP decode + un-crop      (inference side)
  OKS COCO AP evaluator                          (eval side)

A model that memorizes its training targets only decodes to the correct
image-space keypoints if BOTH geometries invert each other exactly.  The
eval boxes reproduce each instance's train crop rect (center/scale x1.25,
minus the 10 px inflation inference re-adds).

Expected result (CPU, ~3 min): AP@.50 = 1.0, AP ~ 0.75+ (tight-OKS AP is
bounded by the reference's integer-rounded Gaussian center rendering).
Run: PYTHONPATH=. python scripts/validate_e2e.py
Last verified 2026-08-16: AP = 0.775, AP.5 = 1.000.
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import cv2  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig  # noqa: E402
from easy_vitpose_tpu.models.vitpose import init_vitpose_params  # noqa: E402
from easy_vitpose_tpu.train.dataset import CocoPoseDataset, batch_iterator  # noqa: E402
from easy_vitpose_tpu.train import step as trainlib  # noqa: E402

TINY = ModelConfig(
    name="tiny", dataset="coco",
    backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
    head=HeadConfig(in_channels=96, num_keypoints=17, deconv_filters=(32, 32)))


def build_dataset(root: str, n: int = 6):
    os.makedirs(root + "/train2017", exist_ok=True)
    os.makedirs(root + "/annotations", exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n):
        h, w = 240, 320
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(xx / (7 + 3 * i)), np.cos(yy / (11 + 2 * i)),
                        np.sin((xx + yy) / (13 + i))], -1)
        img = ((img - img.min()) / np.ptp(img) * 255).astype(np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(f"{root}/train2017/{name}", img)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(60, 260, 17)
        kp[:, 1] = rng.uniform(50, 190, 17)
        kp[:, 2] = 2
        x0, y0 = kp[:, 0].min() - 10, kp[:, 1].min() - 10
        bw, bh = kp[:, 0].max() - x0 + 10, kp[:, 1].max() - y0 + 10
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "keypoints": kp.ravel().tolist(), "num_keypoints": 17,
            "bbox": [float(x0), float(y0), float(bw), float(bh)],
            "area": float(bw * bh), "iscrowd": 0})
    with open(f"{root}/annotations/person_keypoints_train2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return images, annotations


def main(epochs: int = 400, ap_gate: float = 0.5):
    root = "/tmp/validate_e2e"
    images, annotations = build_dataset(root)
    ds = CocoPoseDataset(root, "train2017", is_train=True, scale=False,
                         flip_prob=0, rotate_prob=0, half_body_prob=0, seed=0)
    params = init_vitpose_params(jax.random.PRNGKey(0), TINY)
    tx = trainlib.make_optimizer(5e-3)
    state = trainlib.init_train_state(params, tx)
    step = jax.jit(trainlib.make_train_step(TINY, tx, use_amp=False))
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for epoch in range(epochs):
        for batch in batch_iterator(ds, 6, shuffle=False, prefetch=0):
            b = {k: jnp.asarray(v) for k, v in batch.items() if k != "meta"}
            state, m = step(state, b, key)
        if epoch % 100 == 0:
            print(f"epoch {epoch}: loss {float(m['loss']):.6f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.eval.cocoeval import CocoKeypointEval
    from easy_vitpose_tpu.train.step import merge_bn_state
    from easy_vitpose_tpu.utils.checkpoint import save_params
    serving = merge_bn_state(jax.tree.map(np.asarray, state["params"]),
                             jax.tree.map(np.asarray, state["bn_state"]))
    ckpt = f"{root}/vitpose-tiny-coco.npz"
    save_params(ckpt, serving)
    model = VitInference(ckpt, model_name="s", dataset="coco", model_cfg=TINY)

    gt = json.load(open(f"{root}/annotations/person_keypoints_train2017.json"))
    results = []
    for im in images:
        img = cv2.cvtColor(cv2.imread(f"{root}/train2017/" + im["file_name"]),
                           cv2.COLOR_BGR2RGB)
        a = annotations[im["id"]]
        x, y, bw, bh = a["bbox"]
        c, sc = ds._xywh2cs(x, y, bw, bh)
        W2, H2 = sc * 200 / 2
        bb = np.array([[c[0] - W2 + 10, c[1] - H2 + 10,
                        c[0] + W2 - 10, c[1] + H2 - 10, 1.0]], np.float32)
        k = model.inference(img, bboxes=bb)[0]
        flat = np.stack([k[:, 1], k[:, 0], np.zeros_like(k[:, 0])], -1).ravel()
        results.append({"image_id": im["id"], "category_id": 1,
                        "keypoints": flat.tolist(), "score": 1.0})
    stats = CocoKeypointEval(gt, results).accumulate()
    print(f"AP = {stats['AP']:.3f}   AP@.50 = {stats['AP .5']:.3f}")
    assert stats["AP .5"] > 0.95, "pipeline geometry inconsistency!"
    assert stats["AP"] > ap_gate

    # the batched gt-crop eval lane (cli/eval_coco --gt-crops-batched) uses
    # the dataset's own crop geometry, so on a memorized model it must score
    # at least as well as the pipeline lane above
    from easy_vitpose_tpu.cli import eval_coco as ec
    bstats = ec.main([
        "--ann", f"{root}/annotations/person_keypoints_train2017.json",
        "--imgdir", f"{root}/train2017", "--model", ckpt,
        "--model-name", "s", "--dataset", "coco",
        "--gt-crops-batched", "3", "--dtype", "fp32",
        "--out", f"{root}/results_batched.json"], model_cfg=TINY)
    print(f"batched-lane AP = {bstats['AP']:.3f}   "
          f"AP@.50 = {bstats['AP .5']:.3f}")
    assert bstats["AP .5"] > 0.95, "batched-lane geometry inconsistency!"
    assert bstats["AP"] >= stats["AP"] - 0.05

    # Quantization AP gate (docs/QUANTIZATION.md): the int8 (W8A8) serving
    # path must hold AP within the parity envelope of the bf16 path on the
    # memorized model.  BASELINE's checkpoint-parity envelope is 0.3 AP
    # points (0.003 on the 0-1 scale); the tiny 2-layer model is a HARSHER
    # quantization subject than production ViT-B (fewer channels to average
    # error over), so passing here bounds the serving configs.  The int8
    # XLA twin (models/quant.py xla_q8) runs this on CPU.
    qstats = {}
    for dt in ("bf16", "int8"):
        qstats[dt] = ec.main([
            "--ann", f"{root}/annotations/person_keypoints_train2017.json",
            "--imgdir", f"{root}/train2017", "--model", ckpt,
            "--model-name", "s", "--dataset", "coco",
            "--gt-crops-batched", "3", "--dtype", dt,
            "--out", f"{root}/results_{dt}.json"], model_cfg=TINY)
        print(f"{dt}-lane AP = {qstats[dt]['AP']:.4f}   "
              f"AP@.50 = {qstats[dt]['AP .5']:.4f}")
    d_bf16 = qstats["bf16"]["AP"] - bstats["AP"]
    d_int8 = qstats["int8"]["AP"] - qstats["bf16"]["AP"]
    print(f"AP deltas: bf16-fp32 {d_bf16:+.4f}   int8-bf16 {d_int8:+.4f}")
    assert qstats["bf16"]["AP .5"] > 0.95 and qstats["int8"]["AP .5"] > 0.95
    assert abs(d_int8) <= 0.003, \
        f"int8 AP drift {d_int8:+.4f} exceeds the 0.3-point parity envelope"
    print("E2E GEOMETRY VALIDATION PASSED "
          "(pipeline + batched + bf16 + int8 lanes)")
    return {"fp32": bstats, **qstats}


if __name__ == "__main__":
    main()
