"""Fuzz tests: crop geometry vs an independent numpy oracle over random
boxes (including degenerate/edge cases), and NMS under adversarial ties."""
import jax.numpy as jnp
import numpy as np

from easy_vitpose_tpu.detect.yolo import nms_fixed
from easy_vitpose_tpu.ops.preprocess import crop_geometry


def _oracle_geometry(box, H, W):
    """Straight numpy re-derivation of the reference crop math
    (easy_ViTPose/inference.py:252-266 + vit_utils/inference.py:41-70)."""
    b = np.rint(np.asarray(box, np.float64)).astype(int)
    x1 = int(np.clip(b[0] - 10, 0, W))
    y1 = int(np.clip(b[1] - 10, 0, H))
    x2 = int(np.clip(b[2] + 10, 0, W))
    y2 = int(np.clip(b[3] + 10, 0, H))
    wc, hc = max(x2 - x1, 1), max(y2 - y1, 1)
    ar = 3 / 4
    if wc / hc < ar:
        wp = int(ar * hc)
        hp = hc
        left = (wp - wc) // 2
        top = 0
    else:
        wp = wc
        hp = int(wc / ar)
        left = 0
        top = (hp - hc) // 2
    wp, hp = max(wp, wc), max(hp, hc)
    return x1, y1, wc, hc, wp, hp, left, top


def test_crop_geometry_fuzz():
    rng = np.random.default_rng(0)
    H, W = 721, 1283
    n = 2000
    boxes = np.stack([
        rng.uniform(-50, W + 50, n), rng.uniform(-50, H + 50, n),
        rng.uniform(-50, W + 50, n), rng.uniform(-50, H + 50, n)], -1)
    # sort corners so x2>=x1, y2>=y1 mostly; keep some degenerate
    boxes[:, [0, 2]] = np.sort(boxes[:, [0, 2]], axis=1)
    boxes[:, [1, 3]] = np.sort(boxes[:, [1, 3]], axis=1)
    boxes[:50, 2] = boxes[:50, 0]  # zero-width
    # exact .5 rounding cases
    boxes[50:60] = np.round(boxes[50:60]) + 0.5

    geo = crop_geometry(jnp.asarray(boxes, jnp.float32), (H, W))
    geo = {k: np.asarray(v) for k, v in geo.items()}
    for i in range(n):
        x1, y1, wc, hc, wp, hp, left, top = _oracle_geometry(boxes[i], H, W)
        got = (geo["x1"][i], geo["y1"][i], geo["wc"][i], geo["hc"][i],
               geo["wp"][i], geo["hp"][i], geo["left"][i], geo["top"][i])
        assert got == (x1, y1, wc, hc, wp, hp, left, top), (i, boxes[i], got)


def test_nms_exact_under_ties():
    """Many identical scores and heavy overlap: the Jacobi fixpoint must
    still equal the sequential greedy oracle."""
    rng = np.random.default_rng(7)

    def greedy_stable(boxes, scores, iou_t):
        order = np.argsort(-scores, kind="stable")  # top_k tie-break: index
        keep = []
        while len(order):
            i = order[0]
            keep.append(i)
            rest = order[1:]
            xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
            inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            ar = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (ai + ar - inter + 1e-9)
            order = rest[iou <= iou_t]
        return keep
    for trial in range(5):
        n = 120
        centers = rng.uniform(0, 60, (n, 2))  # dense overlap
        wh = rng.uniform(15, 40, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1
                               ).astype(np.float32)
        scores = np.full(n, 0.9, np.float32)
        scores[::7] = 0.95  # a few distinct levels + mass ties
        cls = np.zeros(n, np.int32)
        ref = greedy_stable(boxes[scores > 0.25], scores[scores > 0.25], 0.6)
        b, s, c, v = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                               jnp.asarray(cls), iou_threshold=0.6,
                               conf_threshold=0.25, max_det=150)
        got = np.sort(np.asarray(s)[np.asarray(v).astype(bool)])[::-1]
        want = np.sort(scores[scores > 0.25][ref])[::-1]
        np.testing.assert_allclose(got, want)
        assert len(got) == len(want)
