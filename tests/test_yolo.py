"""YOLOv8-in-JAX tests: architecture shapes, conv+BN fold parity vs torch,
DFL decode math, fixed-shape NMS vs a numpy greedy oracle, and the
ultralytics state-dict converter (synthetic weights, shape/structure parity).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.detect import yolo as Y
from easy_vitpose_tpu.convert import yolo_torch as CYT


def test_spec_widths():
    assert Y.YoloSpec("n").widths == (16, 32, 64, 128, 256)
    assert Y.YoloSpec("s").widths == (32, 64, 128, 256, 512)
    assert Y.YoloSpec("x").widths == (80, 160, 320, 640, 640)
    assert Y.YoloSpec("n").depths == (1, 2, 2, 1)
    assert Y.YoloSpec("l").depths == (3, 6, 6, 3)


def test_forward_shapes():
    spec = Y.YoloSpec("n")
    params = Y.init_yolo_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, 320, 320, 3))
    outs = Y.yolo_forward(params, x, spec)
    assert [tuple(o.shape) for o in outs] == [
        (1, 40, 40, 4 * Y.REG_MAX + 80),
        (1, 20, 20, 4 * Y.REG_MAX + 80),
        (1, 10, 10, 4 * Y.REG_MAX + 80)]


def test_conv_bn_fold_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    cin, cout, k = 8, 16, 3
    conv = torch.nn.Conv2d(cin, cout, k, stride=2, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
    bn.eval()
    with torch.no_grad():
        conv.weight.normal_()
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_()
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        x = torch.randn(1, cin, 16, 16)
        ref = torch.nn.functional.silu(bn(conv(x))).numpy()
    sd = {"c.weight": conv.weight.detach().numpy(),
          "b.weight": bn.weight.detach().numpy(),
          "b.bias": bn.bias.detach().numpy(),
          "b.running_mean": bn.running_mean.numpy(),
          "b.running_var": bn.running_var.numpy()}
    p = CYT._fold_conv_bn(sd, "c", "b")
    y = Y.conv_bn_silu(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                       {"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])},
                       stride=2)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_dfl_decode_math():
    """One-hot DFL logits at bin d must decode to distance d around anchors."""
    nc = 80
    H = W = 4
    stride = Y.STRIDES[0]
    raw = np.full((1, H, W, 4 * Y.REG_MAX + nc), -20.0, np.float32)
    d = [3, 2, 5, 1]  # l, t, r, b distances in cells
    for side, dist in enumerate(d):
        raw[..., side * Y.REG_MAX + dist] = 20.0  # ~one-hot after softmax
    outs = [jnp.asarray(raw),
            jnp.zeros((1, 2, 2, 4 * Y.REG_MAX + nc)),
            jnp.zeros((1, 1, 1, 4 * Y.REG_MAX + nc))]
    boxes, scores = Y.decode_detections(outs, nc)
    b = np.asarray(boxes)[0, 0]  # anchor (0.5, 0.5) on level 0
    np.testing.assert_allclose(
        b, [(0.5 - 3) * stride, (0.5 - 2) * stride,
            (0.5 + 5) * stride, (0.5 + 1) * stride], atol=1e-3)


def _nms_numpy(boxes, scores, iou_t):
    """Greedy NMS oracle."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter + 1e-9)
        order = rest[iou <= iou_t]
    return keep


def test_nms_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    n = 200
    centers = rng.uniform(20, 300, (n, 2))
    wh = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    cls = np.zeros(n, np.int32)

    conf_t, iou_t = 0.25, 0.7
    sel = scores > conf_t
    ref_keep = _nms_numpy(boxes[sel], scores[sel], iou_t)
    ref_scores = np.sort(scores[sel][ref_keep])[::-1]

    b, s, c, v = Y.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.asarray(cls), iou_threshold=iou_t,
                             conf_threshold=conf_t, max_det=300)
    got_scores = np.asarray(s)[np.asarray(v).astype(bool)]
    np.testing.assert_allclose(np.sort(got_scores)[::-1], ref_scores,
                               atol=1e-6)


def test_nms_class_aware():
    """Identical overlapping boxes of different classes both survive."""
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    cls = np.array([0, 1], np.int32)
    _, s, _, v = Y.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.asarray(cls), max_det=10)
    assert int(np.asarray(v).sum()) == 2
    _, s, _, v = Y.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.asarray(cls), max_det=10, class_agnostic=True)
    assert int(np.asarray(v).sum()) == 1


def test_letterbox_geometry():
    r, nw, nh, left, top, cw, ch = Y.letterbox_geometry(480, 640, 320)
    assert (r, nw, nh) == (0.5, 320, 240)
    assert left == 0 and top == 40
    assert (cw, ch) == (320, 320)
    # rect mode: canvas rounds the scaled size up to the stride multiple
    r2, nw2, nh2, l2, t2, cw2, ch2 = Y.letterbox_geometry(480, 640, 320,
                                                          rect=True)
    assert (nw2, nh2) == (320, 240)
    assert (cw2, ch2) == (320, 256)   # 240 -> 256 (stride 32)
    assert t2 == 8 and l2 == 0
    cv2 = pytest.importorskip("cv2")
    # sampled letterbox vs cv2 resize + pad (float path)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (480, 640, 3), np.uint8)
    ref_small = cv2.resize(frame.astype(np.float32), (nw, nh),
                           interpolation=cv2.INTER_LINEAR)
    ref = np.full((320, 320, 3), 114.0, np.float32)
    ref[top:top + nh, left:left + nw] = ref_small
    got = np.asarray(Y.letterbox_sample(jnp.asarray(frame), 320, r, nw, nh,
                                        left, top))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_converter_structure_roundtrip():
    """Synthetic ultralytics-style state dict -> converter -> same pytree
    structure/shapes as init_yolo_params, and forward runs."""
    spec = Y.YoloSpec("n")
    ref_params = Y.init_yolo_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)

    sd = {}

    def add_conv_bn(prefix, w):
        cout, cin = w.shape[3], w.shape[2]
        k = w.shape[0]
        sd[prefix + ".conv.weight"] = rng.normal(
            size=(cout, cin, k, k)).astype(np.float32)
        sd[prefix + ".bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[prefix + ".bn.bias"] = rng.normal(size=cout).astype(np.float32)
        sd[prefix + ".bn.running_mean"] = rng.normal(size=cout).astype(np.float32)
        sd[prefix + ".bn.running_var"] = rng.uniform(0.5, 2, cout).astype(np.float32)

    def walk(tree, prefix):
        if isinstance(tree, dict) and "w" in tree:
            add_conv_bn(prefix, np.asarray(tree["w"]))
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}.{i}")

    # build sd with ultralytics names from the reference structure
    m = ref_params["model"]
    for i in ("0", "1", "3", "5", "7", "16", "19"):
        add_conv_bn(f"model.{i}", np.asarray(m[i]["w"]))
    for i, n in (("2", spec.depths[0]), ("4", spec.depths[1]),
                 ("6", spec.depths[1]), ("8", spec.depths[3]),
                 ("12", spec.depths[3]), ("15", spec.depths[3]),
                 ("18", spec.depths[3]), ("21", spec.depths[3])):
        add_conv_bn(f"model.{i}.cv1", np.asarray(m[i]["cv1"]["w"]))
        add_conv_bn(f"model.{i}.cv2", np.asarray(m[i]["cv2"]["w"]))
        for j in range(n):
            add_conv_bn(f"model.{i}.m.{j}.cv1", np.asarray(m[i]["m"][j]["cv1"]["w"]))
            add_conv_bn(f"model.{i}.m.{j}.cv2", np.asarray(m[i]["m"][j]["cv2"]["w"]))
    add_conv_bn("model.9.cv1", np.asarray(m["9"]["cv1"]["w"]))
    add_conv_bn("model.9.cv2", np.asarray(m["9"]["cv2"]["w"]))
    for li in range(3):
        for br in ("cv2", "cv3"):
            for j in range(2):
                add_conv_bn(f"model.22.{br}.{li}.{j}",
                            np.asarray(m["22"][br][li][j]["w"]))
            w = np.asarray(m["22"][br][li][2]["w"])
            sd[f"model.22.{br}.{li}.2.weight"] = rng.normal(
                size=(w.shape[3], w.shape[2], 1, 1)).astype(np.float32)
            sd[f"model.22.{br}.{li}.2.bias"] = rng.normal(
                size=w.shape[3]).astype(np.float32)

    params = CYT.convert_yolo_state_dict(sd, spec)
    # identical tree structure + shapes
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref_params)
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), params)
    assert ref_shapes == got_shapes
    outs = Y.yolo_forward(jax.tree.map(jnp.asarray, params),
                          jnp.zeros((1, 64, 64, 3)), spec)
    assert outs[0].shape == (1, 8, 8, 4 * Y.REG_MAX + 80)


def test_rect_mode_detections_close_to_square():
    """rect letterbox must produce (nearly) the same detections as square —
    same scale r, same content, less padding."""
    import tempfile, os
    from easy_vitpose_tpu.convert.yolo_torch import save_yolo_npz
    params = Y.init_yolo_params(jax.random.PRNGKey(0), Y.YoloSpec("n"))
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (96, 160, 3), np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "yolov8n.npz")
        save_yolo_npz(p, params, "n", 80)
        sq = Y.YoloDetector(p, imgsz=160, conf=-0.5)
        rc = Y.YoloDetector(p, imgsz=160, conf=-0.5, rect=True)
        a = sq(frame)
        b = rc(frame)
    # random weights give near-tied scores, so NMS order differs between the
    # two paddings; compare as sets: every top-b box must have a close match
    # among the a boxes (content & scale identical)
    n = min(len(a), len(b), 5)
    assert n > 0
    for row in b[:n]:
        d = np.abs(a[:, :4] - row[:4]).max(axis=1)
        assert d.min() < 1.5, (row, d.min())
