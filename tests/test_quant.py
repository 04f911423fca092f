"""Int8 (W8A8) quantized serving path (models/quant.py).

Accuracy bounds vs the f32 path, XLA-vs-Pallas-kernel agreement (interpret
mode on CPU), and the VitInference dtype='int8' integration.  TPU A/B
timing lives in scripts/bench_quant.py (PERF.md records the numbers).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.models.quant import (quant_rows, quantize_linear,
                                           quantize_vit_params)
from easy_vitpose_tpu.models.vit import init_vit_params, vit_forward
from easy_vitpose_tpu.models.vitpose import init_vitpose_params


@pytest.fixture(scope="module")
def setup():
    cfg = BackboneConfig(embed_dim=96, depth=2, num_heads=4)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_vit_params({"backbone": params})["backbone"]
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 256, 192, 3),
                          jnp.float32)
    ref = np.asarray(vit_forward(params, x, cfg), np.float32)
    return cfg, params, qparams, x, ref


def test_quantize_linear_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(2), (64, 96)) * \
        jnp.linspace(0.1, 3.0, 96)[None, :]  # per-channel ranges
    wq, s = quantize_linear(w)
    assert wq.dtype == jnp.int8 and s.shape == (96,)
    deq = wq.astype(jnp.float32) * s[None, :]
    # symmetric round-to-nearest: error <= scale/2 per element
    err = np.abs(np.asarray(deq - w))
    assert (err <= np.asarray(s)[None, :] / 2 + 1e-7).all()


def test_quant_rows_zero_row_safe():
    h = jnp.zeros((4, 32))
    q, s = quant_rows(h)
    assert np.asarray(q).sum() == 0 and np.isfinite(np.asarray(s)).all()


def test_q8_xla_close_to_f32(setup):
    cfg, _, qparams, x, ref = setup
    out = np.asarray(vit_forward(qparams, x.astype(jnp.bfloat16), cfg,
                                 block_impl="xla_q8"), np.float32)
    rng = np.ptp(ref)
    # W8A8 per-token dynamic quantization: ~0.5% of range on this 2-layer
    # net (measured 0.0053); gate at 2%
    assert np.abs(out - ref).max() < 0.02 * rng


def test_q8_pallas_kernel_matches_xla(setup):
    cfg, _, qparams, x, ref = setup
    x16 = x.astype(jnp.bfloat16)
    a = np.asarray(vit_forward(qparams, x16, cfg, block_impl="xla_q8"),
                   np.float32)
    b = np.asarray(vit_forward(qparams, x16, cfg,
                               block_impl="pallas_q8_interpret"), np.float32)
    # identical int8 math; differences are bf16 attention op-order + the
    # in-kernel A&S erf (same envelope as the bf16 fused-block test).
    # B=6 with G=2 exercises the pad-to-multiple path.
    assert np.abs(b - a).max() < 0.02 * np.ptp(ref)


def test_q8_requires_quantized_params(setup):
    cfg, params, _, x, _ = setup
    with pytest.raises(AssertionError, match="quantize_vit_params"):
        vit_forward(params, x, cfg, block_impl="xla_q8")


def test_q8_pose_step_keypoints_close():
    """End-to-end: int8 pose_step keypoints stay close to the f32 path on
    smooth (peaked) heatmaps — sub-pixel argmax drift, small score drift."""
    from easy_vitpose_tpu.pipeline.pose_step import pose_step

    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_vit_params(params)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.array([[30, 20, 160, 200], [100, 40, 280, 230]], np.float32)
    mask = np.ones((2,), bool)

    a = np.asarray(pose_step(params, jnp.asarray(frame), jnp.asarray(boxes),
                             jnp.asarray(mask), cfg))
    b = np.asarray(pose_step(qparams, jnp.asarray(frame), jnp.asarray(boxes),
                             jnp.asarray(mask), cfg,
                             compute_dtype=jnp.bfloat16, sampler="matmul",
                             block_impl="xla_q8"))
    # random-weight heatmaps are nearly flat, so argmax can jump between
    # competing near-equal peaks; require the bulk of keypoints close and
    # scores tight everywhere (scores are read at the chosen peak).
    d = np.linalg.norm(a[..., :2] - b[..., :2], axis=-1)
    assert np.median(d) < 12.0, f"median keypoint drift {np.median(d)}"
    assert np.abs(a[..., 2] - b[..., 2]).max() < 0.05


def test_sampler_matmul_q8_close():
    """Int8 x-pass crop sampler vs the bf16/f32 matmul sampler: the exact
    offset-undo means the only error is 2-tap weight rounding (~1 intensity
    level of 255)."""
    from easy_vitpose_tpu.ops.preprocess import (crop_geometry,
                                                 sample_crops_matmul,
                                                 sample_crops_matmul_q8)
    rng = np.random.default_rng(3)
    frame = jnp.asarray(rng.integers(0, 255, (270, 480, 3), np.uint8))
    boxes = jnp.asarray(np.array([[12, 8, 200, 240], [100, 30, 460, 260],
                                  [0, 0, 480, 270], [300, 5, 330, 250]],
                                 np.float32))
    geo = crop_geometry(boxes, (270, 480))
    ref = np.asarray(sample_crops_matmul(frame, geo,
                                         sample_dtype=jnp.float32),
                     np.float32)
    q8 = np.asarray(sample_crops_matmul_q8(frame, geo,
                                           sample_dtype=jnp.float32),
                    np.float32)
    assert np.abs(q8 - ref).max() < 2.0  # intensity units out of 255


def test_vitinference_int8(tmp_path):
    """dtype='int8' through the public API (block_impl xla_q8 on CPU)."""
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.utils.checkpoint import save_params
    from tests.test_model_parity import CASES, load_case
    from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict

    sd, _, _ = load_case("tiny")
    params = convert_vitpose_state_dict(sd, CASES["tiny"])
    path = str(tmp_path / "vitpose-s-coco.npz")
    save_params(path, params)

    m = VitInference(path, model_name="s", model_cfg=CASES["tiny"],
                     dataset="coco", dtype="int8")
    assert m.quant and m._block_impl == "xla_q8"
    # block weights actually int8 on the serving tree
    assert m._params["backbone"]["blocks"]["qkv_wq"].dtype == jnp.int8
    img = np.zeros((240, 320, 3), np.uint8)
    img[40:200, 60:260] = np.linspace(0, 255, 200, dtype=np.uint8)[None, :,
                                                                   None]
    boxes = np.array([[40, 30, 160, 200, 0.9]], np.float32)
    out = m.inference(img, bboxes=boxes)
    assert set(out) == {0} and out[0].shape == (17, 3)
    assert np.isfinite(out[0]).all()


def test_int8_flip_test_and_batched(tmp_path):
    """dtype='int8' composes with flip-test averaging and the batched
    window path (xla_q8 on CPU)."""
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.utils.checkpoint import save_params
    from tests.test_model_parity import CASES, load_case
    from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict

    sd, _, _ = load_case("tiny")
    path = str(tmp_path / "vitpose-s-coco.npz")
    save_params(path, convert_vitpose_state_dict(sd, CASES["tiny"]))

    m = VitInference(path, model_name="s", model_cfg=CASES["tiny"],
                     dataset="coco", dtype="int8", flip_test=True,
                     is_video=True)
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (240, 320, 3), np.uint8)
              for _ in range(3)]
    boxes = [np.array([[40, 30, 160, 200, 0.9]], np.float32)] * 3
    outs = m.inference_batched(frames, bboxes_per_frame=boxes)
    assert len(outs) == 3
    for o in outs:
        (k,) = o.values()
        assert k.shape == (17, 3) and np.isfinite(k).all()


def test_q8_trained_model_subpixel_drift():
    """The real int8 accuracy statement: on a TRAINED tiny model (peaked
    heatmaps, loss 4e-3 on its batch), W8A8 keypoints drift from f32 by
    ~0.02 px median / <0.25 px max, scores by <5e-3 — far inside the
    reference's own uint8-resize noise floor."""
    from easy_vitpose_tpu.ops.heatmap import generate_gaussian_targets
    from easy_vitpose_tpu.pipeline.pose_step import pose_step
    from easy_vitpose_tpu.train import step as trainlib

    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(2e-3)
    state = trainlib.init_train_state(params, tx)
    step = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=False))
    rng = np.random.default_rng(0)
    B = 8
    imgs = rng.normal(0, 1, (B, 256, 192, 3)).astype(np.float32)
    joints = np.stack([rng.uniform(20, 172, (B, 17)),
                       rng.uniform(20, 236, (B, 17))], -1).astype(np.float32)
    tg = np.stack([generate_gaussian_targets(j, np.ones((17, 1)))[0]
                   for j in joints])
    batch = {"images": jnp.asarray(imgs), "targets": jnp.asarray(tg),
             "target_weights": jnp.ones((B, 17, 1), jnp.float32)}
    for i in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    assert float(m["loss"]) < 0.006  # peaked heatmaps learned
    trained = trainlib.merge_bn_state(state["params"], state["bn_state"])

    frame = rng.integers(0, 255, (256, 192, 3), np.uint8)
    boxes = np.array([[0, 0, 192, 256]], np.float32)
    mask = np.ones((1,), bool)
    a = np.asarray(pose_step(trained, jnp.asarray(frame),
                             jnp.asarray(boxes), jnp.asarray(mask), cfg))
    q = quantize_vit_params(trained)
    b = np.asarray(pose_step(q, jnp.asarray(frame), jnp.asarray(boxes),
                             jnp.asarray(mask), cfg,
                             compute_dtype=jnp.bfloat16, sampler="matmul",
                             block_impl="xla_q8"))
    d = np.sort(np.linalg.norm(a[..., :2] - b[..., :2], axis=-1).ravel())
    assert np.median(d) < 0.1, f"median int8 drift {np.median(d)} px"
    # the test frame is unseen, so a keypoint whose heatmap is bimodal can
    # flip between near-EQUAL peaks (score drift stays ~1e-3 — not an
    # accuracy loss); allow one such flip, bound everything else sub-pixel
    assert d[:-1].max() < 0.5, f"int8 drift (excl. worst) {d[:-1].max()} px"
    assert np.abs(a[..., 2] - b[..., 2]).max() < 0.01
