"""Golden tests: jnp decode stack vs the reference numpy/cv2 oracle.

Fixtures in tests/golden/decode_golden.npz were produced by
scripts/make_decode_golden.py running the reference implementation
(reference vit_utils/top_down_eval.py) — regenerate if semantics change.
"""
import os

import numpy as np
import pytest

from easy_vitpose_tpu.ops import decode

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "decode_golden.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN)


def test_get_max_preds_matches_reference(g):
    preds, maxvals = decode.get_max_preds(g["heatmaps"])
    np.testing.assert_array_equal(np.asarray(preds), g["preds_argmax"])
    np.testing.assert_allclose(np.asarray(maxvals), g["maxvals"], rtol=0, atol=0)


def test_gaussian_kernel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    for k in (11, 17):
        ours = decode.gaussian_kernel_1d(k)
        ref = cv2.getGaussianKernel(k, 0).ravel().astype(np.float32)
        np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_gaussian_blur_matches_cv2(g):
    cv2 = pytest.importorskip("cv2")
    hm = g["heatmaps"][:2].copy()
    ref = hm.copy()
    for n in range(ref.shape[0]):
        for k in range(ref.shape[1]):
            cv2.GaussianBlur(ref[n, k], (11, 11), 0, ref[n, k])
    ours = np.asarray(decode.gaussian_blur_2d(hm, 11))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


@pytest.mark.parametrize("kernel,key", [(11, "preds_udp"), (17, "preds_udp_k17")])
def test_post_dark_udp_matches_reference(g, kernel, key):
    preds, _ = decode.get_max_preds(g["heatmaps"])
    refined = decode.post_dark_udp(preds, g["heatmaps"], kernel=kernel)
    # float32 op-ordering noise through log() near the 0.001 clip floor;
    # 2e-2 heatmap px ~= 0.1 image px at typical bbox scales.
    np.testing.assert_allclose(np.asarray(refined), g[key], atol=2e-2)


def test_full_udp_decode_matches_reference(g):
    preds, maxvals = decode.keypoints_from_heatmaps_udp(
        g["heatmaps"], g["centers"], g["scales"], kernel=11)
    np.testing.assert_allclose(np.asarray(preds), g["preds_full"], atol=0.1)
    np.testing.assert_allclose(np.asarray(maxvals), g["maxvals_full"], atol=0)


def test_decode_is_jittable(g):
    import jax
    f = jax.jit(lambda h, c, s: decode.keypoints_from_heatmaps_udp(h, c, s))
    preds, _ = f(g["heatmaps"], g["centers"], g["scales"])
    np.testing.assert_allclose(np.asarray(preds), g["preds_full"], atol=0.1)


def test_pallas_udp_modulate_matches_xla(g):
    """Pallas fused blur+clip+log (interpret mode on CPU) vs the XLA path."""
    from easy_vitpose_tpu.ops.pallas_kernels import udp_modulate_pallas
    import jax.numpy as jnp
    hm = g["heatmaps"][:2]
    ref = np.log(np.clip(np.asarray(decode.gaussian_blur_2d(hm, 11)),
                         0.001, 50.0))
    got = np.asarray(udp_modulate_pallas(jnp.asarray(hm), 11, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pallas_decode_end_to_end(g):
    """Full UDP decode with the Pallas modulation (interpret mode)."""
    from easy_vitpose_tpu.ops import pallas_kernels as PK
    import easy_vitpose_tpu.ops.decode as D
    import functools
    orig = PK.udp_modulate_pallas
    PK.udp_modulate_pallas = functools.partial(orig, interpret=True)
    try:
        preds, maxvals = D.keypoints_from_heatmaps_udp(
            g["heatmaps"], g["centers"], g["scales"], use_pallas=True)
    finally:
        PK.udp_modulate_pallas = orig
    np.testing.assert_allclose(np.asarray(preds), g["preds_full"], atol=0.1)


@pytest.mark.parametrize("pp", ["unbiased", "default", "megvii", "none"])
def test_keypoints_from_heatmaps_post_process_family(g, pp):
    """The non-UDP post-processing family (reference
    top_down_eval.py:493-641): 'unbiased' DARK Taylor step, 'default'
    +/-0.25 shift, 'megvii' (blurred maps, +0.5, rescaled scores), and
    raw argmax — all vs the reference oracle."""
    preds, maxvals = decode.keypoints_from_heatmaps(
        g["heatmaps"], g["centers"], g["scales"],
        post_process=None if pp == "none" else pp,
        kernel=11, use_udp=False)
    preds, want = np.asarray(preds), np.asarray(g[f"preds_{pp}"])
    np.testing.assert_allclose(preds, want, rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(maxvals), g[f"maxvals_{pp}"],
                               rtol=1e-5, atol=1e-6)


def test_unbiased_alias_kwarg(g):
    """unbiased=True must route to the 'unbiased' post-process (the
    reference's deprecated-kwarg path)."""
    a = decode.keypoints_from_heatmaps(
        g["heatmaps"], g["centers"], g["scales"], unbiased=True,
        kernel=11, use_udp=False)[0]
    b = decode.keypoints_from_heatmaps(
        g["heatmaps"], g["centers"], g["scales"], post_process="unbiased",
        kernel=11, use_udp=False)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keypoints_from_heatmaps_udp_dispatch(g):
    """use_udp=True through the front door equals the dedicated UDP path
    (what VitInference.postprocess uses)."""
    a = decode.keypoints_from_heatmaps(
        g["heatmaps"], g["centers"], g["scales"], use_udp=True, kernel=11)
    np.testing.assert_allclose(np.asarray(a[0]), g["preds_full"],
                               rtol=1e-4, atol=2e-3)


def test_keypoints_from_heatmaps3d_matches_reference(g):
    preds, maxvals = decode.keypoints_from_heatmaps3d(
        g["heatmaps3d"], g["centers3d"], g["scales3d"])
    np.testing.assert_allclose(np.asarray(preds), g["preds3d"],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(maxvals), g["maxvals3d"],
                               rtol=0, atol=0)


def test_multilabel_classification_accuracy_matches_reference(g):
    from easy_vitpose_tpu.eval.metrics import (
        multilabel_classification_accuracy)
    got2 = multilabel_classification_accuracy(g["ml_pred"], g["ml_gt"],
                                              g["ml_mask2"])
    got1 = multilabel_classification_accuracy(g["ml_pred"], g["ml_gt"],
                                              g["ml_mask1"])
    assert got2 == pytest.approx(float(g["ml_acc2"]), abs=1e-12)
    assert got1 == pytest.approx(float(g["ml_acc1"]), abs=1e-12)
    # no valid samples -> 0.0 (reference behavior)
    assert multilabel_classification_accuracy(
        g["ml_pred"], g["ml_gt"], np.zeros_like(g["ml_mask1"])) == 0.0


@pytest.mark.parametrize("pp", ["unbiased", "default", "megvii"])
def test_post_process_family_odd_shapes(g, pp):
    """Same family on a (4, 21, 96, 72) set with kernel=17 — guards the
    vectorized indexing across non-default shapes."""
    preds, maxvals = decode.keypoints_from_heatmaps(
        g["heatmaps2"], g["centers2"], g["scales2"],
        post_process=pp, kernel=17, use_udp=False)
    np.testing.assert_allclose(np.asarray(preds), g[f"preds2_{pp}"],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(maxvals), g[f"maxvals2_{pp}"],
                               rtol=1e-5, atol=1e-6)
