"""Direct tests for the two utility modules previously covered only
through the pipeline: utils/visualization.py (renderers, reference
vit_utils/visualization.py:360-481) and utils/debug.py (sanitizers,
SURVEY §5 — the reference has none)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


# ---------------------------------------------------------------- viz
def _canvas():
    return np.zeros((120, 160, 3), np.uint8)


def _pts(scores):
    rng = np.random.default_rng(0)
    k = len(scores)
    pts = np.stack([rng.uniform(10, 110, k), rng.uniform(10, 150, k),
                    np.asarray(scores, float)], -1)
    return pts


def test_draw_points_respects_confidence_gate():
    from easy_vitpose_tpu.utils.visualization import draw_points
    img = draw_points(_canvas(), _pts([0.9, 0.9, 0.1]),
                      confidence_threshold=0.5)
    assert img.any()                               # confident points drawn
    blank = draw_points(_canvas(), _pts([0.1, 0.2, 0.3]),
                        confidence_threshold=0.5)
    assert not blank.any()                         # all below gate: no ink


def test_draw_skeleton_bounds_and_gate():
    from easy_vitpose_tpu.utils.visualization import draw_skeleton
    pts = _pts([0.9, 0.9, 0.9])
    # out-of-range bone indices must be skipped, not crash (the reference
    # indexes blind; our skeletons can be truncated per-task)
    img = draw_skeleton(_canvas(), pts, [[0, 1], [1, 2], [2, 99]])
    assert img.any()
    # both endpoints must clear the gate for a bone to draw
    blank = draw_skeleton(_canvas(), _pts([0.9, 0.1, 0.9]), [[0, 1]])
    assert not blank.any()


@pytest.mark.parametrize("dataset", ["coco", "wholebody", "mpii", "ap10k"])
def test_draw_points_and_skeleton_all_registries(dataset):
    """Renderer composes with every skeleton table's bone list."""
    from easy_vitpose_tpu.skeletons import joints_dict
    from easy_vitpose_tpu.utils.visualization import draw_points_and_skeleton
    info = joints_dict()[dataset]
    k = len(info["keypoints"])
    pts = np.stack([np.full(k, 60.0), np.full(k, 80.0),
                    np.full(k, 0.9)], -1)
    img = draw_points_and_skeleton(_canvas(), pts, info["skeleton"])
    assert img.shape == (120, 160, 3) and img.any()


def test_draw_bboxes_labels():
    from easy_vitpose_tpu.utils.visualization import draw_bboxes
    img = draw_bboxes(_canvas(), [[10, 10, 80, 100], [5, 5, 30, 40]],
                      [3, 7], [0.91, 0.42])
    assert img.any()
    # input image is not mutated (draw_bboxes copies; the pipeline relies
    # on this to keep the raw frame for later draws)
    assert not _canvas().any()


# -------------------------------------------------------------- debug
def test_tree_compare_reports_only_diverged_leaves():
    from easy_vitpose_tpu.utils.debug import tree_compare
    a = {"w": np.zeros(3), "b": {"x": np.ones(2)}}
    b = {"w": np.zeros(3), "b": {"x": np.ones(2) + 1e-2}}
    out = tree_compare(a, b, atol=1e-5)
    assert list(out) == ["b/x"]
    assert abs(out["b/x"] - 1e-2) < 1e-9
    assert tree_compare(a, a) == {}


def test_no_jit_context_runs_eagerly():
    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.utils.debug import no_jit

    calls = []

    @jax.jit
    def f(x):
        calls.append(1)          # traced once under jit, every call eagerly
        return x * 2

    f(jnp.ones(2)); f(jnp.ones(2))
    n_traced = len(calls)
    with no_jit():
        f(jnp.ones(2)); f(jnp.ones(2))
    assert len(calls) == n_traced + 2


def test_enable_nan_checks_toggles():
    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.utils.debug import enable_nan_checks
    try:
        enable_nan_checks(True)
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.asarray(-1.0)).block_until_ready()
    finally:
        enable_nan_checks(False)
    assert np.isnan(float(jnp.log(jnp.asarray(-1.0))))
