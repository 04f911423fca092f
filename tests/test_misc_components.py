"""Tests for model-split, One-Euro filter, logging, profiling, skeletons."""
import numpy as np
import pytest

from easy_vitpose_tpu.convert.model_split import (SPLIT_NUM_KPTS,
                                                  split_vitpose_plus)
from easy_vitpose_tpu.ops.one_euro import OneEuroFilter
from easy_vitpose_tpu.skeletons import (flip_pairs, joints_dict,
                                        keypoint_names, num_keypoints,
                                        skeleton_bones)


def _fake_moe_sd(depth=2, d=8, hidden=16, shared=5, n_experts=6):
    """Synthetic ViTPose+ layout: fc2 split into shared + per-expert slices,
    one main head + 5 associate heads."""
    rng = np.random.default_rng(0)
    sd = {}
    for i in range(depth):
        p = f"backbone.blocks.{i}.mlp"
        sd[f"{p}.fc1.weight"] = rng.normal(size=(hidden, d)).astype(np.float32)
        sd[f"{p}.fc1.bias"] = rng.normal(size=hidden).astype(np.float32)
        sd[f"{p}.fc2.weight"] = rng.normal(size=(shared, hidden)).astype(np.float32)
        sd[f"{p}.fc2.bias"] = rng.normal(size=shared).astype(np.float32)
        for e in range(n_experts):
            sd[f"{p}.experts.{e}.weight"] = rng.normal(
                size=(d - shared, hidden)).astype(np.float32)
            sd[f"{p}.experts.{e}.bias"] = rng.normal(
                size=d - shared).astype(np.float32)

    def head(prefix, k=133):
        sd[f"{prefix}.deconv_layers.0.weight"] = rng.normal(
            size=(d, 4, 4, 4)).astype(np.float32)
        for idx in (1, 4):
            sd[f"{prefix}.deconv_layers.{idx}.weight"] = np.ones(4, np.float32)
            sd[f"{prefix}.deconv_layers.{idx}.bias"] = np.zeros(4, np.float32)
            sd[f"{prefix}.deconv_layers.{idx}.running_mean"] = np.zeros(4, np.float32)
            sd[f"{prefix}.deconv_layers.{idx}.running_var"] = np.ones(4, np.float32)
        sd[f"{prefix}.deconv_layers.3.weight"] = rng.normal(
            size=(4, 4, 4, 4)).astype(np.float32)
        sd[f"{prefix}.final_layer.weight"] = rng.normal(
            size=(k, 4, 1, 1)).astype(np.float32)
        sd[f"{prefix}.final_layer.bias"] = rng.normal(size=k).astype(np.float32)

    head("keypoint_head", k=17)
    for j in range(5):
        head(f"associate_keypoint_heads.{j}", k=133)
    return sd


def test_split_vitpose_plus():
    sd = _fake_moe_sd()
    out = split_vitpose_plus(sd)
    assert set(out) == {"coco", "aic", "mpii", "ap10k", "apt36k", "wholebody"}
    for ds, s in out.items():
        # fc2 reassembled to full output dim
        assert s["backbone.blocks.0.mlp.fc2.weight"].shape == (8, 16)
        assert not any("expert" in k or "associate" in k for k in s)
        assert s["keypoint_head.final_layer.weight"].shape[0] == \
            SPLIT_NUM_KPTS[ds]
    # coco keeps expert 0: verify the concat content
    np.testing.assert_array_equal(
        out["coco"]["backbone.blocks.0.mlp.fc2.weight"][:5],
        sd["backbone.blocks.0.mlp.fc2.weight"])
    np.testing.assert_array_equal(
        out["coco"]["backbone.blocks.0.mlp.fc2.weight"][5:],
        sd["backbone.blocks.0.mlp.experts.0.weight"])
    np.testing.assert_array_equal(
        out["mpii"]["backbone.blocks.1.mlp.fc2.weight"][5:],
        sd["backbone.blocks.1.mlp.experts.2.weight"])


def test_one_euro_smooths_noise_tracks_motion():
    rng = np.random.default_rng(0)
    t = np.arange(200) / 30.0
    clean = np.stack([100 + 50 * np.sin(t), 200 + 30 * np.cos(t)], -1)
    noisy = clean + rng.normal(0, 3.0, clean.shape)
    f = OneEuroFilter(noisy[0], min_cutoff=0.3, beta=0.05, fps=30.0)
    out = np.stack([noisy[0]] + [f(noisy[i]) for i in range(1, len(t))])
    err_noisy = np.abs(noisy[50:] - clean[50:]).mean()
    err_filt = np.abs(out[50:] - clean[50:]).mean()
    assert err_filt < err_noisy * 0.75  # meaningfully smoother
    assert err_filt < 2.5              # still tracks the moving signal


def test_skeleton_registry_all_datasets():
    expected = {"coco": 17, "coco_25": 25, "wholebody": 133, "mpii": 16,
                "aic": 14, "ap10k": 17, "apt36k": 17, "custom": 18}
    for ds, k in expected.items():
        assert num_keypoints(ds) == k
        assert len(keypoint_names(ds)) == k
        for a, b in skeleton_bones(ds):
            assert 0 <= a < k and 0 <= b < k
    # coco flip pairs match the reference's hand-coded table
    assert set(flip_pairs("coco")) == {(1, 2), (3, 4), (5, 6), (7, 8),
                                       (9, 10), (11, 12), (13, 14), (15, 16)}
    # every non-central wholebody keypoint has a symmetric partner
    assert len(flip_pairs("wholebody")) >= 58


def test_logging_and_profiling():
    from easy_vitpose_tpu.utils.logging import get_logger, print_log
    from easy_vitpose_tpu.utils.profiling import StageTimer
    lg = get_logger("test_lg")
    print_log("hello", lg)
    print_log("quiet", "silent")
    st = StageTimer()
    with st.stage("a"):
        pass
    assert "a" in st.summary()
    assert st.report()



def test_evt_force_cpu_env_pins_cpu_backend():
    """EVT_FORCE_CPU=1 must pin the CPU backend at package import (the
    JAX_PLATFORMS env var is ignored when a TPU plugin is installed)."""
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "-c",
         "import easy_vitpose_tpu, jax; "
         "assert all(d.platform == 'cpu' for d in jax.devices()); "
         "print('ok')"],
        capture_output=True, text=True, timeout=300,
        env={**__import__('os').environ, "EVT_FORCE_CPU": "1"})
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-800:]


def test_persistent_compile_cache_round_trip(tmp_path, monkeypatch):
    """enable_persistent_cache points JAX's persistent compilation cache
    at the resolved directory and a compiled program lands in it; =0
    disables; the first directory wins (process-global cache)."""
    import jax
    import jax.numpy as jnp
    from easy_vitpose_tpu.utils import compile_cache

    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    monkeypatch.setenv("EVT_COMPILE_CACHE", "0")
    assert compile_cache.enable_persistent_cache() is None

    monkeypatch.delenv("EVT_COMPILE_CACHE")
    if jax.default_backend() != "tpu":
        # auto mode is TPU-only (stale XLA:CPU AOT reloads can SIGILL on
        # a different host); an explicit dir below still opts in
        assert compile_cache.enable_persistent_cache() is None

    cache_dir = str(tmp_path / "xla")
    assert compile_cache.enable_persistent_cache(cache_dir) == cache_dir
    # idempotent: a second enable keeps the first directory
    assert compile_cache.enable_persistent_cache("/elsewhere") == cache_dir

    # drop the >=1s-compile-time floor so a CPU test program qualifies
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        x = jnp.arange(7.0) * 3.0  # unique shape/op mix for this test
        jax.jit(lambda a: (a[None, :] * a[:, None]).sum(0) + 41.0)(x)
        import os
        entries = []
        for root, _, files in os.walk(cache_dir):
            entries += files
        assert entries, "no executable was written to the compile cache"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def test_reference_package_name_import_shim():
    """`from easy_ViTPose import VitInference` (the reference's one public
    import line) resolves to our VitInference."""
    import easy_ViTPose

    from easy_vitpose_tpu import VitInference
    assert easy_ViTPose.VitInference is VitInference
    assert easy_ViTPose.__all__ == ["VitInference", "__version__"]
