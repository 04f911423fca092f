"""Stream-parallel multi-stream serving over a device mesh: results must be
identical to the single-device MultiStreamPose (GSPMD data-parallel over the
stream axis; 8-virtual-CPU-device mesh per SURVEY.md §4 strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.parallel.mesh import make_mesh
from easy_vitpose_tpu.pipeline.stream import MultiStreamPose


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4),
        head=HeadConfig(in_channels=96, num_keypoints=17,
                        deconv_filters=(32, 32)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (8, 144, 256, 3), np.uint8)
              for _ in range(3)]  # 3 ticks x 8 streams
    boxes = [[np.array([[10 + si * 3, 8, 120 + si * 3, 130, 0.9]],
                       np.float32) for si in range(8)] for _ in range(3)]
    return cfg, params, frames, boxes


def _run(ms, frames, boxes):
    outs = []
    for t in range(len(frames)):
        outs.append(ms.step(list(frames[t]), boxes_per_stream=boxes[t]))
    return outs


def test_sharded_equals_single_device(setup):
    cfg, params, frames, boxes = setup
    assert len(jax.devices()) == 8
    single = MultiStreamPose(params, cfg, n_streams=8,
                             max_people_per_stream=2,
                             compute_dtype=jnp.float32)
    mesh = make_mesh(axis="batch")
    sharded = MultiStreamPose(params, cfg, n_streams=8,
                              max_people_per_stream=2,
                              compute_dtype=jnp.float32, mesh=mesh)
    a = _run(single, frames, boxes)
    b = _run(sharded, frames, boxes)
    for ta, tb in zip(a, b):
        assert len(ta) == len(tb) == 8
        for sa, sb in zip(ta, tb):
            assert set(sa) == set(sb)
            for tid in sa:
                np.testing.assert_allclose(sb[tid], sa[tid], atol=1e-4)


def test_sharded_multiple_streams_per_device(setup):
    """16 streams on 8 devices (2 per device)."""
    cfg, params, frames, boxes = setup
    mesh = make_mesh(axis="batch")
    ms = MultiStreamPose(params, cfg, n_streams=16,
                         max_people_per_stream=2,
                         compute_dtype=jnp.float32, mesh=mesh)
    f16 = list(frames[0]) + list(frames[1])
    b16 = boxes[0] + boxes[1]
    out = ms.step(f16, boxes_per_stream=b16)
    assert len(out) == 16
    for d in out:
        assert len(d) == 1
        (k,) = d.values()
        assert k.shape == (17, 3) and np.isfinite(k).all()


def test_sharded_requires_divisible_streams(setup):
    cfg, params, _, _ = setup
    mesh = make_mesh(axis="batch")
    with pytest.raises(AssertionError, match="multiple of mesh size"):
        MultiStreamPose(params, cfg, n_streams=6, mesh=mesh)


def test_sharded_pallas_kernel_under_shard_map(setup):
    """The fused Pallas block runs per-device under shard_map (no GSPMD
    partitioning rule needed) — results equal the XLA sharded path."""
    cfg, params, frames, boxes = setup
    mesh = make_mesh(axis="batch")
    a = MultiStreamPose(params, cfg, n_streams=8, max_people_per_stream=2,
                        compute_dtype=jnp.float32, mesh=mesh)
    b = MultiStreamPose(params, cfg, n_streams=8, max_people_per_stream=2,
                        compute_dtype=jnp.float32, mesh=mesh)
    b.block_impl = "pallas_interpret"
    b._sharded_pose = b._build_sharded_pose(mesh, "batch")
    ra = a.step(list(frames[0]), boxes_per_stream=boxes[0])
    rb = b.step(list(frames[0]), boxes_per_stream=boxes[0])
    for sa, sb in zip(ra, rb):
        assert set(sa) == set(sb)
        for tid in sa:
            np.testing.assert_allclose(sb[tid], sa[tid], atol=1e-3)
