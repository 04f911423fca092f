"""ONNX export: wire-format round-trip + numeric parity vs the JAX forward.

The environment has no onnx/onnxruntime, so validation is three-way:
the dependency-free serializer (export/onnx_proto.py) is round-tripped
through its own decoder, and the decoded graph is EXECUTED by an
independent numpy interpreter (export/onnx_ref.py — a from-the-spec
transcription of each op) and compared against
``models/vitpose.py::vitpose_forward`` at f32.  A builder bug (layout,
attribute, op choice) surfaces as a numeric mismatch.

Reference twin: export.py:50-60 (torch.onnx.export, dynamic batch axis).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.export import onnx_proto as P
from easy_vitpose_tpu.export.onnx_ref import run_model
from easy_vitpose_tpu.export.onnx_vitpose import vitpose_to_onnx
from easy_vitpose_tpu.models.vitpose import init_vitpose_params, vitpose_forward

CFG = ModelConfig(
    name="t", dataset="coco",
    backbone=BackboneConfig(embed_dim=64, depth=2, num_heads=4),
    head=HeadConfig(in_channels=64, num_keypoints=5,
                    deconv_filters=(16, 16), deconv_kernels=(4, 4)),
)


def _params():
    """Random params with every zero-init default perturbed — zero biases /
    unit BN stats would mask transposed-weight and swapped-stat bugs."""
    params = init_vitpose_params(jax.random.PRNGKey(0), CFG)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree.unflatten(treedef, leaves)
    for st in params["head"]["bn_state"]:
        st["var"] = jnp.abs(st["var"]) + 0.5   # keep BN var positive
    return params


@pytest.fixture(scope="module")
def blob():
    return vitpose_to_onnx(_params(), CFG)


def test_roundtrip_structure(blob):
    m = P.parse_model(blob)
    assert m.ir_version == 8
    assert m.opset == 17
    assert m.producer_name == "easy_vitpose_tpu"
    g = m.graph
    assert [i[0] for i in g.inputs] == ["input"]
    assert [o[0] for o in g.outputs] == ["output"]
    # dynamic batch axis: dim_param string on axis 0, ints after
    assert g.inputs[0][2] == ["batch_size", 3, 256, 192]
    assert g.outputs[0][2] == ["batch_size", 5, 64, 48]
    ops = {n.op_type for n in g.nodes}
    assert {"Conv", "ConvTranspose", "LayerNormalization", "Softmax",
            "Erf", "BatchNormalization", "MatMul", "Split"} <= ops
    # every node input resolves to an initializer, graph input, or a
    # previous node's output (topological order)
    seen = set(g.initializers) | {i[0] for i in g.inputs}
    for n in g.nodes:
        for i in n.inputs:
            assert i in seen, f"{n.op_type} reads undefined {i!r}"
        seen.update(n.outputs)
    assert g.initializers["patch.w"].shape == (64, 3, 16, 16)
    assert g.initializers["dc0.w"].shape == (64, 16, 4, 4)   # IOHW


def test_tensor_proto_roundtrip():
    arr = np.arange(-4, 8, dtype=np.int64).reshape(3, 4)
    name, back = P._parse_tensor(P.tensor("t", arr))
    assert name == "t" and back.dtype == np.int64
    np.testing.assert_array_equal(back, arr)
    f = np.random.default_rng(0).standard_normal((2, 5)).astype(np.float32)
    _, back = P._parse_tensor(P.tensor("f", f))
    np.testing.assert_array_equal(back, f)


def test_negative_attr_roundtrip():
    n = P._parse_node(P.node("Softmax", ["x"], ["y"], axis=-1))
    assert n.attrs["axis"] == -1
    n = P._parse_node(P.node("Transpose", ["x"], ["y"], perm=[0, 2, 1]))
    assert n.attrs["perm"] == [0, 2, 1]


@pytest.mark.parametrize("batch", [1, 3])
def test_numeric_parity_vs_jax(blob, batch):
    params = _params()
    rng = np.random.default_rng(42)
    x_nhwc = rng.standard_normal((batch, 256, 192, 3)).astype(np.float32)

    want = np.asarray(vitpose_forward(params, jnp.asarray(x_nhwc), CFG))
    (got,) = run_model(blob, {"input": x_nhwc.transpose(0, 3, 1, 2)})

    assert got.shape == want.shape == (batch, 5, 64, 48)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-12)
    assert err < 1e-4, f"onnx-vs-jax rel err {err}"


@pytest.mark.slow
def test_numeric_parity_vits_full():
    """End-to-end parity at the REAL ViT-S config (12x384, 17 keypoints,
    ~90 MB artifact) — the slow-lane twin of the toy-config test above,
    matching the rel-err scale the CLI export run recorded (7.9e-7,
    ROADMAP round-5 notes)."""
    from easy_vitpose_tpu.configs import get_model_config
    cfg = get_model_config("coco", "s")
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    blob = vitpose_to_onnx(params, cfg)

    rng = np.random.default_rng(7)
    x_nhwc = rng.standard_normal((2, 256, 192, 3)).astype(np.float32)
    want = np.asarray(vitpose_forward(params, jnp.asarray(x_nhwc), cfg))
    (got,) = run_model(blob, {"input": x_nhwc.transpose(0, 3, 1, 2)})

    assert got.shape == want.shape == (2, 17, 64, 48)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-12)
    assert err < 1e-5, f"onnx-vs-jax rel err {err} at ViT-S"


def test_unsupported_configs_raise():
    stem_cfg = ModelConfig(
        name="t", dataset="coco",
        backbone=BackboneConfig(embed_dim=64, depth=2, num_heads=4,
                                stem_channels=(8, 8, 8, 8)),
        head=CFG.head)
    with pytest.raises(NotImplementedError):
        vitpose_to_onnx({}, stem_cfg)
    up_cfg = ModelConfig(
        name="t", dataset="coco", backbone=CFG.backbone,
        head=HeadConfig(in_channels=64, num_keypoints=5, deconv_filters=(),
                        deconv_kernels=(), upsample=4, final_conv_kernel=3))
    with pytest.raises(NotImplementedError):
        vitpose_to_onnx({}, up_cfg)


def test_declared_output_shape_follows_deconv_count():
    """The ValueInfo output dims must track 2**n_deconv, not hardcode 4x."""
    cfg1 = ModelConfig(
        name="t", dataset="coco", backbone=CFG.backbone,
        head=HeadConfig(in_channels=64, num_keypoints=5,
                        deconv_filters=(16,), deconv_kernels=(4,)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg1)
    m = P.parse_model(vitpose_to_onnx(params, cfg1))
    Ph, Pw = cfg1.backbone.patch_shape
    assert m.graph.outputs[0][2] == ["batch_size", 5, 2 * Ph, 2 * Pw]
    # and the graph actually produces that shape
    x = np.zeros((1, 3, 256, 192), np.float32)
    (y,) = run_model(vitpose_to_onnx(params, cfg1), {"input": x})
    assert y.shape == (1, 5, 2 * Ph, 2 * Pw)


def test_interpreter_split_sizes_input():
    """Split with an explicit sizes *input* tensor (opset 13+ form)."""
    g = P.graph(
        [P.node("Split", ["x", "sizes"], ["a", "b"], axis=1)],
        "g", inputs=[P.value_info("x", P.FLOAT, [2, 5])],
        outputs=[P.value_info("a", P.FLOAT, [2, 2]),
                 P.value_info("b", P.FLOAT, [2, 3])],
        initializers=[P.tensor("sizes", np.asarray([2, 3], np.int64))])
    x = np.arange(10, dtype=np.float32).reshape(2, 5)
    a, b = run_model(P.model(g), {"x": x})
    np.testing.assert_array_equal(a, x[:, :2])
    np.testing.assert_array_equal(b, x[:, 2:])


def test_interpreter_layernorm_trailing_axes():
    """LayerNormalization normalizes over axis..end per the spec."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    s = np.ones((3, 4), np.float32)
    b = np.zeros((3, 4), np.float32)
    g = P.graph([P.node("LayerNormalization", ["x", "s", "b"], ["y"],
                        axis=1, epsilon=1e-5)],
                "g", inputs=[P.value_info("x", P.FLOAT, [2, 3, 4])],
                outputs=[P.value_info("y", P.FLOAT, [2, 3, 4])],
                initializers=[P.tensor("s", s), P.tensor("b", b)])
    (y,) = run_model(P.model(g), {"x": x})
    mean = x.reshape(2, -1).mean(1).reshape(2, 1, 1)
    var = x.reshape(2, -1).var(1).reshape(2, 1, 1)
    np.testing.assert_allclose(y, (x - mean) / np.sqrt(var + 1e-5),
                               rtol=1e-5, atol=1e-6)


def test_interpreter_rejects_unhandled_attrs():
    """A Conv carrying dilations must error, not silently compute undilated."""
    w = np.zeros((1, 1, 3, 3), np.float32)
    g = P.graph([P.node("Conv", ["x", "w"], ["y"], strides=[1, 1],
                        pads=[1, 1, 1, 1], dilations=[2, 2])],
                "g", inputs=[P.value_info("x", P.FLOAT, [1, 1, 8, 8])],
                outputs=[P.value_info("y", P.FLOAT, [1, 1, 8, 8])],
                initializers=[P.tensor("w", w)])
    with pytest.raises(NotImplementedError, match="dilations"):
        run_model(P.model(g), {"x": np.zeros((1, 1, 8, 8), np.float32)})


def test_packed_repeated_floats_roundtrip():
    """A packed repeated-floats attribute (how torch/onnx emit it) parses
    whole, not first-element-only."""
    vals = [0.5, 1.0, 2.0]
    body = P._f_str(1, "fs")
    body += P._f_bytes(7, np.asarray(vals, np.float32).tobytes())  # packed
    body += P._f_varint(20, P.A_FLOATS)
    n = P._parse_node(P._f_str(4, "X") + P._f_bytes(5, body))
    assert n.attrs["fs"] == vals
    # and our own unpacked encoding still round-trips
    n2 = P._parse_node(P.node("X", [], [], fs=vals))
    assert n2.attrs["fs"] == vals


def test_cli_onnx_rejects_dtype_and_batch(tmp_path):
    from easy_vitpose_tpu.cli import export as export_cli
    with pytest.raises(SystemExit):
        export_cli.main(["--model", "x.npz", "--model-name", "b",
                         "--format", "onnx", "--dtype", "int8",
                         "--out", str(tmp_path / "o.onnx")])
    with pytest.raises(SystemExit):
        export_cli.main(["--model", "x.npz", "--model-name", "b",
                         "--format", "onnx", "--batch", "8",
                         "--out", str(tmp_path / "o.onnx")])


def test_cli_format_onnx(tmp_path, monkeypatch):
    from easy_vitpose_tpu.cli import export as export_cli
    from easy_vitpose_tpu.utils.checkpoint import save_params

    ckpt = tmp_path / "vitpose-t-coco.npz"
    save_params(str(ckpt), _params())
    monkeypatch.setattr("easy_vitpose_tpu.configs.get_model_config",
                        lambda dataset, size, **kw: CFG)
    out = tmp_path / "vitpose-t-coco.onnx"
    export_cli.main(["--model", str(ckpt), "--model-name", "b",
                     "--format", "onnx", "--out", str(out)])
    m = P.parse_model(out.read_bytes())
    assert m.opset == 17 and m.graph.outputs[0][0] == "output"


@pytest.mark.parametrize("seed", range(4))
def test_numeric_parity_fuzzed_configs(seed):
    """Config-fuzz the serializer: random depth/width/heads/K/deconv
    filters (the axes real configs vary on).  A layout or attribute bug
    that happens to cancel at the fixed toy shape shows up here as a
    numeric mismatch against the JAX forward."""
    rng = np.random.default_rng(100 + seed)
    heads = int(rng.choice([2, 4]))
    dim = heads * int(rng.choice([8, 16]))
    cfg = ModelConfig(
        name=f"fz{seed}", dataset="coco",
        backbone=BackboneConfig(embed_dim=dim,
                                depth=int(rng.integers(1, 4)),
                                num_heads=heads),
        head=HeadConfig(in_channels=dim,
                        num_keypoints=int(rng.choice([1, 17, 133])),
                        deconv_filters=tuple(
                            int(f) for f in rng.choice([8, 16, 24],
                                                       size=2)),
                        deconv_kernels=(4, 4)),
    )
    params = init_vitpose_params(jax.random.PRNGKey(seed), cfg)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1000 + seed), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree.unflatten(treedef, leaves)
    for st in params["head"]["bn_state"]:
        st["var"] = jnp.abs(st["var"]) + 0.5

    blob = vitpose_to_onnx(params, cfg)
    x_nhwc = rng.standard_normal((1, 256, 192, 3)).astype(np.float32)
    want = np.asarray(vitpose_forward(params, jnp.asarray(x_nhwc), cfg))
    (got,) = run_model(blob, {"input": x_nhwc.transpose(0, 3, 1, 2)})

    assert got.shape == want.shape
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-12)
    assert err < 1e-4, f"fuzzed cfg {cfg.name}: rel err {err}"
