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
