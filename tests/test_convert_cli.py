"""Convert-CLI plumbing test: reference-format torch .pth -> native .npz."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _reference_format_state_dict(cfg):
    """Build a random state dict with the reference's key names/shapes
    (the inverse of convert/vitpose_torch.py's layout mapping)."""
    rng = np.random.default_rng(0)
    bb = cfg.backbone
    D = bb.embed_dim
    hid = int(D * bb.mlp_ratio)
    sd = {}

    def t(shape):
        return torch.from_numpy(rng.normal(size=shape).astype(np.float32))

    sd["backbone.patch_embed.proj.weight"] = t((D, 3, 16, 16))
    sd["backbone.patch_embed.proj.bias"] = t((D,))
    sd["backbone.pos_embed"] = t((1, bb.num_tokens + 1, D))
    for i in range(bb.depth):
        p = f"backbone.blocks.{i}"
        sd[p + ".norm1.weight"] = t((D,))
        sd[p + ".norm1.bias"] = t((D,))
        sd[p + ".attn.qkv.weight"] = t((3 * D, D))
        sd[p + ".attn.qkv.bias"] = t((3 * D,))
        sd[p + ".attn.proj.weight"] = t((D, D))
        sd[p + ".attn.proj.bias"] = t((D,))
        sd[p + ".norm2.weight"] = t((D,))
        sd[p + ".norm2.bias"] = t((D,))
        sd[p + ".mlp.fc1.weight"] = t((hid, D))
        sd[p + ".mlp.fc1.bias"] = t((hid,))
        sd[p + ".mlp.fc2.weight"] = t((D, hid))
        sd[p + ".mlp.fc2.bias"] = t((D,))
    sd["backbone.last_norm.weight"] = t((D,))
    sd["backbone.last_norm.bias"] = t((D,))
    cin = D
    for i, f in enumerate(cfg.head.deconv_filters):
        base = f"keypoint_head.deconv_layers.{3 * i}"
        sd[base + ".weight"] = t((cin, f, 4, 4))
        bn = f"keypoint_head.deconv_layers.{3 * i + 1}"
        sd[bn + ".weight"] = t((f,))
        sd[bn + ".bias"] = t((f,))
        sd[bn + ".running_mean"] = t((f,))
        sd[bn + ".running_var"] = torch.from_numpy(
            rng.uniform(0.5, 2, f).astype(np.float32))
        cin = f
    K = cfg.head.num_keypoints
    sd["keypoint_head.final_layer.weight"] = t((K, cin, 1, 1))
    sd["keypoint_head.final_layer.bias"] = t((K,))
    return sd


def test_convert_cli_pth_to_npz(tmp_path):
    from easy_vitpose_tpu.cli.convert import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.utils.checkpoint import load_params
    import jax

    cfg = get_model_config("coco", "s")
    sd = _reference_format_state_dict(cfg)
    pth = str(tmp_path / "vitpose-s-coco.pth")
    torch.save({"state_dict": sd}, pth)
    out = str(tmp_path / "vitpose-s-coco.npz")
    main(["vitpose", "--ckpt", pth, "--model-name", "s", "--out", out])

    params = load_params(out)
    # shape sanity + forward runs
    assert params["backbone"]["pos_embed"].shape == (1, 193, 384)
    from easy_vitpose_tpu.models.vitpose import vitpose_forward
    import jax.numpy as jnp
    y = vitpose_forward(jax.tree.map(jnp.asarray, params),
                        jnp.zeros((1, 256, 192, 3)), cfg)
    assert y.shape == (1, 17, 64, 48)
