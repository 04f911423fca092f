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


def test_convert_average_model_soup(tmp_path):
    """'convert average' writes the uniform mean of same-shape checkpoints
    and rejects structure mismatches."""
    import jax
    import numpy as np
    import pytest

    from easy_vitpose_tpu.cli.convert import main
    from easy_vitpose_tpu.configs import get_model_config
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.utils.checkpoint import load_params, save_params

    cfg = get_model_config("coco", "s")
    a = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    b = init_vitpose_params(jax.random.PRNGKey(1), cfg)
    pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_params(pa, a)
    save_params(pb, b)
    out = str(tmp_path / "soup.npz")
    main(["average", "--ckpts", pa, pb, "--out", out])
    soup = load_params(out)
    la = jax.tree.leaves(load_params(pa))
    lb = jax.tree.leaves(load_params(pb))
    for s_, x, y in zip(jax.tree.leaves(soup), la, lb):
        if np.issubdtype(np.asarray(s_).dtype, np.floating):
            np.testing.assert_allclose(
                np.asarray(s_), (np.asarray(x, np.float64)
                                 + np.asarray(y, np.float64)) / 2,
                rtol=1e-6, atol=1e-7)

    # structure mismatch -> explicit error
    import dataclasses
    cfg25 = dataclasses.replace(
        cfg, head=dataclasses.replace(cfg.head, num_keypoints=25))
    pc = str(tmp_path / "c.npz")
    save_params(pc, init_vitpose_params(jax.random.PRNGKey(2), cfg25))
    with pytest.raises(SystemExit):
        main(["average", "--ckpts", pa, pc, "--out", out])
