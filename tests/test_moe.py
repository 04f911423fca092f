"""Live ViTPose+ MoE (models/moe.py + convert/vitpose_plus.py).

Ground truth: the reference's OWN split semantics — for every task, the
unsplit multi-task forward must equal the split single-task checkpoint run
through the standard pipeline (split_vitpose_plus -> convert -> forward).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.convert.model_split import split_vitpose_plus
from easy_vitpose_tpu.convert.vitpose_plus import \
    convert_vitpose_plus_state_dict
from easy_vitpose_tpu.convert.vitpose_torch import convert_vitpose_state_dict
from easy_vitpose_tpu.models.moe import vitpose_plus_forward
from easy_vitpose_tpu.models.vitpose import vitpose_forward

D, DEPTH, HEADS, HIDDEN = 96, 2, 4, 384
D_SHARED, D_EXP = 64, 32          # part-shared FFN split (sums to D)
TASKS = ("coco", "aic", "mpii")   # expert 0 = main head, 1-2 = associates
TASK_K = {"coco": 17, "aic": 14, "mpii": 16}

CFG = ModelConfig(
    name="moetiny", dataset="coco",
    backbone=BackboneConfig(embed_dim=D, depth=DEPTH, num_heads=HEADS),
    head=HeadConfig(in_channels=D, num_keypoints=17,
                    deconv_filters=(32, 32)))


def _head_tensors(rng, prefix, k=17):
    sd = {}
    cin = D
    for i, f in enumerate((32, 32)):
        base = f"{prefix}.deconv_layers.{3 * i}"
        sd[base + ".weight"] = rng.normal(0, 0.05,
                                          (cin, f, 4, 4)).astype(np.float32)
        bn = f"{prefix}.deconv_layers.{3 * i + 1}"
        sd[bn + ".weight"] = rng.uniform(0.5, 1.5, f).astype(np.float32)
        sd[bn + ".bias"] = rng.normal(0, 0.1, f).astype(np.float32)
        sd[bn + ".running_mean"] = rng.normal(0, 0.3, f).astype(np.float32)
        sd[bn + ".running_var"] = rng.uniform(0.5, 2.0, f).astype(np.float32)
        cin = f
    # associate heads in the real ckpts carry the max K (133-truncatable);
    # use 17 rows and truncate per task like the splitter does
    sd[f"{prefix}.final_layer.weight"] = rng.normal(
        0, 0.05, (17, cin, 1, 1)).astype(np.float32)
    sd[f"{prefix}.final_layer.bias"] = rng.normal(
        0, 0.02, (17,)).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def plus_sd():
    """Synthetic reference-layout ViTPose+ state dict (3 experts)."""
    rng = np.random.default_rng(0)
    sd = {
        "backbone.patch_embed.proj.weight":
            rng.normal(0, 0.05, (D, 3, 16, 16)).astype(np.float32),
        "backbone.patch_embed.proj.bias":
            rng.normal(0, 0.02, (D,)).astype(np.float32),
        "backbone.pos_embed":
            rng.normal(0, 0.02, (1, 193, D)).astype(np.float32),
        "backbone.last_norm.weight":
            rng.uniform(0.5, 1.5, D).astype(np.float32),
        "backbone.last_norm.bias":
            rng.normal(0, 0.1, D).astype(np.float32),
    }
    for i in range(DEPTH):
        p = f"backbone.blocks.{i}"
        sd[p + ".norm1.weight"] = rng.uniform(0.5, 1.5, D).astype(np.float32)
        sd[p + ".norm1.bias"] = rng.normal(0, 0.1, D).astype(np.float32)
        sd[p + ".norm2.weight"] = rng.uniform(0.5, 1.5, D).astype(np.float32)
        sd[p + ".norm2.bias"] = rng.normal(0, 0.1, D).astype(np.float32)
        sd[p + ".attn.qkv.weight"] = rng.normal(
            0, 0.05, (3 * D, D)).astype(np.float32)
        sd[p + ".attn.qkv.bias"] = rng.normal(
            0, 0.02, (3 * D,)).astype(np.float32)
        sd[p + ".attn.proj.weight"] = rng.normal(
            0, 0.05, (D, D)).astype(np.float32)
        sd[p + ".attn.proj.bias"] = rng.normal(
            0, 0.02, (D,)).astype(np.float32)
        sd[p + ".mlp.fc1.weight"] = rng.normal(
            0, 0.05, (HIDDEN, D)).astype(np.float32)
        sd[p + ".mlp.fc1.bias"] = rng.normal(
            0, 0.02, (HIDDEN,)).astype(np.float32)
        # shared slice: first D_SHARED output features
        sd[p + ".mlp.fc2.weight"] = rng.normal(
            0, 0.05, (D_SHARED, HIDDEN)).astype(np.float32)
        sd[p + ".mlp.fc2.bias"] = rng.normal(
            0, 0.02, (D_SHARED,)).astype(np.float32)
        for e in range(len(TASKS)):
            sd[f"{p}.mlp.experts.{e}.weight"] = rng.normal(
                0, 0.05, (D_EXP, HIDDEN)).astype(np.float32)
            sd[f"{p}.mlp.experts.{e}.bias"] = rng.normal(
                0, 0.02, (D_EXP,)).astype(np.float32)
    sd.update(_head_tensors(rng, "keypoint_head"))
    sd.update(_head_tensors(rng, "associate_keypoint_heads.0"))
    sd.update(_head_tensors(rng, "associate_keypoint_heads.1"))
    return sd


@pytest.fixture(scope="module")
def crops():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.normal(size=(2, 256, 192, 3)).astype(np.float32))


def _split_forward(plus_sd, task, crops):
    split = split_vitpose_plus(plus_sd)[task]
    cfg = dataclasses.replace(
        CFG, head=dataclasses.replace(CFG.head,
                                      num_keypoints=TASK_K[task]))
    params = convert_vitpose_state_dict(split, cfg)
    return np.asarray(vitpose_forward(params, crops, cfg))


@pytest.mark.parametrize("task", TASKS)
def test_live_moe_matches_reference_split(plus_sd, crops, task):
    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    got = np.asarray(vitpose_plus_forward(params, crops, CFG, task))
    want = _split_forward(plus_sd, task, crops)
    assert got.shape == (2, TASK_K[task], 64, 48)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_task_switch_without_recompile(plus_sd, crops):
    """Tasks with the same K share one compiled program (traced expert)."""
    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    from easy_vitpose_tpu.models.moe import vit_plus_forward
    f = jax.jit(vit_plus_forward, static_argnames=("cfg",))
    a = f(params["backbone"], crops, CFG, 0)
    before = f._cache_size()
    b = f(params["backbone"], crops, CFG, 2)
    assert f._cache_size() == before  # expert index is traced
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6  # different experts


def test_onehot_mixed_batch_matches_homogeneous(plus_sd, crops):
    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    from easy_vitpose_tpu.models.moe import vit_plus_forward
    # sample 0 -> expert 0, sample 1 -> expert 2
    onehot = np.zeros((2, 3), np.float32)
    onehot[0, 0] = 1
    onehot[1, 2] = 1
    mixed = np.asarray(vit_plus_forward(params["backbone"], crops, CFG,
                                        expert_onehot=jnp.asarray(onehot)))
    h0 = np.asarray(vit_plus_forward(params["backbone"], crops, CFG,
                                     expert_idx=0))
    h2 = np.asarray(vit_plus_forward(params["backbone"], crops, CFG,
                                     expert_idx=2))
    np.testing.assert_allclose(mixed[0], h0[0], atol=2e-5)
    np.testing.assert_allclose(mixed[1], h2[1], atol=2e-5)


def test_expert_parallel_sharding(plus_sd, crops):
    """EP over a (data, model) mesh: sharded experts, identical output."""
    from easy_vitpose_tpu.parallel import tp as tplib
    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    ref = np.asarray(vitpose_plus_forward(params, crops, CFG, "aic"))
    # E=3: shard over model=3
    mesh = tplib.make_mesh_2d(2, 3)
    sharded = tplib.shard_state(params, mesh)
    ew = sharded["backbone"]["blocks"]["mlp"]["fc2_expert_w"]
    assert ew.sharding.spec == tplib.P(None, "model", None, None)
    assert ew.addressable_shards[0].data.shape[1] == 1  # one expert/shard
    got = np.asarray(vitpose_plus_forward(sharded, crops, CFG, "aic"))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_vitinference_serves_plus_checkpoint(plus_sd, tmp_path):
    """VitInference(task=...) on a 'convert plus' npz: task slicing must
    reproduce the split-checkpoint serving path bit-for-bit (and use the
    fast single-task pipeline)."""
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.convert.vitpose_plus import (
        convert_vitpose_plus_state_dict, select_task)
    from easy_vitpose_tpu.utils.checkpoint import save_params

    plus = str(tmp_path / "vitpose-plus.npz")
    save_params(plus, convert_vitpose_plus_state_dict(plus_sd, CFG))
    frame = np.random.default_rng(2).integers(0, 255, (240, 320, 3), np.uint8)
    boxes = np.array([[30, 20, 160, 200, 0.9]], np.float32)
    for task in TASKS:
        cfg_t = dataclasses.replace(CFG, head=dataclasses.replace(
            CFG.head, num_keypoints=TASK_K[task]))
        m = VitInference(plus, model_name="s", model_cfg=cfg_t, task=task)
        assert m.dataset == task
        got = m.inference(frame, bboxes=boxes)[0]
        split = convert_vitpose_state_dict(split_vitpose_plus(plus_sd)[task],
                                           cfg_t)
        sp = str(tmp_path / f"vitpose-s-{task}.npz")
        save_params(sp, split)
        ref = VitInference(sp, model_name="s", model_cfg=cfg_t,
                           dataset=task).inference(frame, bboxes=boxes)[0]
        np.testing.assert_array_equal(got, ref)
    # task= on a single-task checkpoint is an error
    with pytest.raises(ValueError):
        VitInference(str(tmp_path / "vitpose-s-coco.npz"), model_name="s",
                     model_cfg=CFG, task="mpii")
    # a head missing from the checkpoint names the available tasks
    with pytest.raises(KeyError):
        VitInference(plus, model_name="s", model_cfg=CFG, task="ap10k")


def test_select_task_matches_live_forward(plus_sd, crops):
    from easy_vitpose_tpu.convert.vitpose_plus import (
        convert_vitpose_plus_state_dict, select_task)
    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    for task in TASKS:
        cfg_t = dataclasses.replace(CFG, head=dataclasses.replace(
            CFG.head, num_keypoints=TASK_K[task]))
        single = select_task(params, task)
        a = np.asarray(vitpose_forward(single, crops, cfg_t))
        b = np.asarray(vitpose_plus_forward(params, crops, CFG, task))
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_multitask_finetune_step(plus_sd):
    """Task-alternating finetuning: loss decreases per task; a task's step
    leaves OTHER experts and heads untouched (exact-zero grads)."""
    import optax
    from easy_vitpose_tpu.train import step as steplib
    from easy_vitpose_tpu.train.moe_step import (init_moe_train_state,
                                                 make_moe_train_step)

    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    tx = steplib.make_optimizer(1e-3)
    state = init_moe_train_state(params, tx)
    rng = np.random.default_rng(0)

    def batch(k):
        return {
            "images": jnp.asarray(rng.normal(size=(2, 256, 192, 3))
                                  .astype(np.float32)),
            "targets": jnp.asarray(rng.uniform(0, 1, (2, k, 64, 48))
                                   .astype(np.float32)),
            "target_weights": jnp.ones((2, k, 1), jnp.float32),
        }

    steps = {t: jax.jit(make_moe_train_step(CFG, tx, t, use_amp=False))
             for t in TASKS}

    # WARM the optimizer moments first (one coco step): a shared adam
    # state would otherwise emit nonzero updates for zero grads on later
    # steps — the masked-update path must keep inactive tasks bit-frozen
    # even with warm moments
    state, _ = steps["coco"](state, batch(TASK_K["coco"]),
                             jax.random.PRNGKey(0))
    # one aic step: expert 1 and head 'aic' move; experts 0/2 and other
    # heads must be bit-identical
    b = batch(TASK_K["aic"])
    before = jax.tree.map(np.asarray, state["params"])
    state2, m1 = steps["aic"](state, b, jax.random.PRNGKey(0))
    after = jax.tree.map(np.asarray, state2["params"])
    ew_b = before["backbone"]["blocks"]["mlp"]["fc2_expert_w"]
    ew_a = after["backbone"]["blocks"]["mlp"]["fc2_expert_w"]
    assert np.abs(ew_a[:, 1] - ew_b[:, 1]).max() > 0      # active expert
    np.testing.assert_array_equal(ew_a[:, 0], ew_b[:, 0])  # frozen experts
    np.testing.assert_array_equal(ew_a[:, 2], ew_b[:, 2])
    np.testing.assert_array_equal(
        after["heads"]["coco"]["final_w"], before["heads"]["coco"]["final_w"])
    # optimizer MOMENTS of inactive tasks must also be frozen (torch skips
    # grad=None params: momentum survives until the task reactivates)
    def moments(st):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: np.asarray(x), st["opt_state"])
    mb, ma = moments(state), moments(state2)
    flatb = jax.tree_util.tree_flatten_with_path(mb)[0]
    flata = jax.tree_util.tree_flatten_with_path(ma)[0]
    for (path, vb), (_, va) in zip(flatb, flata):
        keys = [str(getattr(q, "key", "")) for q in path]
        if "heads" in keys and "coco" in keys:
            np.testing.assert_array_equal(va, vb)
        name = keys[-1] if keys else ""
        if name == "fc2_expert_w" and va.ndim == 4:
            np.testing.assert_array_equal(va[:, 0], vb[:, 0])  # coco expert
            np.testing.assert_array_equal(va[:, 2], vb[:, 2])  # mpii expert
    assert np.abs(after["heads"]["aic"]["final_w"]
                  - before["heads"]["aic"]["final_w"]).max() > 0
    # shared parts move too
    assert np.abs(after["backbone"]["blocks"]["mlp"]["fc2_w"]
                  - before["backbone"]["blocks"]["mlp"]["fc2_w"]).max() > 0

    # alternating schedule: each task's loss decreases over its own steps
    losses = {t: [] for t in TASKS}
    batches = {t: batch(TASK_K[t]) for t in TASKS}
    for _ in range(6):
        for t in TASKS:
            state, metrics = steps[t](state, batches[t],
                                      jax.random.PRNGKey(0))
            losses[t].append(float(metrics["loss"]))
    for t in TASKS:
        assert losses[t][-1] < losses[t][0], (t, losses[t])


def test_vitinference_plus_int8(plus_sd, tmp_path):
    """dtype='int8' composes with task splicing: the selected task's
    single-task tree quantizes like any other checkpoint."""
    import jax.numpy as jnp
    from easy_vitpose_tpu import VitInference
    from easy_vitpose_tpu.convert.vitpose_plus import \
        convert_vitpose_plus_state_dict
    from easy_vitpose_tpu.utils.checkpoint import save_params

    plus = str(tmp_path / "vitpose-plus-q8.npz")
    save_params(plus, convert_vitpose_plus_state_dict(plus_sd, CFG))
    task = TASKS[0]
    cfg_t = dataclasses.replace(CFG, head=dataclasses.replace(
        CFG.head, num_keypoints=TASK_K[task]))
    m = VitInference(plus, model_name="s", model_cfg=cfg_t, task=task,
                     dtype="int8")
    assert m.quant
    assert m._params["backbone"]["blocks"]["qkv_wq"].dtype == jnp.int8
    frame = np.random.default_rng(3).integers(0, 255, (240, 320, 3),
                                              np.uint8)
    out = m.inference(frame, bboxes=np.array([[30, 20, 160, 200, 0.9]],
                                             np.float32))[0]
    assert out.shape == (TASK_K[task], 3) and np.isfinite(out).all()


def test_moe_fused_train_step_matches_xla(plus_sd):
    """block_impl='pallas_train_interpret' on the MoE step: identical loss
    and updated params vs the XLA step; inactive experts stay bit-frozen."""
    from easy_vitpose_tpu.train import step as steplib
    from easy_vitpose_tpu.train.moe_step import (init_moe_train_state,
                                                 make_moe_train_step)

    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    tx = steplib.make_optimizer(1e-3)
    rng = np.random.default_rng(4)
    k = TASK_K["aic"]
    b = {
        "images": jnp.asarray(rng.normal(size=(2, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (2, k, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.ones((2, k, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    sa = init_moe_train_state(params, tx)
    sa, ma = make_moe_train_step(CFG, tx, "aic", use_amp=False)(sa, b, key)

    sb = init_moe_train_state(params, tx)
    sb, mb = make_moe_train_step(
        CFG, tx, "aic", use_amp=False,
        block_impl="pallas_train_interpret")(sb, b, key)

    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-5
    for a, c in zip(jax.tree_util.tree_leaves(sa["params"]),
                    jax.tree_util.tree_leaves(sb["params"])):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=2e-5)
    # inactive experts bit-identical to the originals through the fused path
    ew0 = np.asarray(params["backbone"]["blocks"]["mlp"]["fc2_expert_w"])
    ewb = np.asarray(sb["params"]["backbone"]["blocks"]["mlp"]
                     ["fc2_expert_w"])
    np.testing.assert_array_equal(ewb[:, 0], ew0[:, 0])
    np.testing.assert_array_equal(ewb[:, 2], ew0[:, 2])
    assert np.abs(ewb[:, 1] - ew0[:, 1]).max() > 0  # active expert moved


def test_moe_sharded_step_matches_single_device(plus_sd):
    """make_moe_train_step_sharded on the 8-device mesh: fused kernels
    run per-shard inside shard_map; loss/params match the single-device
    XLA MoE step and inactive experts stay bit-frozen."""
    import optax
    from easy_vitpose_tpu.parallel import mesh as meshlib
    from easy_vitpose_tpu.train import step as steplib
    from easy_vitpose_tpu.train.moe_step import (init_moe_train_state,
                                                 make_moe_train_step,
                                                 make_moe_train_step_sharded)

    assert len(jax.devices()) == 8
    params = convert_vitpose_plus_state_dict(plus_sd, CFG)
    tx = optax.sgd(1e-3)  # linear in grads (see test_sharded_train.py)
    rng = np.random.default_rng(7)
    k = TASK_K["aic"]
    batch_np = {
        "images": rng.normal(size=(8, 256, 192, 3)).astype(np.float32),
        "targets": rng.uniform(0, 1, (8, k, 64, 48)).astype(np.float32),
        "target_weights": np.ones((8, k, 1), np.float32),
    }
    key = jax.random.PRNGKey(0)

    sa = init_moe_train_state(params, tx)
    sa, ma = jax.jit(make_moe_train_step(CFG, tx, "aic", use_amp=False))(
        sa, {kk: jnp.asarray(v) for kk, v in batch_np.items()}, key)

    mesh = meshlib.make_mesh()
    sb = init_moe_train_state(params, tx)
    step = make_moe_train_step_sharded(
        CFG, tx, mesh, "aic", use_amp=False,
        block_impl="pallas_train_interpret", donate_state=False)
    sb, mb = step(meshlib.replicate(mesh, sb),
                  meshlib.shard_batch(mesh, batch_np),
                  meshlib.replicate(mesh, key))

    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-5
    for (path, a), c in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.tree.map(np.asarray, sa["params"])),
            jax.tree_util.tree_leaves(
                jax.tree.map(np.asarray, sb["params"]))):
        np.testing.assert_allclose(
            c, a, atol=5e-5,
            err_msg=f"diverges at {jax.tree_util.keystr(path)}")
    # inactive experts bit-identical through the sharded fused path
    ew0 = np.asarray(params["backbone"]["blocks"]["mlp"]["fc2_expert_w"])
    ewb = np.asarray(jax.tree.map(np.asarray, sb["params"])
                     ["backbone"]["blocks"]["mlp"]["fc2_expert_w"])
    np.testing.assert_array_equal(ewb[:, 0], ew0[:, 0])
    np.testing.assert_array_equal(ewb[:, 2], ew0[:, 2])
    assert np.abs(ewb[:, 1] - ew0[:, 1]).max() > 0


def test_split_to_onnx_export_chain(plus_sd, crops):
    """The reference's release workflow end to end: multi-dataset ViTPose+
    checkpoint -> per-dataset split (model_split.py) -> ONNX artifact
    (reference: model_split.py + export.py run back to back).  The
    exported graph, executed by the independent numpy interpreter, must
    match the split JAX forward."""
    from easy_vitpose_tpu.export.onnx_ref import run_model
    from easy_vitpose_tpu.export.onnx_vitpose import vitpose_to_onnx

    task = "aic"
    split = split_vitpose_plus(plus_sd)[task]
    cfg = dataclasses.replace(
        CFG, head=dataclasses.replace(CFG.head,
                                      num_keypoints=TASK_K[task]))
    params = convert_vitpose_state_dict(split, cfg)
    want = np.asarray(vitpose_forward(params, crops, cfg))

    blob = vitpose_to_onnx(params, cfg)
    x = np.asarray(crops).transpose(0, 3, 1, 2)
    (got,) = run_model(blob, {"input": x})

    assert got.shape == want.shape == (2, TASK_K[task], 64, 48)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-12)
    assert err < 1e-4, f"split->onnx chain rel err {err}"
