"""BatchNorm training-mode parity vs torch (batch stats + running-stat
update + normalization), and the per-host batch slice helper."""
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.models.head import batch_norm


def test_batch_norm_train_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    C = 8
    x = rng.normal(2.0, 3.0, size=(4, 6, 5, C)).astype(np.float32)

    bn = torch.nn.BatchNorm2d(C)  # eps=1e-5, momentum=0.1 (our constants)
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.normal_()
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
    # np.array copies: on CPU jnp.asarray zero-copies numpy views of torch
    # buffers, which torch then mutates in place during the forward
    p = {"scale": jnp.asarray(np.array(bn.weight.detach().numpy())),
         "bias": jnp.asarray(np.array(bn.bias.detach().numpy())),
         "mean": jnp.asarray(np.array(bn.running_mean.numpy())),
         "var": jnp.asarray(np.array(bn.running_var.numpy()))}

    bn.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y_ref = bn(xt).numpy().transpose(0, 2, 3, 1)

    y, new_state = batch_norm(jnp.asarray(x), p, train=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), atol=1e-4)


def test_batch_norm_eval_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    C = 8
    x = rng.normal(size=(2, 4, 3, C)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(C)
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    p = {"scale": jnp.asarray(bn.weight.detach().numpy()),
         "bias": jnp.asarray(bn.bias.detach().numpy()),
         "mean": jnp.asarray(bn.running_mean.numpy()),
         "var": jnp.asarray(bn.running_var.numpy())}
    with torch.no_grad():
        y_ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))
                   ).numpy().transpose(0, 2, 3, 1)
    y, st = batch_norm(jnp.asarray(x), p, train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st["mean"]),
                                  bn.running_mean.numpy())


def test_local_batch_slice_single_host():
    from easy_vitpose_tpu.parallel.mesh import local_batch_slice
    s = local_batch_slice(64)
    assert s == slice(0, 64)  # single host owns the whole batch
