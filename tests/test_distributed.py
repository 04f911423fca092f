"""Real two-process jax.distributed validation (VERDICT r2 weak-4).

parallel/mesh.py::initialize_distributed was only no-op tested before;
this spawns TWO separate CPU processes that rendezvous through the
coordination service (the DCN analogue of the reference's
dist_util.py:47-117 NCCL/SLURM launchers), build the GLOBAL 2-device
mesh (one local device each), feed per-host batch slices (the
DistributedSampler role), and run one data-parallel train step whose
pmean'd loss must equal the single-process full-batch loss.
"""
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.parallel import mesh as meshlib
from easy_vitpose_tpu.train import step as trainlib

coord, pid = sys.argv[1], int(sys.argv[2])
meshlib.initialize_distributed(coord, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()          # global
assert len(jax.local_devices()) == 1                   # one per process
assert meshlib.is_main_process() == (pid == 0)

cfg = ModelConfig(
    name="tiny", dataset="coco",
    backbone=BackboneConfig(embed_dim=32, depth=1, num_heads=2),
    head=HeadConfig(in_channels=32, num_keypoints=17,
                    deconv_filters=(8, 8)))
params = init_vitpose_params(jax.random.PRNGKey(0), cfg)  # same on both
tx = trainlib.make_optimizer(1e-3)
state = trainlib.init_train_state(params, tx)
mesh = meshlib.make_mesh()           # global 2-device mesh
rep = meshlib.replicated(mesh)
shard = meshlib.batch_sharded(mesh)

B = 4
rng = np.random.default_rng(0)       # same global batch on both hosts
host_batch = {
    "images": rng.normal(size=(B, 256, 192, 3)).astype(np.float32),
    "targets": rng.uniform(0, 1, (B, 17, 64, 48)).astype(np.float32),
    "target_weights": np.ones((B, 17, 1), np.float32),
}
sl = meshlib.local_batch_slice(B)    # this host's 2 rows
assert (sl.stop - sl.start) == 2 and sl.start == 2 * pid
batch = {k: jax.make_array_from_process_local_data(shard, v[sl], v.shape)
         for k, v in host_batch.items()}
state_g = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
    jax.tree.map(np.asarray, state))
key = jax.make_array_from_process_local_data(
    rep, np.asarray(jax.random.PRNGKey(1)))

jstep = trainlib.jit_data_parallel(
    trainlib.make_train_step(cfg, tx, use_amp=False), mesh,
    donate_state=False)
new_state, metrics = jstep(state_g, batch, key)
jax.block_until_ready(new_state)
print(f"LOSS {float(metrics['loss']):.10f}", flush=True)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_distributed_dp_step():
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env["XLA_FLAGS"] = ""         # 1 CPU device per process (no virtual 8)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, addr, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("LOSS ")]
        assert lines, out
        losses.append(float(lines[-1].split()[1]))
    # both hosts see the same psum'd global loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # single-process full-batch reference (this process, one device)
    from easy_vitpose_tpu.configs import (BackboneConfig, HeadConfig,
                                          ModelConfig)
    from easy_vitpose_tpu.models.vitpose import init_vitpose_params
    from easy_vitpose_tpu.train import step as trainlib

    cfg = ModelConfig(
        name="tiny", dataset="coco",
        backbone=BackboneConfig(embed_dim=32, depth=1, num_heads=2),
        head=HeadConfig(in_channels=32, num_keypoints=17,
                        deconv_filters=(8, 8)))
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    rng = np.random.default_rng(0)
    B = 4
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, 256, 192, 3))
                              .astype(np.float32)),
        "targets": jnp.asarray(rng.uniform(0, 1, (B, 17, 64, 48))
                               .astype(np.float32)),
        "target_weights": jnp.ones((B, 17, 1), jnp.float32),
    }
    step = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=False))
    _, m = step(state, batch, jax.random.PRNGKey(1))
    assert losses[0] == pytest.approx(float(m["loss"]), rel=1e-5)
