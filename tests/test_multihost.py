"""Real multi-process multihost run (VERDICT r4 Next #5).

``initialize_multihost`` was previously exercised only as a single-process
no-op; here TWO actual processes × 4 virtual CPU devices each join one
``jax.distributed`` job on localhost — the code path the reference's NCCL
TCP rendezvous corresponds to (run_attention.py:913-945) — run one DP
attention step and one DP GAN step over the 8-device GLOBAL mesh, and both
processes' losses must agree with this (single-controller, 8-device)
process running the identical program.

Opt-in: heavy (two fresh processes each compiling the 8-device step
programs, ~3-4 min) and requires spawning subprocesses — skipped unless
W2E_MULTIHOST_TEST=1. The quick gate covers the single-controller DP
semantics (test_training.py); this covers the multi-controller runtime.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("W2E_MULTIHOST_TEST") != "1",
                    reason="opt-in: set W2E_MULTIHOST_TEST=1 (spawns 2 "
                           "processes, ~3-4 min)")
def test_two_process_multihost_matches_single_controller():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-4000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out[-4000:]
        r = json.loads(line[-1][len("RESULT "):])
        results[r["process_id"]] = r

    assert set(results) == {0, 1}
    for r in results.values():
        assert r["devices"] == 8

    # both controllers of one SPMD job must report identical numbers
    assert results[0]["att_loss"] == results[1]["att_loss"]
    assert results[0]["gan"] == results[1]["gan"]

    # and they must match THIS process (single-controller, 8 devices)
    # running the identical program
    from multihost_common import build_attention_trainer
    from where2edit_tpu.parallel.mesh import data_sharding, make_mesh
    from where2edit_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    import jax
    import jax.numpy as jnp

    assert jax.device_count() == 8
    mesh = make_mesh()
    trainer, text = build_attention_trainer(batch=8, mesh=mesh)
    # vs the single-controller build the PROGRAM differs (the multi-process
    # compile schedules collectives/reductions differently), so this is a
    # numerical comparison, not a bit-exact one — the bit-exact claim is
    # the cross-process assert above (one SPMD program, two controllers)
    _, _, aux, _, _ = trainer.step_fn(
        trainer.mapper_params, trainer.opt_state, jnp.asarray(0.0),
        jax.random.PRNGKey(50), text)
    np.testing.assert_allclose(results[0]["att_loss"], float(aux["loss"]),
                               rtol=1e-4)

    cfg = GANTrainConfig(size=16, batch_size=8, channel_multiplier=1,
                         d_reg_every=2, g_reg_every=2, path_batch_shrink=2,
                         seed=0)
    gan = GANTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(123)
    real_np = rng.uniform(-1.0, 1.0, (8, 16, 16, 3)).astype(np.float32)
    real = jax.device_put(jnp.asarray(real_np), data_sharding(mesh, 4))
    metrics = {k: float(v) for k, v in gan.step(
        real, key=jax.random.PRNGKey(7)).items()}
    for k, v in results[0]["gan"].items():
        np.testing.assert_allclose(v, metrics[k], rtol=5e-4, atol=1e-6,
                                   err_msg=k)
