"""Multi-process multihost worker (VERDICT r4 Next #5).

Run as a subprocess by tests/test_multihost.py — two of these processes,
each with 4 virtual CPU devices, join one jax.distributed job through
``initialize_multihost`` (the real code path the reference's NCCL TCP
rendezvous corresponds to — run_attention.py:913-945) and run ONE DP
attention training step and ONE DP GAN step over the 8-device global mesh.
The scalar losses are printed as JSON for the parent to compare across
processes and against its own single-process 8-device run.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import jax

    # the site config pins the platform and outranks the env var — force
    # the virtual-CPU platform through the config API (as conftest does)
    jax.config.update("jax_platforms", "cpu")

    from where2edit_tpu.parallel.mesh import initialize_multihost

    assert initialize_multihost(coordinator_address=f"localhost:{port}",
                                num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    out = {"process_id": pid, "devices": jax.device_count()}
    out.update(run_steps())
    print("RESULT " + json.dumps(out), flush=True)


def run_steps():
    """One DP attention step + one DP GAN step on the global mesh; every
    process executes the same SPMD program (multi-controller JAX)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from where2edit_tpu.parallel.mesh import make_mesh
    from where2edit_tpu.train.gan_trainer import GANTrainConfig, GANTrainer
    from multihost_common import build_attention_trainer

    mesh = make_mesh()  # all 8 global devices on the data axis

    # ---- attention step (global batch 8, one sample per device)
    trainer, text = build_attention_trainer(batch=8, mesh=mesh)
    key = jax.random.PRNGKey(50)
    _, _, aux, _, _ = trainer.step_fn(
        trainer.mapper_params, trainer.opt_state, jnp.asarray(0.0), key, text)
    att_loss = float(jax.device_get(aux["loss"]))

    # ---- GAN step (batch 8 over the same mesh)
    cfg = GANTrainConfig(size=16, batch_size=8, channel_multiplier=1,
                         d_reg_every=2, g_reg_every=2, path_batch_shrink=2,
                         seed=0)
    gan = GANTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(123)
    real_np = rng.uniform(-1.0, 1.0, (8, 16, 16, 3)).astype(np.float32)
    from where2edit_tpu.parallel.mesh import data_sharding

    real = jax.make_array_from_callback(
        real_np.shape, data_sharding(mesh, 4), lambda idx: real_np[idx])
    metrics = gan.step(real, key=jax.random.PRNGKey(7))
    gan_metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
    return {"att_loss": att_loss, "gan": gan_metrics}


if __name__ == "__main__":
    main()
