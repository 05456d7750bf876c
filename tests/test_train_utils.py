"""Optimizer / schedule parity and clustering behavior."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from where2edit_tpu.train.lr import styleclip_lr_schedule
from where2edit_tpu.train.ranger import ranger

from oracle import require_reference

RNG = np.random.default_rng(41)


def test_ranger_matches_reference():
    require_reference()
    import sys, os  # noqa: E401,PLC0415
    sys.path.insert(0, os.path.join("/root/reference", "mapper", "training"))
    from ranger import Ranger  # noqa: PLC0415

    torch.manual_seed(30)
    w0 = RNG.standard_normal((8, 4)).astype(np.float32)   # torch (out,in)
    b0 = RNG.standard_normal((8,)).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = Ranger([tw, tb], lr=0.1)

    # jax params use the transposed linear layout (in, out)
    params = {"w": jnp.asarray(w0.T.copy()), "b": jnp.asarray(b0.copy())}
    jopt = ranger(0.1)
    state = jopt.init(params)

    grads_seq = [
        (RNG.standard_normal((8, 4)).astype(np.float32),
         RNG.standard_normal((8,)).astype(np.float32))
        for _ in range(14)  # crosses the N_sma threshold AND a lookahead sync
    ]
    for gw, gb in grads_seq:
        opt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        opt.step()

        g = {"w": jnp.asarray(gw.T.copy()), "b": jnp.asarray(gb.copy())}
        updates, state = jopt.update(g, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]).T,
                               tw.detach().numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(params["b"]),
                               tb.detach().numpy(), rtol=1e-3, atol=2e-4)


def test_lr_schedule_matches_reference():
    require_reference()
    from oracle import ref_run_attention  # noqa: PLC0415

    ra = ref_run_attention()
    sched = styleclip_lr_schedule(0.1, 100)
    for i in [0, 3, 10, 50, 80, 99]:
        expect = ra.get_lr(i / 100, 0.1)
        np.testing.assert_allclose(float(sched(i)), expect, rtol=1e-5)


def test_kmeans_and_assignment_roundtrip():
    from where2edit_tpu.editing.clustering import (
        assign_clusters,
        cluster_features,
        kmeans_fit,
    )

    feats = RNG.standard_normal((2, 8, 8, 32)).astype(np.float32)
    cf = cluster_features(jnp.asarray(feats), upsample2=True)
    assert cf.shape == (2 * 16 * 16, 32 + 2 * 2)
    centers = kmeans_fit(np.asarray(cf), 4, use_sklearn="auto")
    assert centers.shape == (4, 36)
    ids = assign_clusters(jnp.asarray(feats), jnp.asarray(centers))
    assert ids.shape == (2, 8, 8)
    assert int(ids.min()) >= 0 and int(ids.max()) < 8  # offset per sample

    # JAX lloyd path (no sklearn) converges to a sane partition too
    centers2 = kmeans_fit(np.asarray(cf), 4, use_sklearn="never")
    assert centers2.shape == (4, 36)
    assert np.isfinite(centers2).all()


def test_initialize_multihost_semantics(monkeypatch):
    """No-op on single-host envs; joins when context is present; idempotent
    once the distributed client exists (the NCCL-rendezvous replacement,
    SURVEY.md §2.3 / reference run_attention.py:913-945)."""
    from where2edit_tpu.parallel.mesh import initialize_multihost

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda coordinator_address=None, num_processes=None,
        process_id=None, **kw: calls.append(
            (coordinator_address, num_processes, process_id)))

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() is False          # bare single-host: no-op
    assert calls == []

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert initialize_multihost(num_processes=2, process_id=1) is True
    assert calls == [("10.0.0.1:1234", 2, 1)]       # env coordinator joined

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    assert initialize_multihost(force=True) is True  # auto-detect path
    assert len(calls) == 2

    class _State:  # already-initialized runtime → idempotent no call
        client = object()

    monkeypatch.setattr(jax.distributed, "global_state", _State(),
                        raising=False)
    assert initialize_multihost(force=True) is True
    assert len(calls) == 2
