"""Adversarial (StyleGAN2) training — TPU-native extension.

The reference ships the Discriminator (models/stylegan2/model.py:647-705)
but no adversarial training loop — SURVEY.md §2.2 records it as "defined but
never invoked"; generator weights always arrive pre-trained from the
upstream rosinality lineage. This module makes the discriminator live: the
standard StyleGAN2 objective (non-saturating logistic loss, lazy R1 on
reals, lazy path-length regularization on the generator, generator EMA),
designed TPU-first rather than ported:

  * four jitted step programs (``d_step``, ``d_r1_step``, ``g_step``,
    ``g_path_step``) scheduled from the host loop — the lazy-regularization
    cadence is static Python, so every program is straight-line XLA with no
    data-dependent control flow;
  * style mixing is a *traced* ``inject_index`` (the mixing probability
    folds into a ``jnp.where``), not host randomness that would change
    traced shapes between steps;
  * DP over a mesh 'data' axis via sharding constraints on the step inputs
    — GSPMD inserts the gradient all-reduces (the DDP equivalent); the
    minibatch-stddev layer then sees GLOBAL-batch statistics, i.e. the
    sharded step is numerically the single-device global-batch step
    (tests/test_gan_training.py proves it), unlike DDP's per-GPU stddev;
  * R1's grad-of-grad and the path-length penalty's double-backward are
    plain ``jax.grad`` compositions — no ``create_graph`` bookkeeping;
  * optional bf16 synthesis (losses and both regularizers accumulate fp32)
    and ``jax.checkpoint`` remat of the generator pass inside ``g_step``.

Loss/regularizer definitions follow the StyleGAN2 paper (Karras et al.,
"Analyzing and Improving the Image Quality of StyleGAN", CVPR 2020), §3
(path length) and the lazy-regularization Adam correction from its App. B.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from where2edit_tpu.models.stylegan2 import Discriminator, Generator


@dataclasses.dataclass
class GANTrainConfig:
    size: int = 1024
    batch_size: int = 8           # GLOBAL batch (sharded over 'data' if DP)
    lr: float = 0.002
    r1: float = 10.0              # R1 gamma
    d_reg_every: int = 16         # lazy R1 cadence (0/neg disables)
    g_reg_every: int = 4          # lazy path-length cadence (0/neg disables)
    path_regularize: float = 2.0
    path_batch_shrink: int = 2    # path-reg batch = batch_size // shrink
    mixing: float = 0.9           # style-mixing probability
    ema_kimg: float = 10.0        # EMA half-life in thousands of images
    channel_multiplier: int = 2
    bf16: bool = False            # bf16 synthesis compute (fp32 losses)
    remat: bool = False           # jax.checkpoint the g_step synthesis
    d_bf16: bool = False          # bf16 discriminator tower (fp32 stddev/
    #                               losses)
    d_remat: bool = False         # jax.checkpoint each D ResBlock
    d_microbatch: int = 0         # accumulate D grads over lax.scan chunks
    #                               of this many samples (0 = whole batch).
    #                               Lifts the 1024² compile ceiling: ANY
    #                               D weight-grad above ~batch-4 size
    #                               crashes the compile helper
    #                               (tools/d_step_probe.py), so batch 8+
    #                               ships as micro-batch 4. Minibatch-stddev
    #                               then sees per-chunk groups — exactly
    #                               the reference's per-GPU DDP semantics
    #                               at batch 4/GPU. Single-chip only
    #                               (ignored with a mesh: per-device
    #                               batches are already small under DP).
    g_microbatch: int = 0         # same scan-chunk accumulation for
    #                               g_step (G fwd/bwd through D) — the
    #                               remaining monolithic program once
    #                               d_microbatch lifts the D side; needed
    #                               for single-chip batch 16 at 1024²
    d_s2d_octaves: int = 0        # run the D tower's first N octaves
    #                               space-to-depth — EXACT weight/layout
    #                               transform (the generator's s2d lever
    #                               mirrored; test_discriminator_s2d_
    #                               octaves_exact). Fills the MXU lanes
    #                               the ≤32-channel full-res convs waste.
    seed: int = 0


def logistic_d_loss(real_pred: jnp.ndarray, fake_pred: jnp.ndarray):
    """Non-saturating logistic discriminator loss:
    E[softplus(-D(real))] + E[softplus(D(fake))]."""
    return (jnp.mean(jax.nn.softplus(-real_pred.astype(jnp.float32)))
            + jnp.mean(jax.nn.softplus(fake_pred.astype(jnp.float32))))


def logistic_g_loss(fake_pred: jnp.ndarray):
    """Non-saturating generator loss: E[softplus(-D(fake))]."""
    return jnp.mean(jax.nn.softplus(-fake_pred.astype(jnp.float32)))


def r1_penalty(d_apply, d_params, real: jnp.ndarray) -> jnp.ndarray:
    """E_x[||∇_x D(x)||²] over the real batch (fp32).

    ``d_apply(params, x) -> (B, 1)``. The grad-of-grad needed to train on
    this penalty is the caller's plain ``jax.grad`` over d_params.
    """
    def pred_sum(x):
        return jnp.sum(d_apply(d_params, x).astype(jnp.float32))

    g = jax.grad(pred_sum)(real.astype(jnp.float32))
    return jnp.mean(jnp.sum(jnp.square(g), axis=(1, 2, 3)))


def path_length_penalty(img_from_wplus, wplus: jnp.ndarray,
                        pl_mean: jnp.ndarray, noise_key: jax.Array,
                        decay: float = 0.01):
    """StyleGAN2 §3 perceptual path length regularizer.

    ``img_from_wplus(wplus) -> (B, H, W, 3)`` must be differentiable w.r.t.
    ``wplus`` (and may close over generator params for the caller's outer
    grad). Returns (penalty, path_lengths, new_pl_mean); ``new_pl_mean`` is
    the detached running mean a = a + decay·(E[len] − a).
    """
    def img_dot(w):
        img = img_from_wplus(w)
        h, wd = img.shape[1], img.shape[2]
        noise = jax.random.normal(noise_key, img.shape,
                                  jnp.float32) / math.sqrt(h * wd)
        return jnp.sum(img.astype(jnp.float32) * noise)

    grads = jax.grad(img_dot)(wplus)                       # (B, L, 512)
    lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grads.astype(jnp.float32)),
                                        axis=2), axis=1))  # (B,)
    new_mean = pl_mean + decay * (jnp.mean(lengths) - pl_mean)
    new_mean = jax.lax.stop_gradient(new_mean)
    penalty = jnp.mean(jnp.square(lengths - new_mean))
    return penalty, lengths, new_mean


class GANTrainer:
    """Host loop owner for StyleGAN2 adversarial training on TPU.

    ``next(batch_iter)`` (or ``step(real)``'s argument) supplies real images
    as (batch, size, size, 3) float in [-1, 1], NHWC. With ``mesh`` (a
    jax.sharding.Mesh with a 'data' axis) the step inputs are
    sharding-constrained batch-over-data and GSPMD runs the whole update
    DP — params replicated, grad all-reduce inserted automatically.
    """

    def __init__(self, cfg: GANTrainConfig, *, mesh=None,
                 generator: Optional[Generator] = None,
                 discriminator: Optional[Discriminator] = None,
                 g_vars: Optional[dict] = None,
                 d_params: Optional[dict] = None):
        self.cfg = cfg
        self.mesh = mesh
        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        self.generator = generator or Generator(
            size=cfg.size, channel_multiplier=cfg.channel_multiplier,
            dtype=dtype)
        self.discriminator = discriminator or Discriminator(
            size=cfg.size, channel_multiplier=cfg.channel_multiplier,
            dtype=jnp.bfloat16 if cfg.d_bf16 else jnp.float32,
            remat=cfg.d_remat, s2d_octaves=cfg.d_s2d_octaves)

        key = jax.random.PRNGKey(cfg.seed)
        kg, kd, kn = jax.random.split(key, 3)
        if g_vars is None:
            g_vars = jax.jit(lambda: self.generator.init(
                {"params": kg, "noise": kn},
                [jnp.zeros((1, self.generator.style_dim))]))()
        self.g_vars = dict(g_vars)
        self.g_params = self.g_vars.pop("params")
        if d_params is None:
            d_params = jax.jit(lambda: self.discriminator.init(
                {"params": kd},
                jnp.zeros((1, cfg.size, cfg.size, 3))))()["params"]
        self.d_params = d_params
        self.g_ema_params = jax.tree.map(jnp.copy, self.g_params)
        self.pl_mean = jnp.zeros(())

        # Lazy-regularization Adam correction (StyleGAN2 App. B): the reg
        # steps stretch the effective optimization interval, so lr and betas
        # are scaled by c = every/(every+1) on the main steps.
        def _adam(every: int):
            c = every / (every + 1) if every and every > 0 else 1.0
            return optax.adam(cfg.lr * c, b1=0.0, b2=0.99 ** c)

        self.g_opt = _adam(cfg.g_reg_every)
        self.d_opt = _adam(cfg.d_reg_every)
        self.g_opt_state = self.g_opt.init(self.g_params)
        self.d_opt_state = self.d_opt.init(self.d_params)

        # per-step EMA decay from the half-life: 0.5 ** (batch / (kimg·1000))
        self.ema_beta = 0.5 ** (cfg.batch_size / max(cfg.ema_kimg * 1000.0,
                                                     1e-8))
        self._build_steps()
        self.global_step = 0

    # -------------------------------------------------------------- plumbing
    def real_sharding(self):
        """NamedSharding for pre-placing real batches on the data mesh
        (None off-mesh) — hand this to the async loader so batches land
        already distributed instead of relaying out inside the step."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec  # noqa: PLC0415

        return NamedSharding(self.mesh,
                             PartitionSpec("data", None, None, None))

    def _shard_batchdim(self, x):
        """Sharding-constrain the leading (batch) dim over 'data'."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec  # noqa: PLC0415

        spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def _mix_keys(self, key, batch: int):
        """(z1, z2, inject) for a style-mixed batch — split out so g_step's
        micro-batch chunks can slice one full-batch draw."""
        g = self.generator
        kz1, kz2, kp, ki = jax.random.split(key, 4)
        z1 = self._shard_batchdim(jax.random.normal(kz1, (batch, g.style_dim)))
        z2 = self._shard_batchdim(jax.random.normal(kz2, (batch, g.style_dim)))
        inject = jnp.where(
            jax.random.uniform(kp, ()) < self.cfg.mixing,
            jax.random.randint(ki, (), 1, g.n_latent),
            g.n_latent)
        return z1, z2, inject

    def _mixed_wplus_from(self, g_params, z1, z2, inject):
        g = self.generator
        gv = {"params": g_params, **self.g_vars}
        w1 = g.apply(gv, z1, method=g.get_latent)
        w2 = g.apply(gv, z2, method=g.get_latent)
        row = jnp.arange(g.n_latent)[None, :, None]
        return jnp.where(row < inject, w1[:, None, :], w2[:, None, :])

    def _mixed_wplus(self, g_params, key, batch: int):
        """Sample a style-mixed W+ batch. The mixing probability folds into
        a traced inject_index (inject = n_latent ⇒ no mixing) — one program
        covers both outcomes, no host-side branch."""
        return self._mixed_wplus_from(g_params,
                                      *self._mix_keys(key, batch))

    def _synthesize(self, g_params, wplus, noise_key):
        out = self.generator.apply(
            {"params": g_params, **self.g_vars}, [wplus],
            input_is_latent=True, rngs={"noise": noise_key})
        return out.image

    # ----------------------------------------------------------------- steps
    def _build_steps(self):
        cfg = self.cfg
        gen, disc = self.generator, self.discriminator

        def d_apply(d_params, x):
            return disc.apply({"params": d_params}, x)

        def synth_fake(g_params, key):
            """The D step's fake batch, in its OWN program: the output is
            discarded gradient-wise anyway (the old in-step synthesis was
            stop_gradient'ed), so splitting it out halves d_step's graph —
            the generator never rides inside the discriminator program.
            This moved the 1024² compile ceiling past batch 8 (PERF.md
            "Adversarial (GAN) training step")."""
            kw, kn = jax.random.split(key)
            wplus = self._mixed_wplus(g_params, kw, cfg.batch_size)
            return self._synthesize(g_params, wplus, kn)

        mb = cfg.d_microbatch if self.mesh is None else 0
        n_chunks = (cfg.batch_size // mb
                    if mb and 0 < mb < cfg.batch_size
                    and cfg.batch_size % mb == 0 else 1)

        def _accum_grads(value_and_grad_fn, d_params, *batched):
            """Mean loss/grads over n_chunks lax.scan chunks — ONE compiled
            chunk body regardless of batch, which is what lifts the 1024²
            D-grad compile ceiling (tools/d_step_probe.py: any D weight-grad
            above ~batch-4 size crashes the compile helper)."""
            if n_chunks == 1:
                return value_and_grad_fn(d_params, *batched)
            chunked = tuple(x.reshape(n_chunks, mb, *x.shape[1:])
                            for x in batched)

            def body(carry, xs):
                loss_c, grads_c = value_and_grad_fn(d_params, *xs)
                acc_loss, acc_g = carry
                return (acc_loss + loss_c,
                        jax.tree.map(jnp.add, acc_g, grads_c)), None

            zero = (jnp.zeros((), jnp.float32),
                    jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype),
                                 d_params))
            (loss_sum, grad_sum), _ = jax.lax.scan(body, zero, chunked)
            return (loss_sum / n_chunks,
                    jax.tree.map(lambda g: g / n_chunks, grad_sum))

        def d_step(d_params, d_opt_state, real, fake):
            real = self._shard_batchdim(real)
            fake = self._shard_batchdim(fake)

            def chunk_loss(dp, r, f):
                return logistic_d_loss(d_apply(dp, r),
                                       d_apply(dp, f.astype(r.dtype)))

            loss, grads = _accum_grads(
                jax.value_and_grad(chunk_loss), d_params, real, fake)
            updates, d_opt_state = self.d_opt.update(grads, d_opt_state,
                                                     d_params)
            d_params = optax.apply_updates(d_params, updates)
            return d_params, d_opt_state, loss

        def d_r1_step(d_params, d_opt_state, real):
            real = self._shard_batchdim(real)

            def chunk_loss(dp, r):
                r1 = r1_penalty(d_apply, dp, r)
                # lazy cadence: the penalty is applied every d_reg_every
                # steps, scaled back up by the interval (StyleGAN2 App. B)
                return cfg.r1 / 2.0 * r1 * cfg.d_reg_every

            loss, grads = _accum_grads(
                jax.value_and_grad(chunk_loss), d_params, real)
            updates, d_opt_state = self.d_opt.update(grads, d_opt_state,
                                                     d_params)
            d_params = optax.apply_updates(d_params, updates)
            return d_params, d_opt_state, loss

        mb_g = cfg.g_microbatch if self.mesh is None else 0
        ng_chunks = (cfg.batch_size // mb_g
                     if mb_g and 0 < mb_g < cfg.batch_size
                     and cfg.batch_size % mb_g == 0 else 1)

        def g_step(g_params, g_opt_state, d_params, key):
            kw, kn = jax.random.split(key)
            # one full-batch z/inject draw, sliced per chunk — the chunked
            # program samples the same latents the monolithic one would
            z1, z2, inject = self._mix_keys(kw, cfg.batch_size)

            def chunk_loss(gp, z1c, z2c, knc):
                wplus = self._mixed_wplus_from(gp, z1c, z2c, inject)
                synth = (jax.checkpoint(self._synthesize) if cfg.remat
                         else self._synthesize)
                fake = synth(gp, wplus, knc)
                return logistic_g_loss(d_apply(d_params, fake))

            if ng_chunks == 1:
                loss, grads = jax.value_and_grad(chunk_loss)(
                    g_params, z1, z2, kn)
            else:  # scan-chunk accumulation (same scheme as d_microbatch)
                xs = (z1.reshape(ng_chunks, mb_g, -1),
                      z2.reshape(ng_chunks, mb_g, -1),
                      jax.random.split(kn, ng_chunks))

                def body(carry, x):
                    loss_c, grads_c = jax.value_and_grad(chunk_loss)(
                        g_params, *x)
                    acc_l, acc_g = carry
                    return (acc_l + loss_c,
                            jax.tree.map(jnp.add, acc_g, grads_c)), None

                zero = (jnp.zeros((), jnp.float32),
                        jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype),
                                     g_params))
                (loss_sum, grad_sum), _ = jax.lax.scan(body, zero, xs)
                loss = loss_sum / ng_chunks
                grads = jax.tree.map(lambda g_: g_ / ng_chunks, grad_sum)

            updates, g_opt_state = self.g_opt.update(grads, g_opt_state,
                                                     g_params)
            g_params = optax.apply_updates(g_params, updates)
            return g_params, g_opt_state, loss

        def g_path_step(g_params, g_opt_state, pl_mean, key):
            batch = max(1, cfg.batch_size // max(cfg.path_batch_shrink, 1))
            kw, kn, kpl = jax.random.split(key, 3)

            def loss_fn(gp):
                wplus = self._mixed_wplus(gp, kw, batch)
                penalty, lengths, new_mean = path_length_penalty(
                    lambda w: self._synthesize(gp, w, kn), wplus, pl_mean,
                    kpl)
                loss = cfg.path_regularize * cfg.g_reg_every * penalty
                return loss, (jnp.mean(lengths), new_mean)

            (loss, (mean_len, new_mean)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(g_params)
            updates, g_opt_state = self.g_opt.update(grads, g_opt_state,
                                                     g_params)
            g_params = optax.apply_updates(g_params, updates)
            return g_params, g_opt_state, loss, mean_len, new_mean

        def ema_step(ema, params, beta):
            return jax.tree.map(
                lambda e, p: e * beta + p.astype(e.dtype) * (1.0 - beta),
                ema, params)

        self._synth_fake = jax.jit(synth_fake)
        self._d_step = jax.jit(d_step, donate_argnums=(0, 1))
        self._d_r1_step = jax.jit(d_r1_step, donate_argnums=(0, 1))
        self._g_step = jax.jit(g_step, donate_argnums=(0, 1))
        self._g_path_step = jax.jit(g_path_step, donate_argnums=(0, 1))
        self._ema_step = jax.jit(ema_step, donate_argnums=(0,))

    # ------------------------------------------------------------ host loop
    def step(self, real, key: Optional[jax.Array] = None) -> dict:
        """One full training iteration (D step, lazy R1, G step, lazy path
        reg, EMA). ``real``: (batch, size, size, 3) in [-1, 1]. Returns the
        scalar metrics of whatever ran this iteration as DEVICE scalars —
        convert with float() only when logging, so the host loop keeps
        dispatching ahead of the device (a per-step sync costs a full
        round-trip on remote-dispatch backends)."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(cfg.seed + self.global_step + 1)
        kd, kg, kp = jax.random.split(key, 3)
        real = jnp.asarray(real)
        metrics: dict[str, Any] = {}

        fake = self._synth_fake(self.g_params, kd)  # own program (see above)
        self.d_params, self.d_opt_state, d_loss = self._d_step(
            self.d_params, self.d_opt_state, real, fake)
        metrics["d_loss"] = d_loss

        if cfg.d_reg_every > 0 and self.global_step % cfg.d_reg_every == 0:
            self.d_params, self.d_opt_state, r1_loss = self._d_r1_step(
                self.d_params, self.d_opt_state, real)
            metrics["r1"] = r1_loss

        self.g_params, self.g_opt_state, g_loss = self._g_step(
            self.g_params, self.g_opt_state, self.d_params, kg)
        metrics["g_loss"] = g_loss

        if cfg.g_reg_every > 0 and self.global_step % cfg.g_reg_every == 0:
            (self.g_params, self.g_opt_state, path_loss, mean_len,
             self.pl_mean) = self._g_path_step(
                self.g_params, self.g_opt_state, self.pl_mean, kp)
            metrics["path"] = path_loss
            metrics["path_length"] = mean_len

        self.g_ema_params = self._ema_step(self.g_ema_params, self.g_params,
                                           self.ema_beta)
        self.global_step += 1
        return metrics

    def ema_generator_variables(self) -> dict:
        """Variables dict for sampling from the EMA generator."""
        return {"params": self.g_ema_params, **self.g_vars}
