"""Region-attention training (the paper's phase 2), TPU-native.

Reference driver: attention/run_attention.py:896-1546 (call stack in
SURVEY.md §3.1). The reference runs 1 process/GPU with NCCL broadcasts +
gradient-gathering InfoNCE; here the *global batch* formulation makes every
collective implicit:

  * "rank-0 broadcasts its sample so every rank edits the same face with a
    different condition" (run_attention.py:1208-1230) ⇒ take global row 0
    and broadcast — under pjit XLA emits the matching ICI collective.
  * the gradient-carrying all-gather InfoNCE (GatherLayer + CE,
    run_attention.py:1312-1318) ⇒ a plain matmul over the global batch.
  * per-step flow (3 synthesis passes + 2 CLIP image passes + VGG + mapper
    backward) is ONE jitted program, so XLA fuses and schedules the whole
    step instead of ~10 eager graph launches.

The frozen-attention quirk (t < 1.15 is always true, run_attention.py:
1076-1083 — attention params never train in the reference run) is
reproduced by default via gradient masking; set
``freeze_attention_until=0.0`` to actually train the attention branch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from where2edit_tpu.editing.attention_mappers import MapperOutput
from where2edit_tpu.losses.infonce import infonce_consistency
from where2edit_tpu.train.lr import styleclip_lr_schedule


@dataclasses.dataclass
class AttentionTrainConfig:
    """attention/run_attention.py:1549-1605 defaults."""
    stylegan_size: int = 1024
    attention_layer: int = 8
    cluster_layer: int = 13
    batch_size: int = 1            # per-device in the reference; global here
    lr: float = 0.1
    lambda_ess: float = 0.6
    lambda_sec: float = 0.6
    lambda_id: float = 0.3
    lambda_delta: float = 0.008
    step: int = 300
    truncation: float = 0.7
    work_in_stylespace: bool = False
    freeze_attention_until: float = 1.15   # reference quirk: never unfreezes
    seed: int = 200
    remat: bool = False
    """Rematerialize the grad-pass synthesis (jax.checkpoint): the backward
    through the frozen 1024² generator otherwise stores every octave
    activation in fp32, which caps fp32 training at ~batch 4/chip. Costs
    one extra forward in the backward pass; identical numerics."""


def _broadcast_row0(tree):
    """Every sample sees global row 0 (the reference's dist.broadcast(src=0))."""
    def bc(x):
        return jnp.broadcast_to(x[:1], x.shape)
    return jax.tree.map(bc, tree)


def _attention_param_mask(params) -> Any:
    """True for trainable params; False for attention/initial ones while the
    reference freeze is active (run_attention.py:1076-1083: module names
    starting with 'attention' or 'initial')."""
    from flax import traverse_util  # noqa: PLC0415

    flat_params = traverse_util.flatten_dict(params)
    mask = {
        k: not (k[0].startswith("attention") or k[0].startswith("initial")
                or (len(k) > 1 and k[0] == "att"))
        for k in flat_params
    }
    return traverse_util.unflatten_dict(mask)


class AttentionTrainer:
    """Builds and runs the jitted global-batch training step.

    Model plumbing is injected so the trainer works with real CLIP weights,
    random-weight smoke tests, and the multi-chip dryrun alike:
      * generator, gen_vars — frozen synthesis network
      * mapper, mapper params — the trainable module
      * encode_image(loss_variables, img)->feats,
        perceptual(loss_variables, img1, img2)->scalar — callables whose
        weights live in ``loss_variables`` (threaded through the jitted
        step as arguments, never closed over)
    """

    def __init__(self, cfg: AttentionTrainConfig, *, generator, gen_vars,
                 mapper, mapper_params, encode_image: Callable,
                 perceptual: Callable, mean_latent: jnp.ndarray,
                 mapper_extra_variables: Optional[dict] = None,
                 mesh=None, loss_variables: Optional[dict] = None,
                 latent_bank: Optional[jnp.ndarray] = None,
                 text_bank: Optional[jnp.ndarray] = None):
        self.cfg = cfg
        # --latent_path mode (run_attention.py:1184-1186): instead of
        # sampling z, every synthesis gathers a random row from this
        # (N, n_latent, 512) bank of pre-inverted W+ latents (no truncation —
        # the loaded codes are already in W+, ref :1571-1575).
        self.latent_bank = (None if latent_bank is None
                            else jnp.asarray(latent_bank))
        # opt-in text conditioning: (K, 512) CLIP text encodings of corpus
        # phrases; a random row per sample becomes the conditioning feature
        # instead of CLIP image features. The reference computes this per
        # step (run_attention.py:1112-1124, `text_features_origin`) but then
        # discards it for image features (:1176) — this revives that path
        # behind a flag, saving the batch-1 synthesis + CLIP image pass.
        self.text_bank = None if text_bank is None else jnp.asarray(text_bank)
        # encode_image(loss_variables, img) / perceptual(loss_variables, a, b)
        # — loss weights (CLIP/VGG) are threaded through the jitted step as
        # ARGUMENTS, like gen_vars and the mapper extras. Weights closed
        # over become HLO constants, which this environment's compile
        # service processes ~100x slower than parameter inputs.
        self.loss_variables = dict(loss_variables or {})
        # optional jax.sharding.Mesh with a "data" axis: the sampled batch is
        # sharding-constrained over it, so XLA lays every batch-dim tensor
        # out DP-style and inserts the ICI collectives (the reference's
        # NCCL DDP + GatherLayer, run_attention.py:913-945,1312-1318).
        # Params stay replicated. Numerically this IS the single-device
        # global-batch step (tests/test_training.py proves it).
        self.mesh = mesh
        self.mapper_variables_extra = dict(mapper_extra_variables or {})
        self.generator = generator
        self.gen_vars = gen_vars
        self.mapper = mapper
        self.mapper_params = mapper_params
        self.encode_image = encode_image
        self.perceptual = perceptual
        self.mean_latent = mean_latent

        schedule = styleclip_lr_schedule(cfg.lr, cfg.step)
        self.opt = optax.adam(learning_rate=schedule)
        self.opt_state = self.opt.init(mapper_params)
        self.steps_completed = 0
        self.freeze_mask = _attention_param_mask(mapper_params)
        self._jit_step = jax.jit(self._step)

        def step_fn(mapper_params, opt_state, step_idx, key, bank):
            return self._jit_step(self.gen_vars, self.mapper_variables_extra,
                                  self.loss_variables, mapper_params,
                                  opt_state, step_idx, key, bank,
                                  self.latent_bank, self.text_bank)

        self.step_fn = step_fn

    # ------------------------------------------------------------- plumbing
    def _truncated_wplus(self, gen_vars, z):
        """z → truncated W+. The truncated W+ comes from the style MLP
        directly (mean_latent + t·(w − mean_latent), model.py:496-504) —
        running the full generator just to read ``.latent`` (as the eager
        reference does, run_attention.py:1090-1093) would ship a dead
        synthesis body to the compiler for every call."""
        g = self.generator
        w = g.apply(gen_vars, z, method=g.get_latent)
        w = self.mean_latent + self.cfg.truncation * (w - self.mean_latent)
        return jnp.repeat(w[:, None, :], g.n_latent, axis=1)

    def _tap_controls(self):
        """Static capture controls for the no-grad syntheses: the step reads
        only the mapper/blend/cluster taps (editing.attention_mappers.
        tap_controls is the single source of truth). Materializing all 26
        full-res fp32 taps (x2 in the lax.map) is what made batch-8/chip
        fp32 training OOM (PERF.md)."""
        from where2edit_tpu.editing.attention_mappers import tap_controls  # noqa: PLC0415

        cfg = self.cfg
        return tap_controls(cfg.stylegan_size, cfg.attention_layer,
                            cfg.cluster_layer)

    def _synthesize_wplus(self, gen_vars, wplus):
        """W+ → (img, wplus, styles, features+const). Taps the step never
        reads at full resolution are subsampled/dropped at the source
        (``_tap_controls``); unread entries are None."""
        g = self.generator
        blend, keep = self._tap_controls()
        out = g.apply(gen_vars, [wplus], input_is_latent=True,
                      randomize_noise=False, return_features=True,
                      tap_subsample=blend, tap_indices=keep)
        feats = list(out.feature_map)
        # append the const input tap (run_attention.py:1110)
        batch = wplus.shape[0]
        const = gen_vars["params"]["input"]["input"]
        feats.append(jnp.broadcast_to(const,
                                      (batch, *const.shape[1:])))
        return out.image, wplus, out.style_vector, feats

    def _synthesize(self, gen_vars, z):
        """z → truncated W+ → (img, wplus, styles, features+const)."""
        return self._synthesize_wplus(gen_vars,
                                      self._truncated_wplus(gen_vars, z))

    def _mapper_forward(self, mapper_params, mapper_extra, cond_features,
                        latent, styles, feats, attention_text
                        ) -> tuple[Any, MapperOutput]:
        cfg = self.cfg
        blend_size = feats[cfg.attention_layer - 1].shape[1]
        variables = {"params": mapper_params}
        if "clusters" in mapper_extra:
            variables.update(mapper_extra)
        if cfg.work_in_stylespace:
            out = self.mapper.apply(
                variables, cond_features, styles, feats, blend_size,
                attention_text=attention_text, train=True,
                deterministic_noise=True)
            new_latents = out.latents
        else:
            out = self.mapper.apply(
                variables, cond_features, latent, feats, blend_size,
                attention_text=attention_text, train=True)
            new_latents = latent + out.latents  # strength = ones (ref :1236)
        return new_latents, out

    # ----------------------------------------------------------------- step
    def _step(self, gen_vars, mapper_extra, loss_vars, mapper_params,
              opt_state, step_idx, key, attention_text_bank,
              latent_bank=None, text_bank=None):
        """One training step.

        ``attention_text_bank`` is a (K, D) table of CLIP encodings of the K
        fixed region prompts (run_attention.py:1134 — re-sampled and
        re-encoded *every step* in the reference). A fresh per-sample prompt
        index is drawn inside the step from the step RNG and gathered from
        the table — same per-step distribution, no host round-trip. Row 0 is
        then broadcast (the reference's dist.broadcast(src=0),
        run_attention.py:1141-1144), so one prompt drives the whole global
        batch each step, and all K prompts are seen over a run.

        ``latent_bank`` (optional, (N, n_latent, 512)): --latent_path mode —
        each synthesis gathers a random pre-inverted W+ row instead of
        sampling z (run_attention.py:1184-1186).
        ``text_bank`` (optional, (K, 512)): text-conditioning mode — the
        conditioning features are gathered text encodings instead of CLIP
        image features of a fresh batch (revives run_attention.py:1112-1124's
        otherwise-dead path; skips the batch-1 synthesis + CLIP image pass).
        """
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        t = step_idx / cfg.step
        att_idx = jax.random.randint(
            k3, (cfg.batch_size,), 0, attention_text_bank.shape[0])
        attention_text = attention_text_bank[att_idx]

        def shard_batch(x):
            if self.mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec  # noqa: PLC0415

            spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec))

        def sample_wplus(k):
            """Fresh W+ batch: truncated z-sample, or a random row of the
            loaded latent bank in --latent_path mode (no truncation — the
            codes are already W+, run_attention.py:1571-1575)."""
            if latent_bank is not None:
                idx = jax.random.randint(k, (cfg.batch_size,), 0,
                                         latent_bank.shape[0])
                return shard_batch(latent_bank[idx])
            z = shard_batch(jax.random.normal(k, (cfg.batch_size, 512)))
            return self._truncated_wplus(gen_vars, z)

        # batch 1: conditioning features (CLIP image embeddings of fresh
        # faces; run_attention.py:1163-1172 — the text/perturb variants are
        # dead code, image features win)
        # batch 2: the shared edit target — row 0 broadcast everywhere
        # Both no-grad syntheses run through ONE lax.map body: the compiler
        # sees a single synthesis computation instead of two copies (the
        # remote compile service is the bottleneck, not device time).
        if text_bank is not None:
            cidx = jax.random.randint(k1, (cfg.batch_size,), 0,
                                      text_bank.shape[0])
            cond_features = jax.lax.stop_gradient(
                shard_batch(text_bank[cidx]))
            img2, wplus2, styles2, feats2 = self._synthesize_wplus(
                gen_vars, sample_wplus(k2))
        else:
            wp12 = jnp.stack([sample_wplus(k1), sample_wplus(k2)])
            imgs, wpluses, styles_m, feats_m = jax.lax.map(
                lambda wp: self._synthesize_wplus(gen_vars, wp), wp12)
            cond_features = jax.lax.stop_gradient(
                self.encode_image(loss_vars, imgs[0]))
            img2, wplus2 = imgs[1], wpluses[1]
            styles2 = [s[1] for s in styles_m]
            feats2 = [None if f is None else f[1] for f in feats_m]
        img2, wplus2 = _broadcast_row0(img2), _broadcast_row0(wplus2)
        styles2 = _broadcast_row0(styles2)
        feats2 = _broadcast_row0(feats2)
        att_text = _broadcast_row0(attention_text)

        def synth_edit(latents_in, amap, fm):
            gen_out = self.generator.apply(
                gen_vars,
                latents_in if cfg.work_in_stylespace else [latents_in],
                input_is_latent=not cfg.work_in_stylespace,
                input_is_stylespace=cfg.work_in_stylespace,
                randomize_noise=False,
                attention_layer=cfg.attention_layer,
                attention_map=amap,
                feature_map=fm)
            return gen_out.image

        if cfg.remat:
            synth_edit = jax.checkpoint(synth_edit)

        def loss_fn(mparams):
            new_latents, mo = self._mapper_forward(
                mparams, mapper_extra, cond_features, wplus2, styles2,
                feats2, att_text)
            img_gen = synth_edit(new_latents, mo.attention_map, feats2)
            gen_features = self.encode_image(loss_vars, img_gen)
            loss_consist = infonce_consistency(gen_features, cond_features)
            loss_perceptual = self.perceptual(loss_vars, img_gen, img2)
            ramp_a = jnp.clip((t - 0.15) / 0.1, 0.0, 1.0)
            ramp_b = jnp.clip((t - 0.05) / 0.1, 0.0, 1.0)
            # naming crosswire preserved (run_attention.py:1241-1243,1415):
            # loss_essence := tv, loss_secphase := reg, loss_identity := vgg
            total = (loss_consist
                     + ramp_a * (cfg.lambda_ess * mo.loss_tv
                                 + cfg.lambda_sec * mo.loss_reg)
                     + ramp_b * cfg.lambda_id * loss_perceptual
                     + cfg.lambda_delta * mo.loss_delta)
            aux = {"loss": total, "consist": loss_consist,
                   "perceptual": loss_perceptual, "delta": mo.loss_delta,
                   "reg": mo.loss_reg, "tv": mo.loss_tv,
                   "att_idx": att_idx[0].astype(jnp.float32)}
            return total, (aux, img_gen, mo.attention_map)

        (loss, (aux, img_gen, amap)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(mapper_params)

        frozen = t < cfg.freeze_attention_until
        grads = jax.tree.map(
            lambda g, keep: jnp.where(jnp.logical_or(keep, ~frozen), g, 0.0),
            grads,
            jax.tree.map(jnp.asarray, self.freeze_mask))
        updates, opt_state = self.opt.update(grads, opt_state, mapper_params)
        mapper_params = optax.apply_updates(mapper_params, updates)
        return mapper_params, opt_state, aux, img_gen, amap

    # ------------------------------------------------------------------ run
    def run(self, attention_text_bank: jnp.ndarray,
            log_every: int = 10, callback: Optional[Callable] = None,
            nan_guard: bool = True, start_step: int = 0,
            stop_fn: Optional[Callable[[], bool]] = None):
        """Training loop with basic failure detection (SURVEY.md §5: the
        reference has none): on a non-finite loss the step is rejected, the
        params roll back to the last known-finite state, and after 3
        consecutive bad checks the run aborts with a diagnostic.

        The guard only SYNCS at log points (every ``log_every`` steps plus
        the final step), piggybacking on the float() conversions logging
        already pays — between checks the host keeps dispatching ahead of
        the device with no round-trip (a per-step float() serialized
        dispatch against compute; ~40 ms/step on remote-dispatch backends,
        VERDICT r4 weak #5 / PERF.md "nan-guard de-sync"). Consequence:
        a NaN surfacing mid-window rolls back up to ``log_every`` steps to
        the last checked state. ``log_every=1`` restores per-step checking.

        ``attention_text_bank``: (K, D) CLIP encodings of the region prompts;
        each step samples one per batch item inside the jitted step (see
        ``_step``).

        ``start_step``: resume point — the per-step RNG stream is
        fast-forwarded so a resumed run continues the exact key sequence an
        uninterrupted run would see (bit-exact resume given restored
        params/opt_state; tests/test_preemption.py).
        ``stop_fn``: polled before each step; returning True ends the loop
        early (SIGTERM-driven preemption snapshots in the CLIs). The number
        of completed steps is left in ``self.steps_completed``.
        """
        key = jax.random.PRNGKey(self.cfg.seed)
        for _ in range(start_step):
            key, _ = jax.random.split(key)
        history = []
        last_good = (self.mapper_params, self.opt_state)
        bad_streak = 0
        self.steps_completed = start_step
        for i in range(start_step, self.cfg.step):
            if stop_fn is not None and stop_fn():
                break
            key, k = jax.random.split(key)
            new_params, new_opt, aux, img, amap = self.step_fn(
                self.mapper_params, self.opt_state, jnp.asarray(float(i)), k,
                attention_text_bank)
            is_log_step = i % log_every == 0 or i == self.cfg.step - 1
            if nan_guard and is_log_step:
                loss = float(aux["loss"])  # the loop's ONLY device sync
                if not np.isfinite(loss):
                    bad_streak += 1
                    self.mapper_params, self.opt_state = last_good
                    if bad_streak >= 3:
                        detail = {name: float(v) for name, v in aux.items()}
                        raise FloatingPointError(
                            f"non-finite loss at step {i} ({bad_streak} "
                            f"consecutive); aux={detail}")
                    continue
                bad_streak = 0
                last_good = (new_params, new_opt)
            self.mapper_params, self.opt_state = new_params, new_opt
            self.steps_completed = i + 1
            if is_log_step:
                scal = {name: float(v) for name, v in aux.items()}
                history.append((i, scal))
                if callback:
                    callback(i, scal, img, amap)
        return history
