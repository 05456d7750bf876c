"""StyleCLIP mapper training loop, TPU-native.

Reference: mapper/training/coach.py:19-272. Differences are idiomatic, not
semantic:
  * the whole step (decode w → decode w+0.1·mapper(w) → id/clip/l2 losses →
    Ranger/Adam update) is ONE jitted function — the reference's 3 separate
    forward graphs + eager losses become a single XLA program;
  * data-parallel scaling is a sharding annotation (mesh 'data' axis) instead
    of the reference's single-GPU 'cuda:0' pin (coach.py:25);
  * self-generated latent datasets are sampled with a jitted batched decode
    (truncation 0.7, coach.py:182-221).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from where2edit_tpu.editing.latent_mappers import STYLESPACE_DIMENSIONS
from where2edit_tpu.losses.clip_loss import clip_image_resize
from where2edit_tpu.parallel.mesh import make_mesh, shard_batch
from where2edit_tpu.train.checkpoints import save_checkpoint
from where2edit_tpu.train.ranger import ranger
from where2edit_tpu.utils.images import save_image_grid
from where2edit_tpu.utils.logging import MetricsWriter


@dataclasses.dataclass
class CoachConfig:
    """mapper/options/train_options.py defaults."""
    exp_dir: str = "experiments/run"
    description: str = "a person with purple hair"
    mapper_type: str = "LevelsMapper"
    work_in_stylespace: bool = False
    batch_size: int = 2
    test_batch_size: int = 1
    train_dataset_size: int = 5000
    test_dataset_size: int = 1000
    learning_rate: float = 0.5
    optim_name: str = "ranger"
    id_lambda: float = 0.1
    clip_lambda: float = 1.0
    latent_l2_lambda: float = 0.8
    stylegan_size: int = 1024
    max_steps: int = 50000
    board_interval: int = 50
    image_interval: int = 100
    save_interval: Optional[int] = None
    val_interval: int = 2000
    seed: int = 0
    use_mesh: bool = False


class Coach:
    def __init__(self, config: CoachConfig, *, generator, generator_variables,
                 mapper, mapper_variables=None,
                 clip_loss_fn: Optional[Callable] = None,
                 id_loss_fn: Optional[Callable] = None,
                 latent_avg: Optional[jnp.ndarray] = None,
                 text_tokens: Optional[np.ndarray] = None,
                 train_latents: Optional[np.ndarray] = None,
                 test_latents: Optional[np.ndarray] = None):
        self.cfg = config
        self.generator = generator
        self.gen_vars = generator_variables
        self.mapper = mapper
        self.clip_loss_fn = clip_loss_fn
        self.id_loss_fn = id_loss_fn
        self.latent_avg = latent_avg
        self.text_tokens = (None if text_tokens is None
                            else jnp.asarray(text_tokens))
        self.key = jax.random.PRNGKey(config.seed)
        self.global_step = 0
        self.best_val_loss = None
        self.mesh = make_mesh() if config.use_mesh else None

        if mapper_variables is None:
            self.key, k = jax.random.split(self.key)
            dummy = self._dummy_latents()
            mapper_variables = mapper.init({"params": k}, dummy)
        self.mapper_params = mapper_variables["params"]

        sched_lr = config.learning_rate
        if config.optim_name == "adam":
            self.opt = optax.adam(sched_lr)
        else:
            self.opt = ranger(sched_lr)
        self.opt_state = self.opt.init(self.mapper_params)

        self.train_latents = (train_latents if train_latents is not None
                              else self._generate_latents(
                                  config.train_dataset_size))
        self.test_latents = (test_latents if test_latents is not None
                             else self._generate_latents(
                                 config.test_dataset_size))

        os.makedirs(os.path.join(config.exp_dir, "checkpoints"), exist_ok=True)
        self.log_dir = os.path.join(config.exp_dir, "logs")
        self.metrics = MetricsWriter(self.log_dir)
        self._step_fn = self._build_step()
        self._eval_fn = self._build_eval()

    # ------------------------------------------------------------------ data
    def _dummy_latents(self):
        n_latent = self.generator.n_latent
        if self.cfg.work_in_stylespace:
            return [jnp.zeros((1, d)) for d in STYLESPACE_DIMENSIONS]
        return jnp.zeros((1, n_latent, 512))

    def _generate_latents(self, n: int) -> np.ndarray:
        """Self-sampled W+ dataset (coach.py:182-221): truncation 0.7."""
        bs = max(self.cfg.batch_size, 8)

        @jax.jit
        def sample(gv, z):
            out = self.generator.apply(
                gv, [z], truncation=0.7,
                truncation_latent=self.latent_avg, return_latents=True,
                randomize_noise=False)
            return out.latent

        chunks = []
        for i in range(0, n, bs):
            self.key, k = jax.random.split(self.key)
            z = jax.random.normal(k, (min(bs, n - i), 512))
            chunks.append(np.asarray(sample(self.gen_vars, z)))
        return np.concatenate(chunks, axis=0)[:n]

    # ------------------------------------------------------------------ step
    # All jitted paths thread gen_vars/loss variables as ARGUMENTS (weights
    # closed over become HLO constants — ~100x slower remote compiles).
    def _decode(self, gen_vars, w, *, return_latents=False):
        return self.generator.apply(
            gen_vars, [w] if not isinstance(w, (list, tuple)) else w,
            input_is_latent=not self.cfg.work_in_stylespace,
            input_is_stylespace=self.cfg.work_in_stylespace,
            randomize_noise=False, return_latents=return_latents)

    def _loss_variables(self) -> dict:
        lv = {}
        if self.id_loss_fn is not None:
            lv["id"] = self.id_loss_fn.variables
        if self.clip_loss_fn is not None:
            lv["clip"] = self.clip_loss_fn.variables
        return lv

    def _losses(self, loss_vars, w, x, w_hat, x_hat):
        cfg = self.cfg
        loss = jnp.zeros(())
        aux = {}
        if cfg.id_lambda > 0 and self.id_loss_fn is not None:
            loss_id, _ = self.id_loss_fn.apply(loss_vars["id"], x_hat, x)
            aux["loss_id"] = loss_id
            loss = loss + loss_id * cfg.id_lambda
        if cfg.clip_lambda > 0 and self.clip_loss_fn is not None:
            cl = self.clip_loss_fn
            resized = clip_image_resize(x_hat, cl.stylegan_size)
            logits, _ = cl.model.apply(loss_vars["clip"], resized,
                                       self.text_tokens)
            loss_clip = jnp.mean(1.0 - logits / 100.0)
            aux["loss_clip"] = loss_clip
            loss = loss + loss_clip * cfg.clip_lambda
        if cfg.latent_l2_lambda > 0:
            if cfg.work_in_stylespace:
                l2 = sum(jnp.mean(jnp.square(ch - c))
                         for ch, c in zip(w_hat, w))
            else:
                l2 = jnp.mean(jnp.square(w_hat - w))
            aux["loss_l2_latent"] = l2
            loss = loss + l2 * cfg.latent_l2_lambda
        aux["loss"] = loss
        return loss, aux

    def _forward(self, gen_vars, mapper_params, w):
        if self.cfg.work_in_stylespace:
            delta = self.mapper.apply({"params": mapper_params}, w)
            w_hat = [c + 0.1 * d for c, d in zip(w, delta)]
        else:
            w_hat = w + 0.1 * self.mapper.apply({"params": mapper_params}, w)
        out = self._decode(gen_vars, w_hat, return_latents=True)
        return w_hat, out.image

    def _build_step(self):
        def loss_fn(mapper_params, gen_vars, loss_vars, w, x):
            w_hat, x_hat = self._forward(gen_vars, mapper_params, w)
            return self._losses(loss_vars, w, x, w_hat, x_hat)

        def step(gen_vars, loss_vars, mapper_params, opt_state, w):
            x = self._decode(gen_vars, w).image
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                mapper_params, gen_vars, loss_vars, w, x)
            updates, opt_state = self.opt.update(grads, opt_state,
                                                 mapper_params)
            mapper_params = optax.apply_updates(mapper_params, updates)
            return mapper_params, opt_state, aux, x

        jit_step = jax.jit(step, donate_argnums=(2, 3))
        lv = self._loss_variables()
        return lambda params, opt_state, w: jit_step(
            self.gen_vars, lv, params, opt_state, w)

    def _build_eval(self):
        def evaluate(gen_vars, loss_vars, mapper_params, w):
            x = self._decode(gen_vars, w).image
            w_hat, x_hat = self._forward(gen_vars, mapper_params, w)
            _, aux = self._losses(loss_vars, w, x, w_hat, x_hat)
            return aux, x, x_hat

        jit_eval = jax.jit(evaluate)
        lv = self._loss_variables()
        return lambda params, w: jit_eval(self.gen_vars, lv, params, w)

    # ----------------------------------------------------------------- loops
    def _batches(self, latents: np.ndarray, batch_size: int, shuffle: bool):
        n = len(latents) // batch_size * batch_size
        order = (np.random.permutation(len(latents))[:n] if shuffle
                 else np.arange(n))
        for i in range(0, n, batch_size):
            batch = jnp.asarray(latents[order[i:i + batch_size]])
            if self.cfg.work_in_stylespace:
                batch = self._wplus_to_styles(batch)
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            yield batch

    def _wplus_to_styles(self, w):
        return self._decode_styles(self.gen_vars, w)

    @partial(jax.jit, static_argnums=0)
    def _decode_styles(self, gen_vars, w):
        out = self.generator.apply(gen_vars, [w], input_is_latent=True,
                                   return_latents=True, randomize_noise=False)
        return out.style_vector

    def train(self, stop_fn=None):
        """``stop_fn``: polled each step; returning True ends training
        with an atomic ``preempt`` checkpoint carrying optimizer state +
        step (SIGTERM handling in cli/mapper_train.py; the reference's
        Coach has no preemption story)."""
        cfg = self.cfg
        save_interval = cfg.save_interval or cfg.max_steps
        # <=: the final step RUNS at global_step == max_steps (it returns
        # from inside the loop after checkpointing). `<` would exit
        # silently — skipping the final step/checkpoint — whenever an
        # epoch boundary lands exactly on max_steps (e.g. a resumed run).
        while self.global_step <= cfg.max_steps:
            for w in self._batches(self.train_latents, cfg.batch_size, True):
                if stop_fn is not None and stop_fn():
                    self.checkpoint({"preempted_at": self.global_step},
                                    is_best=False, name="preempt")
                    return "preempted"
                t0 = time.time()
                self.mapper_params, self.opt_state, aux, x = self._step_fn(
                    self.mapper_params, self.opt_state, w)
                aux = {k: float(v) for k, v in aux.items()}
                aux["step_time"] = time.time() - t0

                if self.global_step % cfg.board_interval == 0:
                    for k, v in aux.items():
                        self.metrics.add_scalar(f"train/{k}", v,
                                                self.global_step)
                val = None
                if (self.global_step % cfg.val_interval == 0
                        or self.global_step == cfg.max_steps):
                    val = self.validate()
                    if val and (self.best_val_loss is None
                                or val["loss"] < self.best_val_loss):
                        self.best_val_loss = val["loss"]
                        self.checkpoint(val, is_best=True)
                if (self.global_step % save_interval == 0
                        or self.global_step == cfg.max_steps):
                    self.checkpoint(val or aux, is_best=False)
                if self.global_step == cfg.max_steps:
                    return
                self.global_step += 1

    def validate(self):
        agg = []
        for i, w in enumerate(self._batches(self.test_latents,
                                            self.cfg.test_batch_size, False)):
            if i > 200:
                break
            aux, x, x_hat = self._eval_fn(self.mapper_params, w)
            agg.append({k: float(v) for k, v in aux.items()})
            if i == 0:
                path = os.path.join(self.log_dir, "images_val",
                                    f"{self.global_step:05d}.jpg")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                save_image_grid(
                    np.concatenate([np.asarray(x), np.asarray(x_hat)]),
                    path, nrow=self.cfg.test_batch_size, scale_each=True)
            # sanity-only on the very first validation (coach.py:151-154)
            if self.global_step == 0 and i >= 4:
                return None
        mean = {k: float(np.mean([a[k] for a in agg])) for k in agg[0]}
        for k, v in mean.items():
            self.metrics.add_scalar(f"test/{k}", v, self.global_step)
        return mean

    def checkpoint(self, loss_dict, is_best: bool, name: str = ""):
        from flax import serialization  # noqa: PLC0415

        name = name or ("best_model" if is_best
                        else f"iteration_{self.global_step}")
        path = os.path.join(self.cfg.exp_dir, "checkpoints", name)
        # optimizer state + step ride along so --checkpoint_path resumes
        # training (not just warm-starts weights); inference consumers read
        # only tree["mapper"]
        save_checkpoint(path, {
            "mapper": self.mapper_params,
            "opt_state": serialization.to_state_dict(self.opt_state),
            "step": self.global_step,
        }, opts=dataclasses.asdict(self.cfg))
        with open(os.path.join(self.cfg.exp_dir, "checkpoints",
                               "timestamp.txt"), "a") as f:
            tag = "**Best**: " if is_best else ""
            f.write(f"{tag}Step - {self.global_step}, \n{loss_dict}\n")
