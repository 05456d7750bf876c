"""one_text_edit — the inference-grade editing API.

Reference: show_demo/utils_demo.py:142-157. Given CLIP text features, the
S-space (or W+) latents and the original feature taps, predicts edited
latents + a spatial attention mask, thresholds+blurs the mask, and
re-synthesizes with masked blending. The whole path is one jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from where2edit_tpu.editing.masks import demo_threshold
from where2edit_tpu.models.stylegan2 import blend_tap_indices  # noqa: F401  (re-export)
from where2edit_tpu.ops.gaussian_blur import gaussian_blur
from where2edit_tpu.ops.interpolate import interpolate_nearest


def subsample_for_mapper(feature_map, blend_size: int, indices=None):
    """Nearest-subsample every tap larger than the blend size (exact: the
    mapper's att convs are pointwise, so conv∘subsample = subsample∘conv).

    The per-edit program otherwise pays a strided gather over each full-res
    tap (profiled 1.5 ms/tap at 1024² batch 8) plus input relayout copies of
    taps the edit never reads at full resolution — pre-subsampling at
    capture time moves that cost to once per face (PERF.md).

    ``indices``: optional set of tap indices the mapper actually reads
    (``attention_tables(size)["layer_num"]`` — the non-to_rgb taps); other
    entries become None. The 3-channel to_rgb taps are lane-padded ~42x
    under the TPU (8,128) tiled layout, so even a strided *read* of them
    costs more than all the conv taps together — skipping them is most of
    the capture-stage win (PERF.md). The LAST entry is always kept
    regardless of ``indices``: every caller appends the const-input tap
    (run_attention.py:1110), which the mapper reads as feature_map[-1] but
    which is never in ``layer_num`` (keeping a surplus tap is merely
    unprofitable; dropping the const is a crash)."""
    keep = None if indices is None else set(indices) | {len(feature_map) - 1}
    return [None if (keep is not None and i not in keep)
            else interpolate_nearest(f, blend_size) if f.shape[1] > blend_size
            else f
            for i, f in enumerate(feature_map)]


def one_text_edit(*, generator, gen_vars, mapper, mapper_vars,
                  text_features, attention_text_features, latent, feature_map,
                  attention_layer: int, work_in_stylespace: bool = True,
                  strength_alpha: float = 0.1,
                  attention_threshold: float = 0.75,
                  deterministic_noise: bool = True,
                  mapper_feature_map=None):
    """Edit one batch. ``latent``: W+ (B,L,512) or list of S-space (B,C).

    ``mapper_feature_map``: optional pre-subsampled taps (see
    ``subsample_for_mapper``) consumed by the mapper; ``feature_map`` is
    still the blend source. Defaults to ``feature_map``.

    Returns (img_gen, new_latents, attention_map, new_feature_map).
    """
    blend_size = feature_map[attention_layer - 1].shape[1]
    m_feats = (feature_map if mapper_feature_map is None
               else mapper_feature_map)
    if work_in_stylespace:
        mo = mapper.apply(mapper_vars, text_features, latent, m_feats,
                          blend_size, attention_text=attention_text_features,
                          train=False, strength_alpha=strength_alpha,
                          pooled_map=True, finalize=False,
                          deterministic_noise=deterministic_noise)
        new_latents = mo.latents
        gen_in = new_latents
    else:
        mo = mapper.apply(mapper_vars, text_features, latent, m_feats,
                          blend_size, attention_text=attention_text_features,
                          train=False)
        new_latents = latent + mo.latents
        gen_in = [new_latents]

    amap = demo_threshold(mo.attention_map, attention_threshold)
    amap = gaussian_blur(amap, 5)

    out = generator.apply(
        gen_vars, gen_in,
        input_is_latent=not work_in_stylespace,
        input_is_stylespace=work_in_stylespace,
        randomize_noise=False, return_features=True,
        attention_layer=attention_layer, attention_map=amap,
        feature_map=feature_map)
    return out.image, new_latents, amap, out.feature_map


class EditSession:
    """Stateful demo session: holds models, caches the jitted edit fn.

    Mirrors show_demo/try_demo.py's cached-model flow: synthesize or invert a
    face once (keeping its S-space latents + feature taps), then edit with
    arbitrary prompts at interactive rates.
    """

    def __init__(self, *, generator, gen_vars, mapper, mapper_vars,
                 clip_encode_text, attention_layer: int = 13,
                 work_in_stylespace: bool = True):
        self.generator = generator
        self.gen_vars = gen_vars
        self.mapper = mapper
        self.mapper_vars = mapper_vars
        self.clip_encode_text = clip_encode_text
        self.attention_layer = attention_layer
        self.work_in_stylespace = work_in_stylespace
        self.latent = None
        self.feature_map = None
        self.mapper_feature_map = None
        self.image = None
        # strength/threshold stay *traced* so slider moves don't recompile.
        # Only (img, latents, map) leave the program — the edited feature
        # taps would otherwise be materialized as outputs (26 tensors up to
        # 1024²) on every slider move; dropping them here lets XLA DCE the
        # tap collection entirely. All variable trees are jit ARGUMENTS:
        # weights closed over become HLO constants, which compile ~100x
        # slower on remote-compile backends.
        def _edit_fn(g_vars, m_vars, **kw):
            # prompt sweep: N prompts over ONE cached face run as a single
            # batch-N program — the face's latents/taps broadcast to the
            # text batch (free for XLA; the synthesis then amortizes like
            # any batched edit). No reference equivalent (try_demo edits
            # one prompt per click).
            n = kw["text_features"].shape[0]
            lat = kw["latent"]
            b = (lat[0] if isinstance(lat, (list, tuple)) else lat).shape[0]
            if b == 1 and n > 1:
                def tile(x):
                    return (None if x is None
                            else jnp.broadcast_to(x, (n,) + x.shape[1:]))

                kw["latent"] = ([tile(s) for s in lat]
                                if isinstance(lat, (list, tuple))
                                else tile(lat))
                for name in ("feature_map", "mapper_feature_map"):
                    if kw.get(name) is not None:
                        kw[name] = [tile(f) for f in kw[name]]
            img, new_lat, amap, _ = one_text_edit(
                generator=generator, gen_vars=g_vars, mapper=mapper,
                mapper_vars=m_vars, attention_layer=attention_layer,
                work_in_stylespace=work_in_stylespace, **kw)
            return img, new_lat, amap

        self._edit_jit = jax.jit(_edit_fn)
        self._edit = lambda **kw: self._edit_jit(self.gen_vars,
                                                 self.mapper_vars, **kw)
        self._sample_w = jax.jit(
            lambda g_vars, key, trunc, mean, batch: self.generator.apply(
                g_vars,
                [jax.random.normal(key, (batch, 512))], truncation=trunc,
                truncation_latent=mean, return_latents=True,
                randomize_noise=False).latent,
            static_argnums=(2, 4))  # generator branches on truncation < 1
        def _capture(g_vars, w):
            from where2edit_tpu.editing.attention_mappers import (  # noqa: PLC0415
                tap_controls,
            )

            # the generator emits mapper-ready taps directly: taps above the
            # blend resolution are nearest-subsampled AT THE SOURCE (exact —
            # the mapper's attention convs are pointwise; s2d octaves slice
            # in s2d space, skipping every depth_to_space relayout) and taps
            # nothing reads are never materialized. The blend-read taps sit
            # exactly at the blend resolution, so one list serves both the
            # generator blend and the mapper; the cluster tap stays
            # native-res. tap_controls is the single source of truth.
            cluster_layer = getattr(self.mapper, "cluster_layer",
                                    attention_layer)
            blend, keep = tap_controls(self.generator.size, attention_layer,
                                       cluster_layer)
            return self.generator.apply(
                g_vars, [w], input_is_latent=True,
                randomize_noise=False, return_features=True,
                tap_subsample=blend, tap_indices=keep)

        self._capture_fn = jax.jit(_capture)

    def load_synthetic(self, key, truncation: float = 0.7,
                       mean_latent: Optional[jnp.ndarray] = None,
                       batch: int = 1, sharding=None):
        """Seeded sample (try_demo 'Syn' mode).

        ``sharding``: optional NamedSharding for the sampled W+ batch —
        placing it batch-sharded over a data mesh makes GSPMD run the
        capture (and every later edit on this session) data-parallel; the
        reference's distributed eval analogue (utils.py:529-533)."""
        if mean_latent is None:
            if not hasattr(self, "_mean_latent"):
                from where2edit_tpu.models.stylegan2 import Generator  # noqa: PLC0415

                self._mean_latent = jax.jit(
                    lambda v, k: self.generator.apply(
                        v, k, 4096,
                        method=Generator.mean_latent))(
                    self.gen_vars, jax.random.PRNGKey(0))
            mean_latent = self._mean_latent
        wplus = self._sample_w(self.gen_vars, key, truncation, mean_latent,
                               batch)
        if sharding is not None:
            wplus = jax.device_put(wplus, sharding)
        return self._capture(wplus)

    def load_latent(self, wplus: jnp.ndarray):
        """e4e-inverted W+ (try_demo 'Real' mode)."""
        return self._capture(wplus)

    def _capture(self, wplus):
        out = self._capture_fn(self.gen_vars, wplus)
        const = self.gen_vars["params"]["input"]["input"]
        const_b = jnp.broadcast_to(const, (wplus.shape[0],
                                           *const.shape[1:]))
        self.feature_map = list(out.feature_map) + [const_b]
        self.mapper_feature_map = self.feature_map
        self.image = out.image
        self.latent = (out.style_vector if self.work_in_stylespace
                       else out.latent)
        return out.image

    def edit(self, prompt_tokens, attention_tokens=None,
             strength_alpha: float = 0.1, attention_threshold: float = 0.75):
        """Edit the loaded face(s). Token batch must equal the face batch,
        EXCEPT the prompt-sweep case: with ONE loaded face, a batch of N
        prompt rows runs as a single batch-N program (latents/taps
        broadcast) and returns N edited images/maps."""
        if self.latent is None:
            raise RuntimeError("load a face first (load_synthetic/load_latent)")
        text = self.clip_encode_text(prompt_tokens)
        att = (self.clip_encode_text(attention_tokens)
               if attention_tokens is not None else text)
        img, new_lat, amap = self._edit(
            text_features=text, attention_text_features=att,
            latent=self.latent, feature_map=self.feature_map,
            mapper_feature_map=self.mapper_feature_map,
            strength_alpha=jnp.float32(strength_alpha),
            attention_threshold=jnp.float32(attention_threshold))
        return img, amap
