"""1024² end-to-end oracle parity gate at the SHIPPING serving config.

VERDICT r4 Next #1: every prior parity number was measured at 64/256px with
the shipping levers proven exact *by composition* (tests/test_s2d.py,
test_tap_subsample_and_indices). This test measures the composed path
directly at the production resolution: the torch attention-fork generator
(attention/attention_model.py:473-676) at 1024², fixed W+ + fixed noise +
a fixed mask blended at layer 13, against

  (a) the fp32 shipping config — ``Generator(1024, s2d_octaves=1)`` with
      ``tap_controls`` subsampled capture (bench.py config 1 fp32 policy /
      EditSession._capture) — gated at SSIM >= 0.99 on both the capture
      and the masked-blend renders, plus max|Δ| on the returned style
      vectors and the captured taps;
  (b) the bf16 serving policy (dtype=bf16, rgb_dtype=bf16, s2d_octaves=1)
      — its 1024² SSIM is recorded (printed) and gated at the honest
      random-weight floor (see test_parity_headline.py:38-54 for why
      random weights are the adversarial case for bf16).

Batch 1, CPU torch oracle — minutes, marked slow.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.stylegan2 import convert_generator_params
from where2edit_tpu.editing.attention_mappers import tap_controls
from where2edit_tpu.eval.ssim import ssim
from where2edit_tpu.models.stylegan2 import Generator

from oracle import ref_attention_model, t2j

SIZE = 1024
ATTENTION_LAYER = 13  # the paper's production blend layer (64² features)
RNG = np.random.default_rng(1024)


@pytest.mark.slow
def test_ssim_1024_shipping_config_vs_reference():
    ref = ref_attention_model()
    torch.manual_seed(2024)
    tgen = ref.Generator(SIZE, 512, 8, channel_multiplier=2)
    tgen.eval()
    variables = jax.tree.map(
        jnp.asarray, convert_generator_params(tgen.state_dict(), SIZE))

    # fixed inputs: W+ (skips the MLP — pinned separately), per-layer noise,
    # a soft 64² mask at the blend layer's native resolution, and a fixed
    # S-space perturbation standing in for the mapper's edit
    w_np = RNG.standard_normal((1, tgen.n_latent, 512)).astype(np.float32)
    torch.manual_seed(77)
    tn = [torch.randn(1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2))
          for i in range(tgen.num_layers)]
    jn = [jnp.asarray(t2j(n, nhwc=True)) for n in tn]
    mask_np = RNG.random((1, 1, 64, 64)).astype(np.float32)

    # ---- torch oracle: full-res capture, then masked blend at layer 13
    with torch.no_grad():
        img_ref, _, styles_ref, feats_ref = tgen(
            [torch.from_numpy(w_np)], input_is_latent=True,
            return_features=True, noise=tn)
        s_edit_t = [s + 0.1 * torch.from_numpy(
            RNG.standard_normal(tuple(s.shape)).astype(np.float32))
            for s in styles_ref]
        img_edit_ref, _ = tgen(
            [s_edit_t], input_is_stylespace=True, noise=tn,
            attention_layer=ATTENTION_LAYER,
            attention_map=torch.from_numpy(mask_np), feature_map=feats_ref)

    # ---- (a) fp32 shipping path: s2d final octave + tap_controls capture
    jgen = Generator(size=SIZE, s2d_octaves=1)
    sub, keep = tap_controls(SIZE, ATTENTION_LAYER, ATTENTION_LAYER)
    cap = jgen.apply(variables, [jnp.asarray(w_np)], input_is_latent=True,
                     return_features=True, noise=jn,
                     tap_subsample=sub, tap_indices=keep)

    score_cap = float(ssim(cap.image, jnp.asarray(t2j(img_ref, nhwc=True))))
    assert score_cap >= 0.99, f"capture SSIM {score_cap}"

    # style vectors: exact layer-by-layer agreement
    assert len(cap.style_vector) == len(styles_ref)
    for i, (sj, st) in enumerate(zip(cap.style_vector, styles_ref)):
        d = np.max(np.abs(np.asarray(sj)
                          - st.numpy().reshape(np.asarray(sj).shape)))
        assert d <= 2e-4, f"style {i}: max|Δ| {d}"

    # captured taps: kept taps match the torch tap nearest-subsampled to
    # the same resolution (the source-side slice is x[:, ::s, ::s])
    for i in keep:
        fj = cap.feature_map[i]
        assert fj is not None, f"tap {i} missing"
        ft = t2j(feats_ref[i], nhwc=True)
        if ft.shape[1] > sub:
            s = ft.shape[1] // sub
            ft = ft[:, ::s, ::s, :]
        d = np.max(np.abs(np.asarray(fj, np.float32) - ft))
        scale = max(1.0, float(np.max(np.abs(ft))))
        assert d / scale <= 5e-3, f"tap {i}: max|Δ| {d} (scale {scale})"
    for i in range(len(cap.feature_map)):
        if i not in keep:
            assert cap.feature_map[i] is None

    # masked-blend render from the (subsampled) captured taps — the exact
    # serving path one_text_edit drives
    s_edit_j = [jnp.asarray(s.numpy().reshape(s.shape[0], -1))
                for s in s_edit_t]
    out = jgen.apply(variables, s_edit_j, input_is_stylespace=True, noise=jn,
                     attention_layer=ATTENTION_LAYER,
                     attention_map=jnp.asarray(mask_np.transpose(0, 2, 3, 1)),
                     feature_map=cap.feature_map)
    score_edit = float(ssim(out.image,
                            jnp.asarray(t2j(img_edit_ref, nhwc=True))))
    assert score_edit >= 0.99, f"edit SSIM {score_edit}"

    # ---- (b) the bf16 serving policy at 1024², same fixed inputs
    jgen16 = Generator(size=SIZE, dtype=jnp.bfloat16, rgb_dtype=jnp.bfloat16,
                       s2d_octaves=1)
    cap16 = jgen16.apply(variables, [jnp.asarray(w_np)], input_is_latent=True,
                         return_features=True, noise=jn,
                         tap_subsample=sub, tap_indices=keep)
    score16 = float(ssim(cap16.image.astype(jnp.float32),
                         jnp.asarray(t2j(img_ref, nhwc=True))))
    out16 = jgen16.apply(variables,
                         [s.astype(jnp.float32) for s in s_edit_j],
                         input_is_stylespace=True, noise=jn,
                         attention_layer=ATTENTION_LAYER,
                         attention_map=jnp.asarray(
                             mask_np.transpose(0, 2, 3, 1)),
                         feature_map=cap16.feature_map)
    score16_edit = float(ssim(out16.image.astype(jnp.float32),
                              jnp.asarray(t2j(img_edit_ref, nhwc=True))))
    print(f"[1024² parity] fp32 capture SSIM {score_cap:.5f} / edit "
          f"{score_edit:.5f}; bf16 policy capture {score16:.5f} / edit "
          f"{score16_edit:.5f}")
    # Honest random-weight floor at THIS resolution: measured 0.9646
    # capture on random weights (r5) — the 256px floor is 0.97
    # (test_parity_headline.py:38-54); four extra octaves of bf16
    # rounding compound further at 1024². This is exactly why the bench
    # headline is the fp32 (0.99-compliant) config and bf16 is the
    # labeled fast mode (BENCH/PERF.md).
    assert score16 >= 0.955, score16
    assert score16_edit >= 0.94, score16_edit
