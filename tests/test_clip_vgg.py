"""CLIP / VGG16 parity against torch oracles built from public architecture.

torchvision and the openai clip package are not installed here, so the
oracles are constructed in-test from torch primitives with the exact same
structure and state-dict naming; the converters consume those state dicts.
"""

import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from where2edit_tpu.convert.clip import convert_clip_params
from where2edit_tpu.convert.vgg import convert_vgg16_params
from where2edit_tpu.losses.clip_loss import clip_image_resize
from where2edit_tpu.models.clip_model import CLIP
from where2edit_tpu.models.clip_tokenizer import tokenize
from where2edit_tpu.models.vgg import Vgg16

from oracle import t2j

RNG = np.random.default_rng(21)


# ---------------------------------------------------------------- torch oracle
class TorchResBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, d * 4))
        self.mlp.add_module("gelu", nn.Identity())
        self.mlp.add_module("c_proj", nn.Linear(d * 4, d))
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, mask=None):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False, attn_mask=mask)
        x = x + y
        h = self.ln_2(x)
        h = self.mlp.c_fc(h)
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.mlp.c_proj(h)


class TorchTransformer(nn.Module):
    def __init__(self, width, layers, heads):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [TorchResBlock(width, heads) for _ in range(layers)])

    def forward(self, x, mask=None):
        for blk in self.resblocks:
            x = blk(x, mask)
        return x


class TorchCLIP(nn.Module):
    """Mini openai-CLIP with identical state-dict naming (ViT geometry
    scaled down for test cost)."""

    def __init__(self, res=64, patch=32, vw=64, vl=2, tw=32, tl=2, th=4,
                 embed=16, vocab=100, ctx=12):
        super().__init__()
        self.ctx = ctx

        class Visual(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, vw, patch, patch, bias=False)
                n = (res // patch) ** 2
                self.class_embedding = nn.Parameter(torch.randn(vw) * vw ** -0.5)
                self.positional_embedding = nn.Parameter(
                    torch.randn(n + 1, vw) * vw ** -0.5)
                self.ln_pre = nn.LayerNorm(vw)
                self.transformer = TorchTransformer(vw, vl, vw // 16)
                self.ln_post = nn.LayerNorm(vw)
                self.proj = nn.Parameter(torch.randn(vw, embed) * vw ** -0.5)

            def forward(self, x):
                x = self.conv1(x)
                x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
                cls = self.class_embedding.expand(x.shape[0], 1, -1)
                x = torch.cat([cls, x], dim=1) + self.positional_embedding
                x = self.ln_pre(x).permute(1, 0, 2)
                x = self.transformer(x).permute(1, 0, 2)
                return self.ln_post(x[:, 0]) @ self.proj

        self.visual = Visual()
        self.transformer = TorchTransformer(tw, tl, th)
        self.token_embedding = nn.Embedding(vocab, tw)
        self.positional_embedding = nn.Parameter(torch.randn(ctx, tw) * 0.01)
        self.ln_final = nn.LayerNorm(tw)
        self.text_projection = nn.Parameter(torch.randn(tw, embed) * tw ** -0.5)
        self.logit_scale = nn.Parameter(torch.tensor(np.log(1 / 0.07),
                                                     dtype=torch.float32))

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        mask = torch.full((self.ctx, self.ctx), float("-inf")).triu(1)
        x = self.transformer(x.permute(1, 0, 2), mask).permute(1, 0, 2)
        x = self.ln_final(x)
        return x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)] @ self.text_projection

    def forward(self, image, tokens):
        img = self.visual(image)
        txt = self.encode_text(tokens)
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        logits = self.logit_scale.exp() * img @ txt.t()
        return logits, logits.t()


@pytest.fixture(scope="module")
def clip_pair():
    torch.manual_seed(9)
    tmod = TorchCLIP()
    tmod.eval()
    jmod = CLIP(embed_dim=16, image_resolution=64, vision_width=64,
                vision_layers=2, vision_patch_size=32, context_length=12,
                vocab_size=100, text_width=32, text_heads=4, text_layers=2,
                vision_heads=64 // 16)
    variables = jax.tree.map(
        jnp.asarray,
        convert_clip_params(tmod.state_dict(), vision_layers=2, text_layers=2))
    return tmod, jmod, variables


def test_clip_encode_image(clip_pair):
    tmod, jmod, variables = clip_pair
    x = torch.from_numpy(RNG.standard_normal((2, 3, 64, 64)).astype(np.float32))
    with torch.no_grad():
        ref = tmod.visual(x).numpy()
    got = jmod.apply(variables, jnp.asarray(t2j(x, nhwc=True)),
                     method=jmod.encode_image)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_clip_encode_text_and_logits(clip_pair):
    tmod, jmod, variables = clip_pair
    tokens = np.zeros((3, 12), np.int64)
    for i, ln in enumerate([5, 7, 3]):
        tokens[i, 0] = 98
        tokens[i, 1:ln] = RNG.integers(1, 90, ln - 1)
        tokens[i, ln] = 99  # eot = argmax
    tt = torch.from_numpy(tokens)
    with torch.no_grad():
        ref_txt = tmod.encode_text(tt).numpy()
        x = torch.from_numpy(RNG.standard_normal((3, 3, 64, 64)).astype(np.float32))
        ref_logits, _ = tmod(x, tt)
    got_txt = jmod.apply(variables, jnp.asarray(tokens.astype(np.int32)),
                         method=jmod.encode_text)
    np.testing.assert_allclose(np.asarray(got_txt), ref_txt, rtol=2e-3, atol=2e-3)
    got_logits, got_t = jmod.apply(variables, jnp.asarray(t2j(x, nhwc=True)),
                                   jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got_logits), ref_logits.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_vgg16_features():
    torch.manual_seed(10)
    convs = {}
    layers = []
    plan = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
            (10, 128, 256), (12, 256, 256), (14, 256, 256),
            (17, 256, 512), (19, 512, 512), (21, 512, 512)]
    idx2conv = {i: nn.Conv2d(cin, cout, 3, padding=1) for i, cin, cout in plan}
    seq = []
    for i in range(23):
        if i in idx2conv:
            seq.append(idx2conv[i])
        elif i in (4, 9, 16):
            seq.append(nn.MaxPool2d(2, 2))
        else:
            seq.append(nn.ReLU())
    features = nn.Sequential(*seq)
    features.eval()

    x = torch.from_numpy(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32))
    with torch.no_grad():
        h = x
        taps = {}
        for i, m in enumerate(features):
            h = m(h)
            if i in (3, 8, 15, 22):
                taps[i] = h.numpy()

    sd = {f"features.{i}.{k}": v for i, m in idx2conv.items()
          for k, v in m.state_dict().items()}
    jmod = Vgg16()
    variables = jax.tree.map(jnp.asarray, convert_vgg16_params(sd))
    out = jmod.apply(variables, jnp.asarray(t2j(x, nhwc=True)))
    for got, ref in zip(out, (taps[3], taps[8], taps[15], taps[22])):
        np.testing.assert_allclose(np.asarray(got),
                                   ref.transpose(0, 2, 3, 1),
                                   rtol=2e-3, atol=2e-3)


def test_clip_resize_trick_shape():
    img = jnp.zeros((1, 1024, 1024, 3))
    assert clip_image_resize(img, 1024).shape == (1, 224, 224, 3)
    img = jnp.zeros((1, 256, 256, 3))
    # 256·7 = 1792, pool k=8 → 224
    assert clip_image_resize(img, 256).shape == (1, 224, 224, 3)


def test_tokenizer_fallback_shapes():
    toks = tokenize(["a face with blonde hair", "narrow eyes"])
    assert toks.shape == (2, 77)
    assert (toks[:, 0] == 49406).all()
    # EOT is the max id so argmax finds it (text tower contract)
    assert (toks.argmax(axis=1) > 0).all()


def test_infonce_single_device_matches_numpy():
    from where2edit_tpu.losses.infonce import infonce_consistency

    img = RNG.standard_normal((4, 8)).astype(np.float32)
    cond = RNG.standard_normal((4, 8)).astype(np.float32)
    got = float(infonce_consistency(jnp.asarray(img), jnp.asarray(cond)))

    imgn = img / np.linalg.norm(img, axis=-1, keepdims=True)
    condn = cond / np.linalg.norm(cond, axis=-1, keepdims=True)
    logits = imgn @ condn.T / 0.01
    logits = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    expect = -np.log(p[np.arange(4), np.arange(4)]).mean()
    np.testing.assert_allclose(got, expect, rtol=1e-5)
