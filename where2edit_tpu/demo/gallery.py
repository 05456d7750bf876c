"""Provided-celebs gallery — the reference demo's Real-mode default.

Reference: show_demo/try_demo.py:61-67 offers bundled celebrity images
('./imgs/<Name>.png', e4e-inverted on selection); the checkpoint registry
also carries an ``example_celebs.pt`` latent pack (utils.py:23-42). In a
zero-egress build neither ships, so the gallery resolves sources in order:

  1. ``celebs_path`` — an ``example_celebs.pt``-style torch file of W+
     latents (a dict name→(L,512)/(1,L,512) tensor, or one (N,L,512)
     tensor);
  2. ``images_dir`` — a directory of face images, e4e-inverted on first
     selection (needs a pSp/e4e encoder);
  3. built-in — faces synthesized from fixed seeds through the session's
     own generator (always available, no external weights).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp")


class CelebGallery:
    """Named face sources loadable into an ``EditSession`` without upload."""

    def __init__(self, session, *, celebs_path: Optional[str] = None,
                 images_dir: Optional[str] = None, psp=None,
                 n_builtin: int = 5, builtin_seed: int = 1000):
        self.session = session
        self.psp = psp
        self._latents = {}        # name -> (1, L, 512) numpy W+
        self._image_paths = {}    # name -> file path (lazy e4e invert)
        self._builtin = {}        # name -> seed
        if celebs_path:
            self._load_latent_pack(celebs_path)
        if images_dir and os.path.isdir(images_dir):
            for fn in sorted(os.listdir(images_dir)):
                if fn.lower().endswith(IMG_EXTS):
                    self._image_paths[os.path.splitext(fn)[0]] = \
                        os.path.join(images_dir, fn)
        if not self._latents and not self._image_paths:
            for i in range(n_builtin):
                self._builtin[f"Celeb {i + 1}"] = builtin_seed + i

    def _load_latent_pack(self, path: str) -> None:
        import torch  # noqa: PLC0415

        try:
            # latent packs are pure tensors/dicts — the safe loader suffices
            pack = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # legacy pickle pack: full unpickling can execute code, so this
            # path trusts the operator-supplied file (documented fallback)
            pack = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(pack, dict):
            items = pack.items()
        else:  # single (N, L, 512) tensor
            items = ((f"Celeb {i + 1}", pack[i]) for i in range(len(pack)))
        for name, w in items:
            w = np.asarray(torch.as_tensor(w).detach().float().numpy())
            if w.ndim == 2:
                w = w[None]
            self._latents[str(name)] = w

    def names(self) -> list:
        return (list(self._latents) + list(self._image_paths)
                + list(self._builtin))

    def load(self, name: str):
        """Load the named face into the session; returns the original image
        (same contract as EditSession.load_synthetic/load_latent)."""
        import jax  # noqa: PLC0415
        import jax.numpy as jnp  # noqa: PLC0415

        if name in self._latents:
            return self.session.load_latent(jnp.asarray(self._latents[name]))
        if name in self._image_paths:
            if self.psp is None:
                raise RuntimeError(
                    f"gallery image {name!r} needs an e4e encoder "
                    "(--e4e_ckpt) to invert")
            from PIL import Image  # noqa: PLC0415

            img = Image.open(self._image_paths[name]).convert("RGB")
            img = img.resize((256, 256))
            x = (np.asarray(img, np.float32) / 127.5 - 1.0)[None]
            w = self.psp.encode(jnp.asarray(x))
            return self.session.load_latent(w)
        if name in self._builtin:
            return self.session.load_synthetic(
                jax.random.PRNGKey(self._builtin[name]))
        raise KeyError(f"unknown gallery entry {name!r}; "
                       f"available: {self.names()}")
