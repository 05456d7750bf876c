"""Latent datasets + CelebAMask-HQ loader.

Reference: mapper/datasets/latents_dataset.py:5-37 and utils.py:554-619.
Host-side numpy iterables (TPU batches are materialized by the trainers).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from where2edit_tpu.editing.latent_mappers import STYLESPACE_DIMENSIONS


class LatentsDataset:
    """Thin view over a W+ latent tensor (latents_dataset.py:5-15)."""

    def __init__(self, latents: np.ndarray):
        self.latents = np.asarray(latents)

    def __len__(self):
        return len(self.latents)

    def __getitem__(self, i):
        return self.latents[i]


class StyleSpaceLatentsDataset:
    """Zero-pads per-layer style vectors to 512 and concatenates
    (latents_dataset.py:18-37)."""

    def __init__(self, latents: list):
        padded = []
        for latent in latents:  # latent: (N, 1, C) or (N, C)
            arr = np.asarray(latent)
            if arr.ndim == 2:
                arr = arr[:, None, :]
            pad = 512 - arr.shape[-1]
            padded.append(np.pad(arr, ((0, 0), (0, 0), (0, pad))))
        self.latents = np.concatenate(padded, axis=-1)  # (N, 1, 26·512)

    def __len__(self):
        return len(self.latents)

    def __getitem__(self, i):
        return self.latents[i]


def convert_s_tensor_to_list(batch: np.ndarray) -> list:
    """mapper/training/train_utils.py:17-21."""
    return [batch[:, :, 512 * i: 512 * i + d]
            for i, d in enumerate(STYLESPACE_DIMENSIONS)]


class CelebAMaskHQ:
    """Image/label pair loader (utils.py:554-591). Yields (PIL image paths
    resolved lazily); use ``load(i, img_size, label_size)`` for arrays."""

    def __init__(self, img_path: str, label_path: str):
        self.pairs = []
        if not os.path.isdir(img_path):
            return
        n = len([f for f in os.listdir(img_path)
                 if os.path.isfile(os.path.join(img_path, f))])
        for i in range(n):
            self.pairs.append((os.path.join(img_path, f"{i}.jpg"),
                               os.path.join(label_path, f"{i}.png")))

    def __len__(self):
        return len(self.pairs)

    def load(self, i: int, img_size: int = 256,
             label_size: Optional[int] = None):
        from PIL import Image  # noqa: PLC0415

        img_p, lbl_p = self.pairs[i]
        img = Image.open(img_p).convert("RGB").resize((img_size, img_size))
        img_arr = np.asarray(img, np.float32) / 127.5 - 1.0  # utils.py:594-605
        lbl = Image.open(lbl_p)
        if label_size:
            lbl = lbl.resize((label_size, label_size), Image.NEAREST)
        lbl_arr = np.asarray(lbl).astype(np.int64)
        return img_arr, lbl_arr


class ImageBank:
    """Host-side real-image source for adversarial training (NHWC, [-1,1]).

    Three backings, all lazy where it matters:
      * a directory of images — paths are indexed up front, pixels are
        decoded per sampled batch (FFHQ-scale sets never fit in RAM);
      * a .npy/.npz array (N, H, W, 3), uint8 or float — opened as a
        memmap so sampling touches only the drawn rows;
      * an in-memory array (tests / synthetic data).

    ``sample(rng, batch)`` returns a float32 (batch, size, size, 3) array in
    [-1, 1] — the trainer's expected range (images decode like the
    reference's transform_img, utils.py:594-605).
    """

    _EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

    def __init__(self, images: Optional[np.ndarray] = None,
                 paths: Optional[list] = None, size: Optional[int] = None):
        if (images is None) == (paths is None):
            raise ValueError("exactly one of images/paths")
        self.images = images
        self.paths = paths
        self.size = size

    @classmethod
    def from_path(cls, path: str, size: int) -> "ImageBank":
        if os.path.isdir(path):
            paths = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.lower().endswith(cls._EXTS))
            if not paths:
                raise FileNotFoundError(f"no images under {path}")
            return cls(paths=paths, size=size)
        if path.endswith(".npz"):
            data = np.load(path)
            arr = data[list(data.keys())[0]]
        elif path.endswith(".npy"):
            arr = np.load(path, mmap_mode="r")
        else:
            raise ValueError(f"unsupported data path {path} "
                             "(dir | .npy | .npz)")
        return cls(images=arr, size=size)

    def __len__(self):
        return len(self.paths) if self.paths is not None else len(self.images)

    def _normalize(self, arr: np.ndarray) -> np.ndarray:
        arr = np.asarray(arr, np.float32)
        if arr.max() > 1.5:  # uint8-range pixels
            arr = arr / 127.5 - 1.0
        return arr

    def _load_one(self, i: int) -> np.ndarray:
        if self.paths is not None:
            from PIL import Image  # noqa: PLC0415

            img = Image.open(self.paths[i]).convert("RGB")
            if self.size and img.size != (self.size, self.size):
                img = img.resize((self.size, self.size), Image.BILINEAR)
            return self._normalize(np.asarray(img, np.float32))
        img = self._normalize(self.images[i])
        if self.size and img.shape[0] != self.size:
            from PIL import Image  # noqa: PLC0415

            u8 = ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
            img = self._normalize(np.asarray(
                Image.fromarray(u8).resize((self.size, self.size),
                                           Image.BILINEAR), np.float32))
        return img

    def sample(self, rng: np.random.Generator, batch: int) -> np.ndarray:
        idx = rng.integers(0, len(self), size=batch)
        return np.stack([self._load_one(int(i)) for i in idx])
