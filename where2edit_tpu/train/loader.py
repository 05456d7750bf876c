"""Asynchronous host-side data pipeline for adversarial training.

The GAN host loop is dispatch-bound on TPU: the device steps are enqueued
asynchronously, so the only synchronous host work per iteration is
decoding/augmenting the real-image batch. This module moves that work off
the critical path — a producer thread keeps ``prefetch`` batches in flight,
decoding individual images on a thread pool (PIL's JPEG/PNG decode releases
the GIL) and ``jax.device_put``-ing each finished batch so the host→device
copy also overlaps the previous step's compute.

The reference trains through ``torch.utils.data.DataLoader(num_workers=N)``
over an lmdb of pre-resized images; this is the TPU-native equivalent
(threads instead of worker processes — the decode work is GIL-releasing C,
and device_put must happen in the owning process anyway).

Determinism: the producer draws sample indices from the ``numpy`` Generator
handed in, in batch order — with ``hflip`` off the emitted stream is
bit-identical to calling ``bank.sample(rng, batch)`` in a synchronous loop
with the same Generator state. Flip coins come from a separate Generator so
enabling augmentation does not perturb the index stream.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np


class PrefetchLoader:
    """Background-producer iterator over an ``ImageBank``.

    Yields float32 (batch, size, size, 3) arrays in [-1, 1], already
    device-resident (``jax.device_put``; pass ``sharding`` to land batches
    pre-sharded for a DP mesh). Use as a context manager or call
    ``close()`` — the producer thread is daemonic but draining it promptly
    releases the decode pool.
    """

    def __init__(self, bank, batch: int, *, rng: np.random.Generator,
                 workers: int = 4, prefetch: int = 3,
                 hflip: bool = False, flip_seed: int = 0,
                 sharding=None, device_put: bool = True):
        if batch <= 0 or workers <= 0 or prefetch <= 0:
            raise ValueError("batch, workers, prefetch must be positive")
        self.bank = bank
        self.batch = batch
        self.rng = rng
        self.hflip = hflip
        # flip_seed: int seed, or an already-positioned Generator (used by
        # cli/train_stylegan.py --resume to continue the flip stream)
        self.flip_rng = (flip_seed if isinstance(flip_seed,
                                                 np.random.Generator)
                         else np.random.default_rng(flip_seed))
        self.sharding = sharding
        self.device_put = device_put
        self._pool = ThreadPoolExecutor(max_workers=workers,
                                        thread_name_prefix="w2e-decode")
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._producer = threading.Thread(target=self._produce, daemon=True,
                                          name="w2e-prefetch")
        self._producer.start()

    # ----------------------------------------------------------- producer
    def _make_batch(self) -> np.ndarray:
        idx = self.rng.integers(0, len(self.bank), size=self.batch)
        imgs = list(self._pool.map(self.bank._load_one,
                                   [int(i) for i in idx]))
        out = np.stack(imgs)
        if self.hflip:
            coins = self.flip_rng.random(self.batch) < 0.5
            if coins.any():
                out = out.copy()
                out[coins] = out[coins][:, :, ::-1, :]
        return out

    def _produce(self):
        try:
            while not self._stop.is_set():
                arr = self._make_batch()
                if self.device_put:
                    import jax  # noqa: PLC0415

                    arr = jax.device_put(arr, self.sharding)
                # bounded put that stays responsive to close()
                while not self._stop.is_set():
                    try:
                        self._queue.put(arr, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
            self._stop.set()

    # ----------------------------------------------------------- consumer
    def __iter__(self):
        return self

    def __next__(self):
        while True:
            # valid prefetched batches drain before any stored producer
            # error surfaces (they were produced before the failure)
            try:
                return self._queue.get_nowait()
            except queue.Empty:
                pass
            if self._error is not None:
                # fresh wrapper per raise: re-raising the stored exception
                # object would accrete traceback frames across calls
                raise RuntimeError(
                    f"PrefetchLoader producer failed: "
                    f"{type(self._error).__name__}: {self._error}"
                ) from self._error
            try:
                return self._queue.get(timeout=0.1)
            except queue.Empty:
                if self._stop.is_set() and self._error is None:
                    raise StopIteration from None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def close(self):
        self._stop.set()
        # drain so a blocked put() observes the stop event
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._producer.join(timeout=5.0)
        self._pool.shutdown(wait=False)
