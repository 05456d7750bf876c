"""Checkpointing: orbax when available, msgpack fallback.

Replaces the reference's raw torch.save dicts (coach.py:163-172,
run_attention.py:1437,1486) with framework-native trees; the ``opts`` dict is
persisted alongside exactly like the reference so inference can re-hydrate
configuration (mapper/scripts/inference.py:29-32).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Any, opts: Optional[dict] = None) -> None:
    """Save a pytree (+opts json) to ``path`` (directory).

    Atomic: the tree is staged into a sibling temp directory and renamed
    into place, so a writer killed mid-save (preemption, SIGTERM) never
    leaves a half-written checkpoint at ``path`` — either the new or the
    previous checkpoint is always complete and loadable (the CLI
    preemption snapshots rely on this; see tests/test_preemption.py).
    Caveat on overwrite: between the two renames there is a window where
    the prior complete checkpoint sits at ``{path}.old-*`` instead of
    ``path``; ``load_checkpoint`` recovers it automatically.
    """
    import glob  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    def _rm(p):
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                pass

    # stale residue from any earlier (possibly different-pid) crashed save
    for leftover in glob.glob(f"{path}.tmp-*"):
        _rm(leftover)
    if os.path.exists(path):  # keep .old-* for recovery only while missing
        for leftover in glob.glob(f"{path}.old-*"):
            _rm(leftover)
    tmp = f"{path}.tmp-{os.getpid()}"
    os.makedirs(tmp)
    try:
        import orbax.checkpoint as ocp  # noqa: PLC0415

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.join(tmp, "state"), _to_numpy_tree(tree),
                   force=True)
    except Exception:
        from flax import serialization  # noqa: PLC0415

        with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_numpy_tree(tree)))
    if opts is not None:
        with open(os.path.join(tmp, "opts.json"), "w") as f:
            json.dump(opts, f, indent=2, default=str)
    old = None
    if os.path.exists(path):  # rename can't clobber a non-empty dir
        old = f"{path}.old-{os.getpid()}"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.rename(path, old)
    os.rename(tmp, path)
    if old is not None:
        shutil.rmtree(old)


def load_checkpoint(path: str, target: Any = None):
    """Load a pytree saved by save_checkpoint. Returns (tree, opts|None).

    If ``path`` is missing but a ``{path}.old-*`` sibling exists (a writer
    died between save_checkpoint's two renames), the stranded prior
    checkpoint is restored to ``path`` first.
    """
    import glob  # noqa: PLC0415

    path = os.path.abspath(path)
    if not os.path.isdir(path):
        stranded = sorted(glob.glob(f"{path}.old-*"))
        if stranded:
            os.rename(stranded[0], path)
    opts = None
    opts_path = os.path.join(path, "opts.json")
    if os.path.isfile(opts_path):
        with open(opts_path) as f:
            opts = json.load(f)
    state_dir = os.path.join(path, "state")
    if os.path.isdir(state_dir):
        import orbax.checkpoint as ocp  # noqa: PLC0415

        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(state_dir)
        return tree, opts
    msgpack = os.path.join(path, "state.msgpack")
    if os.path.isfile(msgpack):
        from flax import serialization  # noqa: PLC0415

        with open(msgpack, "rb") as f:
            data = f.read()
        if target is not None:
            return serialization.from_bytes(target, data), opts
        return serialization.msgpack_restore(data), opts
    raise FileNotFoundError(f"no checkpoint under {path}")
