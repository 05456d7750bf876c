"""Optional torch-reference oracle for real-weight validation.

Imports the read-only PyTorch reference (never vendored) to compute golden
outputs against which converted weights are gated. Everything degrades
gracefully: if torch or the reference repo is absent, callers get None and
report the parity check as skipped.

Used by cli/validate.py; the test suite has its own pytest-flavored twin in
tests/oracle.py.
"""

from __future__ import annotations

import os
import sys

REFERENCE_ROOT = os.environ.get("W2E_REFERENCE_ROOT", "/root/reference")

_patched = False


def _patch_cuda(torch):
    """The reference hard-codes .cuda() (models/stylegan2/op/fused_act.py:25);
    neutralize device moves so it runs on a CPU torch build."""
    global _patched
    if _patched:
        return
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _patched = True


def reference_available() -> bool:
    try:
        import torch  # noqa: F401, PLC0415
    except ImportError:
        return False
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def load_reference_module(dotted: str):
    """Import a module from the reference repo, or None if unavailable."""
    if not reference_available():
        return None
    import torch  # noqa: PLC0415

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _patch_cuda(torch)
    import importlib  # noqa: PLC0415

    try:
        return importlib.import_module(dotted)
    except Exception:
        return None
