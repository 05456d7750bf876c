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


class patched_cuda:
    """The reference hard-codes .cuda() (models/stylegan2/op/fused_act.py:25);
    neutralize device moves so it runs on a CPU torch build.

    Context manager: the monkeypatch is restored on exit so other torch code
    in the process keeps real device-move semantics. Reentrant (nesting keeps
    the patch until the outermost exit)."""

    _depth = 0
    _saved = None

    def __enter__(self):
        import torch  # noqa: PLC0415

        cls = patched_cuda
        if cls._depth == 0:
            cls._saved = (torch.Tensor.cuda, torch.nn.Module.cuda)
            torch.Tensor.cuda = lambda self, *a, **k: self
            torch.nn.Module.cuda = lambda self, *a, **k: self
        cls._depth += 1
        return self

    def __exit__(self, *exc):
        import torch  # noqa: PLC0415

        cls = patched_cuda
        cls._depth -= 1
        if cls._depth == 0:
            torch.Tensor.cuda, torch.nn.Module.cuda = cls._saved
            cls._saved = None
        return False


def reference_available() -> bool:
    try:
        import torch  # noqa: F401, PLC0415
    except ImportError:
        return False
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def load_reference_module(dotted: str):
    """Import a module from the reference repo, or None if unavailable.

    The import runs under ``patched_cuda`` (restored afterwards); callers
    must wrap reference module *construction and forwards* in their own
    ``with patched_cuda():`` block, since the reference calls .cuda() at
    call time too (e.g. fused_act.py:25)."""
    if not reference_available():
        return None
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib  # noqa: PLC0415

    try:
        with patched_cuda():
            return importlib.import_module(dotted)
    except Exception:
        return None
