"""Torch oracle: import the read-only reference implementation for parity.

The reference at /root/reference is used strictly as a *numerical test
oracle* — its modules are imported (never copied) and evaluated on CPU to
produce golden outputs for the TPU-native implementation. The reference
hard-codes ``.cuda()`` in fused_act (models/stylegan2/op/fused_act.py:25);
we neutralize device moves so it runs on the CPU torch build.
"""

import os
import sys

import numpy as np
import pytest
import torch

REFERENCE_ROOT = os.environ.get("W2E_REFERENCE_ROOT", "/root/reference")

_patched = False


def _patch_cuda():
    global _patched
    if _patched:
        return
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _patched = True


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def require_reference():
    if not reference_available():
        pytest.skip("reference repo not available for oracle tests")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _patch_cuda()


def ref_stylegan2():
    require_reference()
    from models.stylegan2 import model as ref_model  # noqa: PLC0415
    return ref_model


def ref_attention_model():
    require_reference()
    att_dir = os.path.join(REFERENCE_ROOT, "attention")
    if att_dir not in sys.path:
        sys.path.insert(0, att_dir)
    import attention_model  # noqa: PLC0415
    return attention_model


def ref_upfirdn2d():
    require_reference()
    import importlib  # noqa: PLC0415
    # the op package re-exports the function under the module's name, so a
    # plain ``import a.b as m`` would bind the function; go via importlib.
    return importlib.import_module("models.stylegan2.op.upfirdn2d")


def ref_encoders():
    require_reference()
    from models.encoders import psp_encoders  # noqa: PLC0415
    return psp_encoders


def ref_irse():
    require_reference()
    from models.facial_recognition import model_irse  # noqa: PLC0415
    return model_irse


def t2j(x: torch.Tensor, nhwc: bool = False) -> np.ndarray:
    """torch tensor → numpy (optionally NCHW→NHWC)."""
    a = x.detach().cpu().numpy()
    if nhwc and a.ndim == 4:
        a = a.transpose(0, 2, 3, 1)
    return a


def j2t(x, nchw: bool = False) -> torch.Tensor:
    a = np.asarray(x)
    if nchw and a.ndim == 4:
        a = a.transpose(0, 3, 1, 2)
    return torch.from_numpy(a.copy())
