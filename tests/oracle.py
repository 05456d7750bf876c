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


def _stub_heavy_modules():
    """Stub the reference's unavailable heavy deps (clip, torchvision,
    torch_fidelity) so attention/run_attention.py imports on this box."""
    import types

    if "clip" not in sys.modules:
        clip_mod = types.ModuleType("clip")
        clip_mod.tokenize = lambda *a, **k: torch.zeros(1, 77, dtype=torch.long)
        clip_mod.load = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("clip stub"))
        sys.modules["clip"] = clip_mod

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")
        functional = types.ModuleType("torchvision.transforms.functional")

        def gaussian_blur(img, ksize, sigma=None):
            if isinstance(ksize, (list, tuple)):
                ksize = ksize[0]
            if sigma is None:
                sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
            t = torch.arange(ksize, dtype=torch.float32) - (ksize - 1) / 2
            k1 = torch.exp(-(t ** 2) / (2 * sigma ** 2))
            k1 = k1 / k1.sum()
            c = img.shape[1]
            pad = ksize // 2
            x = torch.nn.functional.pad(img, (pad, pad, pad, pad),
                                        mode="reflect")
            kv = k1.view(1, 1, ksize, 1).repeat(c, 1, 1, 1)
            kh = k1.view(1, 1, 1, ksize).repeat(c, 1, 1, 1)
            x = torch.nn.functional.conv2d(x, kv, groups=c)
            x = torch.nn.functional.conv2d(x, kh, groups=c)
            return x

        functional.gaussian_blur = gaussian_blur
        transforms.functional = functional
        transforms.Normalize = lambda *a, **k: (lambda x: x)
        transforms.Compose = lambda ops: (lambda x: x)
        utils_mod = types.ModuleType("torchvision.utils")
        utils_mod.save_image = lambda *a, **k: None
        models_mod = types.ModuleType("torchvision.models")
        models_mod.vgg16 = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("torchvision stub: no pretrained vgg16"))
        tv.transforms = transforms
        tv.utils = utils_mod
        tv.models = models_mod
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional
        sys.modules["torchvision.utils"] = utils_mod
        sys.modules["torchvision.models"] = models_mod

    if "torch_fidelity" not in sys.modules:
        tf = types.ModuleType("torch_fidelity")
        tf.calculate_metrics = lambda *a, **k: {}
        tf.KEY_METRIC_ISC_MEAN = "isc"
        tf.KEY_METRIC_FID = "fid"
        sys.modules["torch_fidelity"] = tf

    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda x, *a, **k: x
        sys.modules["tqdm"] = tq

    try:
        import tensorboard  # noqa: F401
    except ImportError:
        tb = types.ModuleType("torch.utils.tensorboard")
        tb.SummaryWriter = object
        sys.modules["torch.utils.tensorboard"] = tb


def ref_run_attention():
    """Import attention/run_attention.py (mapper family oracle)."""
    require_reference()
    _stub_heavy_modules()
    att_dir = os.path.join(REFERENCE_ROOT, "attention")
    for p in (att_dir, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import run_attention  # noqa: PLC0415
    return run_attention


def ref_utils_demo():
    require_reference()
    _stub_heavy_modules()
    demo_dir = os.path.join(REFERENCE_ROOT, "show_demo")
    for p in (demo_dir, REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import utils_demo  # noqa: PLC0415
    return utils_demo


def ref_latent_mappers():
    require_reference()
    from mapper import latent_mappers  # noqa: PLC0415
    return latent_mappers


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
