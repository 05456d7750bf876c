"""Checkpoint registry / auto-fetch paths (utils/registry.py).

Mirrors /root/reference/utils.py:45-67; gdown is not installed in this
zero-egress image, so the download path is exercised with an injected fake
module and the ImportError fallback with the module absent.
"""

import sys
import types

from where2edit_tpu.utils.registry import (
    GOOGLE_DRIVE_PATHS,
    ensure_checkpoint_exists,
)


def test_existing_file_short_circuits(tmp_path):
    f = tmp_path / "weights.pt"
    f.write_bytes(b"x")
    assert ensure_checkpoint_exists(str(f)) is True


def test_unknown_name_prints_and_returns_false(tmp_path, capsys):
    missing = str(tmp_path / "not-in-registry.pt")
    assert ensure_checkpoint_exists(missing) is False
    out = capsys.readouterr().out
    assert "not found" in out and "manually" in out


def test_download_via_mocked_gdown(tmp_path, monkeypatch):
    calls = {}

    def fake_download(url, path, quiet=False):
        calls["url"], calls["path"] = url, path
        with open(path, "wb") as fh:
            fh.write(b"ckpt-bytes")
        return path

    fake = types.ModuleType("gdown")
    fake.download = fake_download
    monkeypatch.setitem(sys.modules, "gdown", fake)

    monkeypatch.chdir(tmp_path)
    name = "stylegan2-ffhq-config-f.pt"
    assert ensure_checkpoint_exists(name) is True
    assert calls["url"] == GOOGLE_DRIVE_PATHS[name]
    assert calls["path"] == name


def test_gdown_absent_prints_url(tmp_path, monkeypatch, capsys):
    monkeypatch.setitem(sys.modules, "gdown", None)  # forces ImportError
    monkeypatch.chdir(tmp_path)
    name = "example_celebs.pt"
    assert ensure_checkpoint_exists(name) is False
    out = capsys.readouterr().out
    assert "gdown" in out and GOOGLE_DRIVE_PATHS[name] in out


def test_mapper_registry_covers_all_14_pretrained():
    mappers = [k for k in GOOGLE_DRIVE_PATHS if k.startswith("mapper/")]
    assert len(mappers) == 14
