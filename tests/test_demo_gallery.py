"""Provided-celebs gallery + server real-mode endpoints (VERDICT r3
missing #2): the reference demo's first-run experience is a no-upload Real
mode (show_demo/try_demo.py:61-67) and e4e inversion (:99-104)."""

import base64
import http.client
import io
import json
import threading
import types

import numpy as np
import pytest


def _tiny_args(**over):
    from where2edit_tpu.demo.app import build_argparser

    ns = build_argparser().parse_args([])
    defaults = dict(ckpt="/nonexistent", mapper=None, clip_ckpt=None,
                    e4e_ckpt=None, stylegan_size=32, attention_layer=4,
                    cluster_layer=4)
    defaults.update(over)
    for k, v in defaults.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope="module")
def tiny_session():
    from where2edit_tpu.demo.app import load_session

    return load_session(_tiny_args())


def test_gallery_builtin_seeded_faces(tiny_session):
    """No external weights: the gallery still offers a usable no-upload
    Real-mode flow (fixed-seed synthesized faces)."""
    import jax.numpy as jnp

    from where2edit_tpu.demo.gallery import CelebGallery
    from where2edit_tpu.models.clip_tokenizer import tokenize

    session, _ = tiny_session
    g = CelebGallery(session)
    assert len(g.names()) == 5
    img = g.load("Celeb 1")
    assert np.asarray(img).shape == (1, 32, 32, 3)
    # deterministic: same entry loads the same face
    img2 = g.load("Celeb 1")
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
    # and a full edit on the gallery face works
    out, amap = session.edit(jnp.asarray(tokenize(["grey hair"])))
    assert np.asarray(out).shape == (1, 32, 32, 3)
    with pytest.raises(KeyError):
        g.load("nope")


def test_gallery_latent_pack(tmp_path, tiny_session):
    """example_celebs.pt-style packs: dict name→W+ and bare (N,L,512)."""
    import torch

    from where2edit_tpu.demo.gallery import CelebGallery

    session, _ = tiny_session
    n_latent = session.generator.n_latent
    w = torch.randn(n_latent, 512)
    torch.save({"Taylor Swift": w, "Portrait": torch.randn(1, n_latent, 512)},
               tmp_path / "celebs.pt")
    g = CelebGallery(session, celebs_path=str(tmp_path / "celebs.pt"))
    assert g.names() == ["Taylor Swift", "Portrait"]
    img = g.load("Taylor Swift")
    assert np.asarray(img).shape == (1, 32, 32, 3)

    torch.save(torch.randn(3, n_latent, 512), tmp_path / "pack.pt")
    g2 = CelebGallery(session, celebs_path=str(tmp_path / "pack.pt"))
    assert g2.names() == ["Celeb 1", "Celeb 2", "Celeb 3"]
    g2.load("Celeb 3")


def test_gallery_images_dir_needs_encoder(tmp_path, tiny_session):
    from PIL import Image

    from where2edit_tpu.demo.gallery import CelebGallery

    session, _ = tiny_session
    Image.new("RGB", (64, 64), (128, 64, 32)).save(tmp_path / "Musk.png")
    g = CelebGallery(session, images_dir=str(tmp_path))
    assert g.names() == ["Musk"]
    with pytest.raises(RuntimeError, match="e4e"):
        g.load("Musk")

    # with an encoder the flow completes (stub: any (B,256,256,3)→W+)
    import jax.numpy as jnp

    psp = types.SimpleNamespace(encode=lambda x: jnp.zeros(
        (1, session.generator.n_latent, 512)))
    g2 = CelebGallery(session, images_dir=str(tmp_path), psp=psp)
    img = g2.load("Musk")
    assert np.asarray(img).shape == (1, 32, 32, 3)


@pytest.mark.slow
def test_server_celebs_and_invert_endpoints(tiny_session):
    """GET /celebs lists the gallery; POST /edit {"celeb"} drives the
    no-upload real flow; POST /invert e4e-inverts an uploaded image and
    /edit {"source":"session"} edits it."""
    from http.server import ThreadingHTTPServer

    import jax.numpy as jnp
    from PIL import Image

    from where2edit_tpu.demo.gallery import CelebGallery
    from where2edit_tpu.demo.server import make_handler

    session, closs = tiny_session
    session.latent = None  # fresh-start semantics for the 400 check
    psp = types.SimpleNamespace(encode=lambda x: jnp.zeros(
        (1, session.generator.n_latent, 512)))
    gallery = CelebGallery(session)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(session, closs, threading.Lock(), gallery, psp))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)

        def post(path, obj):
            conn.request("POST", path, body=json.dumps(obj),
                         headers={"Content-Type": "application/json"})
            r = conn.getresponse()
            return r.status, json.loads(r.read())

        conn.request("GET", "/celebs")
        celebs = json.loads(conn.getresponse().read())["celebs"]
        assert celebs == gallery.names()

        # no face loaded yet → session-source edit is a clean 400
        status, body = post("/edit", {"source": "session", "prompt": "x"})
        assert status == 400 and "no face" in body["error"]

        status, body = post("/edit", {"celeb": celebs[0],
                                      "prompt": "grey hair"})
        assert status == 200
        img = Image.open(io.BytesIO(base64.b64decode(body["edited"])))
        assert img.size == (32, 32)

        # invert an uploaded image, then edit the session face
        buf = io.BytesIO()
        Image.new("RGB", (64, 64), (200, 150, 100)).save(buf, format="PNG")
        status, body = post("/invert", {
            "image": base64.b64encode(buf.getvalue()).decode()})
        assert status == 200
        assert body["latent_shape"] == [1, session.generator.n_latent, 512]
        status, body = post("/edit", {"source": "session",
                                      "prompt": "grey hair"})
        assert status == 200 and "edited" in body

        # bad payloads are clean 400s
        status, body = post("/invert", {"image": "!!!notbase64"})
        assert status == 400

        # unknown gallery name → clean 400 JSON, not a dropped connection
        status, body = post("/edit", {"celeb": "No Such Person",
                                      "prompt": "grey hair"})
        assert status == 400 and "unknown gallery entry" in body["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_edit_cli_celeb_source(tmp_path, capsys):
    """w2e-edit --celeb: one-shot gallery edit (and 'list' mode)."""
    from where2edit_tpu.cli import edit as cli

    base = ["--ckpt", "/nonexistent", "--stylegan_size", "32",
            "--attention_layer", "4", "--cluster_layer", "4",
            "--output_dir", str(tmp_path / "out")]
    # listing names needs no dummy --text prompt (ADVICE r4)
    assert cli.main(base + ["--celeb", "list"]) == []
    assert "Celeb 1" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="--text is required"):
        cli.main(base + ["--celeb", "Celeb 3"])

    base += ["--text", "grey hair"]
    results = cli.main(base + ["--celeb", "Celeb 3"])
    assert results
    import os

    assert os.path.isfile(os.path.join(tmp_path, "out", "original.png"))


def test_server_invert_without_encoder(tiny_session):
    """No --e4e_ckpt → /invert refuses with a clear message."""
    from http.server import ThreadingHTTPServer

    from where2edit_tpu.demo.server import make_handler

    session, closs = tiny_session
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(session, closs, threading.Lock()))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/invert", body=json.dumps({"image": ""}),
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert "e4e" in json.loads(r.read())["error"]
        conn.request("GET", "/celebs")
        assert json.loads(conn.getresponse().read())["celebs"] == []
    finally:
        server.shutdown()
        server.server_close()
