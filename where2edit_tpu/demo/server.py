"""Dependency-free web demo (stdlib http.server).

Serves the same flows as the streamlit app (show_demo/try_demo.py) — seeded
synthesis, text edit with region attention, strength/coverage sliders —
without requiring streamlit. Start:

    python -m where2edit_tpu.demo.server --port 7860 [--ckpt ... --mapper ...]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!DOCTYPE html>
<html><head><title>where2edit-tpu demo</title><style>
body{font-family:sans-serif;max-width:1100px;margin:2em auto}
img{width:320px;image-rendering:auto;border:1px solid #ccc}
.row{display:flex;gap:12px}label{display:block;margin:6px 0}
</style></head><body>
<h2>Where You Edit is What You Get — TPU demo</h2>
<label>Source <select id=source><option value=syn selected>Synthesized (seed)
</option></select></label>
<label>Seed <input id=seed type=number value=0></label>
<label>Prompt <input id=prompt size=50 value="a person with grey hair"></label>
<label>Region <select id=region>
<option>skin</option><option>nose</option><option>eyes</option>
<option>eyebrows</option><option>ears</option><option>mouth</option>
<option selected>hair</option></select></label>
<label>Strength α <input id=strength type=range min=0 max=0.3 step=0.01 value=0.1>
<span id=sv>0.1</span></label>
<label>Coverage <input id=coverage type=range min=0 max=1 step=0.05 value=0>
<span id=cv>0</span></label>
<button onclick="edit()">Edit</button> <span id=status></span>
<div class=row>
<div><h4>original</h4><img id=orig></div>
<div><h4>edited</h4><img id=edit></div>
<div><h4>attention</h4><img id=att></div>
</div>
<script>
strength.oninput=()=>sv.textContent=strength.value;
coverage.oninput=()=>cv.textContent=coverage.value;
fetch('/celebs').then(r=>r.json()).then(j=>{
 for(const n of j.celebs){const o=document.createElement('option');
  o.value='celeb:'+n;o.textContent=n;source.appendChild(o);}});
async function edit(){
 status.textContent='running…';
 const src=source.value, body={seed:+seed.value,prompt:prompt.value,
  region:region.value,strength:+strength.value,coverage:+coverage.value};
 if(src.startsWith('celeb:')) body.celeb=src.slice(6);
 const r = await fetch('/edit',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify(body)});
 const j = await r.json();
 orig.src='data:image/jpeg;base64,'+j.original;
 edit.src='data:image/jpeg;base64,'+j.edited;
 att.src='data:image/jpeg;base64,'+j.attention;
 status.textContent=j.ms.toFixed(0)+' ms';
}
</script></body></html>"""


def _jpeg_b64(arr: np.ndarray, value_range=(-1, 1)) -> str:
    from PIL import Image

    from where2edit_tpu.utils.images import to_uint8

    u8 = to_uint8(arr, value_range)[0]
    if u8.shape[-1] == 1:
        u8 = np.repeat(u8, 3, axis=-1)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="JPEG", quality=92)
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(session, closs, lock, gallery=None, psp=None):
    import time

    import jax
    import jax.numpy as jnp

    from where2edit_tpu.demo.app import REGION_PROMPTS
    from where2edit_tpu.models.clip_tokenizer import tokenize

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip("/") == "/celebs":
                self._json({"celebs":
                            gallery.names() if gallery is not None else []})
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            if self.path.rstrip("/") == "/invert":
                self._invert(req)
                return
            t0 = time.time()
            with lock:
                if req.get("celeb") and gallery is not None:
                    # provided-celebs real mode (try_demo.py:63-67)
                    try:
                        gallery.load(str(req["celeb"]))
                    except (KeyError, RuntimeError) as e:
                        # unknown name, or an images_dir entry with no e4e
                        # encoder loaded — clean 400 like /invert gives
                        self._json({"error": str(e)}, 400)
                        return
                elif req.get("source") == "session":
                    # reuse the currently loaded face (e.g. after /invert)
                    if session.latent is None:
                        self._json({"error": "no face loaded; POST /invert "
                                    "or pass seed/celeb"}, 400)
                        return
                else:
                    session.load_synthetic(
                        jax.random.PRNGKey(int(req.get("seed", 0))))
                toks = jnp.asarray(tokenize([req.get("prompt", "")]))
                att = jnp.asarray(tokenize(
                    [REGION_PROMPTS.get(req.get("region", "hair"),
                                        "grey hair")]))
                threshold = 1.0 - 0.25 * float(req.get("coverage", 0.0))
                img, amap = session.edit(
                    toks, att, strength_alpha=float(req.get("strength", 0.1)),
                    attention_threshold=threshold)
                body = {
                    "original": _jpeg_b64(np.asarray(session.image)),
                    "edited": _jpeg_b64(np.asarray(img)),
                    "attention": _jpeg_b64(np.asarray(amap), (0, 1)),
                    "ms": (time.time() - t0) * 1000,
                }
            self._json(body)

        def _invert(self, req):
            """e4e inversion endpoint: {"image": <base64 png/jpg>} →
            the face is encoded to W+ and loaded into the session
            (try_demo.py:99-104); follow with /edit {"source":
            "session"}."""
            if psp is None:
                self._json({"error": "no e4e encoder loaded "
                            "(start with --e4e_ckpt)"}, 400)
                return
            from PIL import Image  # noqa: PLC0415

            try:
                raw = base64.b64decode(req.get("image", ""))
                pil = Image.open(io.BytesIO(raw)).convert("RGB")
            except Exception:
                self._json({"error": "invalid image payload"}, 400)
                return
            x = (np.asarray(pil.resize((256, 256)), np.float32)
                 / 127.5 - 1.0)[None]
            with lock:
                w = psp.encode(jnp.asarray(x))
                session.load_latent(w)
                body = {"original": _jpeg_b64(np.asarray(session.image)),
                        "latent_shape": list(np.asarray(w).shape)}
            self._json(body)

    return Handler


def main(argv=None):
    from where2edit_tpu.demo.app import (
        build_argparser,
        load_gallery,
        load_psp,
        load_session,
    )

    p = build_argparser()
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)
    session, closs = load_session(args)
    psp = load_psp(args)
    gallery = load_gallery(args, session, psp)
    # warm the jit caches so the first request isn't a multi-minute compile
    import jax
    import jax.numpy as jnp

    from where2edit_tpu.models.clip_tokenizer import tokenize

    session.load_synthetic(jax.random.PRNGKey(0))
    session.edit(jnp.asarray(tokenize(["warmup"])))
    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port),
        make_handler(session, closs, threading.Lock(), gallery, psp))
    print(f"demo ready → http://localhost:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
