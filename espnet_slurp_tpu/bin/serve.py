"""Minimal ASR serving endpoint over an exported StableHLO artifact.

Production-deployment demo (no reference equivalent — the reference serves
through a live torch runtime): loads a ``bin/export_model.py`` artifact
(no model code / config / checkpoint needed) and answers

    POST /recognize   body: raw 16 kHz mono PCM16 (or f32) bytes
                      -> JSON {"text": ..., "n_samples": ...}
    GET  /healthz     -> ok

Requests are padded to the artifact's static (batch, num_samples) bucket —
the TPU-serving shape discipline; longer audio is rejected with 413 (run
export_model again with a bigger bucket, one artifact per bucket).
Stdlib http.server only; real deployments front this with their own
batcher.
"""
from __future__ import annotations

import argparse
import json
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_handler(call, tokens, meta, dtype: str):
    import numpy as np
    import jax.numpy as jnp

    batch = meta["batch"]
    n_samples = meta["num_samples"]

    def recognize(wav: "np.ndarray") -> str:
        buf = np.zeros((batch, n_samples), np.float32)
        buf[0, :len(wav)] = wav
        lens = np.full((batch,), 1, np.int32)
        lens[0] = len(wav)
        out_tokens, out_lens = call(jnp.asarray(buf), jnp.asarray(lens))
        ids = np.asarray(out_tokens)[0][: int(out_lens[0])]
        return " ".join(tokens[i] for i in ids
                        if 0 <= i < len(tokens))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging
            logging.info("%s " + fmt, self.address_string(), *args)

        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "bucket": n_samples})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            import numpy as np
            if self.path != "/recognize":
                return self._reply(404, {"error": "not found"})
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            if dtype == "f32":
                wav = np.frombuffer(raw, np.float32)
            else:
                wav = np.frombuffer(raw, np.int16).astype(np.float32) \
                    / 32768.0
            if len(wav) > n_samples:
                return self._reply(413, {
                    "error": f"audio longer than the {n_samples}-sample "
                             "bucket; export a bigger artifact"})
            if len(wav) == 0:
                return self._reply(400, {"error": "empty audio"})
            self._reply(200, {"text": recognize(wav),
                              "n_samples": int(len(wav))})

    return Handler, recognize


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="Serve an exported ASR model")
    p.add_argument("--artifact_dir", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8570)
    p.add_argument("--dtype", choices=["pcm16", "f32"], default="pcm16")
    args = p.parse_args(argv)
    from .export_model import load_exported
    call, tokens, meta = load_exported(args.artifact_dir)
    handler, recognize = build_handler(call, tokens, meta, args.dtype)
    # warm the executable before accepting traffic
    import numpy as np
    recognize(np.zeros(min(1600, meta["num_samples"]), np.float32))
    srv = ThreadingHTTPServer((args.host, args.port), handler)
    logging.info("serving %s on %s:%d (bucket B=%d N=%d)",
                 args.artifact_dir, args.host, args.port, meta["batch"],
                 meta["num_samples"])
    srv.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
