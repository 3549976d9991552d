"""Conversion server: load models once, serve conversions over HTTP.

A lightweight serving front end (stdlib http.server — no extra
dependencies) around :class:`speechsplit_tpu.pipeline.VoiceConverter`.
The reference has no serving story at all (inference lives in a
notebook); this keeps the compiled conversion graphs warm across
requests, which matters because first-compile costs minutes while a
warm conversion runs in milliseconds.

API (JSON over POST):
  POST /convert
    {"source_wav": "<path>", "target_wav": "<path>",
     "conditions": ["RFU", ...],          # optional, default all 7
     "src_gender": "M", "trg_gender": "F",  # optional
     "out_dir": "<path>",                  # optional; returns paths
     "synthesize": true}                   # optional, default true
  -> {"results": {"RFU": {"mel_shape": [T, 80],
                          "wav_path": "...", "mel_path": "..."}}}

  GET /health -> {"status": "ok", "device": "..."}

Single-threaded by design: one TPU, one compiled program stream;
concurrency belongs at the replica level (one server per chip under a
data-parallel router).
"""

from __future__ import annotations

import argparse
import json
import os
import traceback
from http.server import BaseHTTPRequestHandler, HTTPServer


def build_handler(converter, default_out: str):
    import numpy as np
    from scipy.io import wavfile

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet default logging
            pass

        def do_GET(self):
            if self.path == "/health":
                import jax

                self._reply(
                    200,
                    {"status": "ok", "device": str(jax.devices()[0])},
                )
            else:
                self._reply(404, {"error": "unknown endpoint"})

        def do_POST(self):
            if self.path != "/convert":
                self._reply(404, {"error": "unknown endpoint"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                src = req["source_wav"]
                trg = req["target_wav"]
            except (KeyError, json.JSONDecodeError) as exc:
                self._reply(
                    400,
                    {"error": f"bad request: {exc!r}; need source_wav "
                     "and target_wav"},
                )
                return
            try:
                out_dir = req.get("out_dir", default_out)
                os.makedirs(out_dir, exist_ok=True)
                results = converter.convert_wav_files(
                    src,
                    trg,
                    src_gender=req.get("src_gender", "M"),
                    trg_gender=req.get("trg_gender", "F"),
                    conditions=tuple(
                        req.get(
                            "conditions",
                            ["R", "F", "U", "RF", "RU", "FU", "RFU"],
                        )
                    ),
                    synthesize=bool(req.get("synthesize", True)),
                    # default "auto": the link probe decides whether
                    # bf16 result compression helps on this session's
                    # link weather (linkprobe.choose_compress); clients
                    # may still pin true/false explicitly
                    compress_results=req.get("compress_results", "auto"),
                    # wavs are written as PCM16 below: quantize on
                    # device, fetch 4x fewer bytes
                    pcm16=True,
                )
                stem = os.path.splitext(os.path.basename(src))[0]
                payload = {}
                for condition, entry in results.items():
                    mel_path = os.path.join(
                        out_dir, f"{stem}_{condition}.npy"
                    )
                    np.save(mel_path, entry["mel"])
                    info = {
                        "mel_shape": list(entry["mel"].shape),
                        "mel_path": mel_path,
                    }
                    if "wav" in entry:
                        wav_path = os.path.join(
                            out_dir, f"{stem}_{condition}.wav"
                        )
                        wav = entry["wav"]
                        if wav.dtype != np.int16:  # float vocoder path
                            wav = (wav * 32767).astype(np.int16)
                        wavfile.write(
                            wav_path,
                            converter.config.sample_rate,
                            wav,
                        )
                        info["wav_path"] = wav_path
                    payload[condition] = info
                self._reply(200, {"results": payload})
            except FileNotFoundError as exc:
                self._reply(400, {"error": str(exc)})
            except Exception as exc:  # surface the real error to caller
                traceback.print_exc()
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--generator_ckpt", required=True)
    parser.add_argument("--f0_ckpt", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8571)
    parser.add_argument("--out_dir", default="results")
    parser.add_argument(
        "--vocoder_ckpt", default="",
        help="neural vocoder checkpoint (dir, .npz, or the literal "
        "'default' for the shipped pretrained asset); empty = "
        "Griffin-Lim",
    )
    parser.add_argument(
        "--vocoder_refine", type=int, default=48,
        help="mel-consistency projection iterations on the neural "
        "vocoder's spectrum (0 = raw one-shot head; ~60 us each)",
    )
    parser.add_argument("--hparams", default="")
    args = parser.parse_args(argv)

    from speechsplit_tpu.config import SpeechSplitConfig
    from speechsplit_tpu.pipeline import VoiceConverter
    from speechsplit_tpu.utils import enable_compile_cache

    enable_compile_cache()
    config = SpeechSplitConfig().parse(args.hparams)
    vocoder = None
    if args.vocoder_ckpt:
        from speechsplit_tpu.vocoder_neural import load_vocoder

        vocoder = load_vocoder(
            args.vocoder_ckpt, hop=config.hop_length,
            sample_rate=config.sample_rate,
            refine_iters=args.vocoder_refine,
        )
    converter = VoiceConverter.from_checkpoints(
        args.generator_ckpt, args.f0_ckpt, config=config, vocoder=vocoder
    )
    server = HTTPServer(
        (args.host, args.port), build_handler(converter, args.out_dir)
    )
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
