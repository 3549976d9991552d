"""Conversion server: health, happy path, and malformed requests."""

import json
import os
import pickle
import threading
import urllib.error
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

import jax

from speechsplit_tpu.config import SpeechSplitConfig
from speechsplit_tpu.cli.serve import build_handler
from speechsplit_tpu.pipeline import VoiceConverter
from speechsplit_tpu.training.train_step import create_train_state

SMALL = SpeechSplitConfig(
    dim_enc=64, dim_enc_2=32, dim_enc_3=64,
    dim_neck=4, dim_neck_2=1, dim_neck_3=8,
    dim_dec_mel=64, dim_dec_f0=32,
)
FS = 16000


def _tone(f0, n, seed=0):
    t = np.arange(n) / FS
    r = np.random.RandomState(seed)
    sig = sum(np.sin(2 * np.pi * f0 * h * t) / h for h in range(1, 4))
    sig = sig + 0.01 * r.randn(n)
    return (sig / np.abs(sig).max() * 0.5).astype(np.float32)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    from scipy.io import wavfile

    for name, f0 in [("src", 120.0), ("trg", 210.0)]:
        wavfile.write(
            root / f"{name}.wav", FS,
            (_tone(f0, FS) * 32767).astype(np.int16),
        )

    _, g_state = create_train_state(SMALL, jax.random.PRNGKey(0))
    _, p_state = create_train_state(
        SMALL, jax.random.PRNGKey(1), "f0_converter"
    )
    converter = VoiceConverter(SMALL, g_state.params, p_state.params)
    httpd = HTTPServer(
        ("127.0.0.1", 0), build_handler(converter, str(root / "out"))
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_port}", root
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/convert",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def test_health(server):
    url, _ = server
    with urllib.request.urlopen(url + "/health", timeout=30) as resp:
        body = json.loads(resp.read())
    assert resp.status == 200 and body["status"] == "ok"


def test_convert_happy_path(server):
    url, root = server
    status, body = _post(url, {
        "source_wav": str(root / "src.wav"),
        "target_wav": str(root / "trg.wav"),
        "conditions": ["R", "RFU"],
    })
    assert status == 200
    assert set(body["results"]) == {"R", "RFU"}
    for info in body["results"].values():
        assert info["mel_shape"][1] == 80
        assert os.path.exists(info["mel_path"])
        assert os.path.exists(info["wav_path"])


def test_convert_missing_field(server):
    url, root = server
    req = urllib.request.Request(
        url + "/convert",
        data=json.dumps({"source_wav": str(root / "src.wav")}).encode(),
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400
    assert "target_wav" in json.loads(err.value.read())["error"]


def test_convert_missing_file(server):
    url, _ = server
    req = urllib.request.Request(
        url + "/convert",
        data=json.dumps({
            "source_wav": "/nonexistent.wav",
            "target_wav": "/nonexistent2.wav",
        }).encode(),
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400


def test_unknown_endpoint(server):
    url, _ = server
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(url + "/bogus", timeout=30)
    assert err.value.code == 404
