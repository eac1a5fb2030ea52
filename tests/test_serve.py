"""HTTP serving surface (serve.py): health, full-wav and streaming
responses driven over a real socket against a tiny model."""

import json
import os
import sys
import threading
import urllib.request
import wave
import io

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import tiny_configs

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def server_url():
    from serve import TTSService, make_server
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.vocoder.hifigan import HiFiGANGenerator, V1_CONFIG

    pre, mod, tr = tiny_configs()
    pre["path"]["lexicon_path"] = "/nonexistent"
    mod = prepare_model_config(pre, mod)
    model = CompTransTTS(pre, mod, tr)
    texts = jnp.asarray(np.random.RandomState(0).randint(1, 300, (1, 8)),
                        jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           speakers=jnp.zeros(1, jnp.int32), texts=texts,
                           src_lens=jnp.full((1,), 8, jnp.int32),
                           mode="infer", max_mel_len=64, deterministic=True)
    gen = HiFiGANGenerator(dict(V1_CONFIG, upsample_initial_channel=32))
    gvar = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80),
                                                     jnp.float32))
    service = TTSService(model, variables, (pre, mod, tr),
                         ("HiFi-GAN", gen, gvar), bucket=64,
                         stream_chunk=16)
    srv = make_server(service)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, body):
    req = urllib.request.Request(
        url + "/tts", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, r.headers, r.read()


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=60) as r:
        assert r.status == 200
        assert json.loads(r.read())["ok"] is True


def test_tts_full_wav(server_url):
    status, headers, body = _post(server_url, {"text": "Hello world."})
    assert status == 200
    assert headers["Content-Type"] == "audio/wav"
    with wave.open(io.BytesIO(body)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getnframes() > 0
        pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    assert pcm.size == w.getnframes()


def test_tts_streaming_matches_full(server_url):
    """The chunked-streaming response carries the same PCM as the full
    response (exact vocoder streaming), behind a streaming WAV header."""
    body = {"text": "Hello world.", "duration_control": 1.0}
    _, _, full = _post(server_url, body)
    with wave.open(io.BytesIO(full)) as w:
        want = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    status, headers, raw = _post(server_url, dict(body, stream=True))
    assert status == 200
    # urllib de-chunks the transfer encoding; strip the 44-byte header
    assert raw[:4] == b"RIFF" and raw[36:40] == b"data"
    got = np.frombuffer(raw[44:], "<i2")
    assert got.shape == want.shape
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_dynamic_batching_coalesces(server_url):
    """Concurrent identical requests are coalesced by the micro-batching
    worker into fewer device batches, and every response carries the same
    audio (rows of a padded batch are independent; across differently
    shaped compiles only float reassociation noise is allowed)."""
    def batches():
        with urllib.request.urlopen(server_url + "/healthz",
                                    timeout=60) as r:
            return json.loads(r.read())["batches"]

    before = batches()
    results = [None] * 6
    def post(i):
        results[i] = _post(server_url, {"text": "Dynamic batching test."})
    threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    pcms = []
    for status, headers, body in results:
        assert status == 200
        with wave.open(io.BytesIO(body)) as w:
            pcms.append(np.frombuffer(w.readframes(w.getnframes()), "<i2"))
    assert all(p.shape == pcms[0].shape for p in pcms)
    for p in pcms[1:]:
        assert np.abs(p.astype(np.int32)
                      - pcms[0].astype(np.int32)).max() <= 1
    # 6 concurrent requests must not have run as 6 solo batches: the first
    # may run alone (its collection window can expire before the rest
    # arrive), but everything queued behind it coalesces
    assert batches() - before <= 4


def test_tts_bad_request(server_url):
    req = urllib.request.Request(
        server_url + "/tts", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
