"""Load test for the serving frontend: dynamic micro-batching A/B.

Boots the full serving stack in-process (LJSpeech-config CompTransTTS +
HiFi-GAN V1 over a real HTTP socket), then drives it with concurrent
clients and reports requests/sec and latency percentiles with
micro-batching ON (--max_batch, default 8) vs OFF (max_batch=1).

Usage: python tools/loadtest_serve.py [--clients 16] [--requests 64]
           [--max_batch 8] [--ckpt output/real_speech/LJdemo/ckpt]

Weights default to the real-speech-validation checkpoint when present
(durations then carry a learned distribution), random init otherwise —
throughput depends on predicted durations, so the JSON records which.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SENTENCES = [
    "The quick brown fox jumps over the lazy dog near the riverbank.",
    "Printing differs from most if not from all the arts.",
    "Weather forecasts predict heavy rain across the northern counties.",
    "Machine learning systems convert text into natural sounding speech.",
    "A committee was appointed to investigate the prisons of the country.",
    "He walked slowly down the corridor, listening to his own footsteps.",
    "The orchestra tuned their instruments while the audience sat down.",
    "She sells seashells by the seashore and the shells are seashells.",
]


def _boot(max_batch, ckpt):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from serve import TTSService, make_server
    from ctts_tpu.config import get_configs_of
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.vocoder.hifigan import HiFiGANGenerator, V1_CONFIG

    pre, mod, tr = get_configs_of("LJSpeech")
    mod = prepare_model_config(pre, mod)
    model = CompTransTTS(pre, mod, tr)
    texts = jnp.asarray(np.random.RandomState(0).randint(1, 300, (1, 16)),
                        jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           speakers=jnp.zeros(1, jnp.int32), texts=texts,
                           src_lens=jnp.full((1,), 16, jnp.int32),
                           mode="infer", max_mel_len=128,
                           deterministic=True)
    weights = "random_init"
    npz = os.path.join(_REPO, "assets", "ljdemo_ckpt.npz")
    if (not (ckpt and os.path.isdir(ckpt))) and os.path.isfile(npz):
        # container resets wipe output/; the committed bf16 pack keeps the
        # duration distribution realistic (same fallback as bench.py)
        from ctts_tpu.utils.checkpoint import load_params_npz
        restored, step = load_params_npz(npz)
        variables = dict(variables)
        variables["params"] = jax.device_put(restored["params"])
        if restored.get("batch_stats"):
            variables["batch_stats"] = jax.device_put(
                restored["batch_stats"])
        weights = f"packed_npz_step{step}"
    elif ckpt and os.path.isdir(ckpt):
        from ctts_tpu.utils.checkpoint import restore_checkpoint_raw
        restored, step = restore_checkpoint_raw(os.path.abspath(ckpt))
        if step:
            # device_put once — raw restore returns host numpy; serving
            # with host params would re-transfer the tree on every request
            variables = dict(variables)
            variables["params"] = jax.device_put(restored["params"])
            if restored.get("batch_stats"):
                variables["batch_stats"] = jax.device_put(
                    restored["batch_stats"])
            weights = f"trained_step{step}"
    gen = HiFiGANGenerator(dict(V1_CONFIG), dtype=jnp.bfloat16)
    gvar = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 80),
                                                     jnp.float32))
    service = TTSService(model, variables, (pre, mod, tr),
                         ("HiFi-GAN", gen, gvar), max_batch=max_batch)
    srv = make_server(service)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return service, srv, f"http://127.0.0.1:{srv.server_address[1]}", weights


def _drive(url, clients, total):
    lat, errs = [], []
    lock = threading.Lock()
    counter = iter(range(total))

    def client():
        while True:
            with lock:
                i = next(counter, None)
            if i is None:
                return
            body = json.dumps(
                {"text": SENTENCES[i % len(SENTENCES)]}).encode()
            req = urllib.request.Request(
                url + "/tts", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    r.read()
                with lock:
                    lat.append(time.perf_counter() - t0)
            except Exception as exc:                    # noqa: BLE001
                with lock:
                    errs.append(str(exc))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return lat, errs, wall


def _timed_request(host, port, text, stream, timeout=600):
    """One /tts request over a raw http.client connection, reading the
    body incrementally so first-PCM-byte arrival is observable (urllib
    buffers chunked bodies). Returns (ttfa_s, total_s, n_bytes): ttfa is
    send→first PCM byte AFTER the 44-byte WAV header (for the streaming
    path that is acoustic inference + the first vocoder window; for the
    non-streaming path the whole body lands at once, so ttfa ≈ total)."""
    import http.client
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    body = json.dumps({"text": text, "stream": stream})
    t0 = time.perf_counter()
    conn.request("POST", "/tts", body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200, (resp.status, resp.read()[:200])
    hdr = resp.read(44)                      # RIFF/fmt/data header
    assert hdr[:4] == b"RIFF", hdr[:16]
    first = resp.read(2)                     # first PCM sample
    t_first = time.perf_counter()
    n = len(hdr) + len(first)
    while True:
        buf = resp.read(65536)
        if not buf:
            break
        n += len(buf)
    t_total = time.perf_counter()
    conn.close()
    return t_first - t0, t_total - t0, n


def cmd_ttfa(args):
    """Measured time-to-first-audio at B=1 on the real chip: streaming
    (`"stream": true`, exact chunked vocoder) vs the non-streaming
    full-utterance path, sequential requests over a real HTTP socket.
    Confirms the chunk pipeline actually overlaps on this runtime
    (VERDICT-r3 weak #3: the analytic ~(chunk+2*halo)/T claim in
    ctts_tpu/vocoder/streaming.py needs a measurement)."""
    import numpy as np
    service, srv, url, weights = _boot(1, args.ckpt)
    host, port = srv.server_address
    # warm every (shape, stream) combination outside the timed window —
    # each distinct (16-token text bucket x mel budget x stream mode)
    # is a fresh graph, and a cold compile through the remote TPU tunnel
    # can take >10 min, so the warmup timeout is generous
    n_warm = len(SENTENCES) * 2
    for wi, s in enumerate(SENTENCES):
        for stream in (False, True):
            t0 = time.perf_counter()
            _timed_request(host, port, s, stream, timeout=3600)
            print(f"# warm {wi * 2 + int(stream) + 1}/{n_warm} "
                  f"stream={stream} {time.perf_counter() - t0:.1f}s",
                  flush=True)

    out = {"mode": "ttfa", "weights": weights,
           "stream_chunk": service.stream_chunk, "repeats": args.requests}
    for stream in (True, False):
        ttfas, totals, sizes = [], [], []
        for i in range(args.requests):
            s = SENTENCES[i % len(SENTENCES)]
            tf, tt, n = _timed_request(host, port, s, stream)
            ttfas.append(tf)
            totals.append(tt)
            sizes.append(n)
        ttfas = np.sort(ttfas)
        totals = np.sort(totals)
        key = "stream" if stream else "full"
        out[key] = {
            "ttfa_p50_ms": round(1e3 * float(ttfas[len(ttfas) // 2]), 1),
            "ttfa_p95_ms": round(
                1e3 * float(ttfas[min(int(len(ttfas) * 0.95),
                                      len(ttfas) - 1)]), 1),
            "total_p50_ms": round(1e3 * float(totals[len(totals) // 2]), 1),
            "audio_s_p50": round(
                float(np.median(sizes)) / 2 / service.sr, 2),
        }
    out["ttfa_speedup_p50"] = round(
        out["full"]["ttfa_p50_ms"] / out["stream"]["ttfa_p50_ms"], 2)
    out["stream_overhead_total_p50"] = round(
        out["stream"]["total_p50_ms"] / out["full"]["total_p50_ms"], 2)
    print(json.dumps(out), flush=True)
    srv.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--ttfa", action="store_true",
                    help="measure time-to-first-audio (streaming vs full) "
                         "at B=1 instead of the micro-batching A/B")
    ap.add_argument("--ckpt",
                    default=os.path.join(_REPO,
                                         "output/real_speech/LJdemo/ckpt"))
    args = ap.parse_args()

    if args.ttfa:
        cmd_ttfa(args)
        return

    import numpy as np
    for max_batch in (args.max_batch, 1):
        service, srv, url, weights = _boot(max_batch, args.ckpt)
        # warm the compile cache outside the timed window: one request per
        # sentence covers every (B=1..bucket, t_s, t_m) shape the load can
        # hit solo; a concurrent burst warms the batched shapes
        _drive(url, 1, len(SENTENCES))
        _drive(url, args.clients, 2 * args.max_batch)
        # two timed drives: the first still eats any cold compiles the
        # warmups missed (batch composition is load-dependent, so the
        # (B, t_s, t_m) shape set is not fully enumerable up front); the
        # second is the steady-state figure a long-lived server sees
        for tag in ("warm", "steady"):
            n0, b0 = service.n_requests, service.n_batches
            lat, errs, wall = _drive(url, args.clients, args.requests)
            if errs:
                raise SystemExit(f"errors: {errs[:3]}")
            lat = np.sort(np.asarray(lat))
            print(json.dumps({
                "max_batch": max_batch,
                "pass": tag,
                "clients": args.clients,
                "requests": args.requests,
                "req_per_s": round(args.requests / wall, 2),
                "p50_ms": round(1e3 * float(lat[len(lat) // 2]), 1),
                "p95_ms": round(1e3 * float(lat[int(len(lat) * 0.95)]), 1),
                "batches": service.n_batches - b0,
                "reqs_counted": service.n_requests - n0,
                "weights": weights,
            }), flush=True)
        srv.shutdown()


if __name__ == "__main__":
    main()
