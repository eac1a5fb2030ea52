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
    if ckpt and os.path.isdir(ckpt):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--ckpt",
                    default=os.path.join(_REPO,
                                         "output/real_speech/LJdemo/ckpt"))
    args = ap.parse_args()

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
