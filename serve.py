"""Minimal production-style TTS HTTP server on one chip.

The reference has no serving story (synthesize.py writes files); this is
the TPU-native serving surface the rest of the framework was shaped for:

- **Static-shape buckets**: each request synthesizes at the smallest mel
  bucket that fits its predicted duration, so every shape is compiled once
  (warmed up at startup) and reused for the life of the server.
- **Streaming responses** (`"stream": true`): the exact chunked vocoder
  (ctts_tpu/vocoder/streaming.py) emits PCM as it leaves the device via
  HTTP chunked transfer encoding. Measured on the real chip
  (SERVING_TTFA.json): time-to-first-audio p50 120.7 ms vs 135.7 ms for
  the full path at ~3.9 s utterances, remaining chunks pipelined over the
  next ~134 ms.
- **Single-writer device access**: JAX dispatch is serialized by a lock;
  the HTTP layer is threaded so health checks and request parsing never
  wait on the device.
- **Dynamic micro-batching**: concurrent non-streaming requests with the
  same control knobs are coalesced by a device-worker thread into one
  padded batch (power-of-two batch buckets up to --max_batch, a
  --batch_window_ms collection window after the first request). Measured
  batch scaling on one chip (BENCH_B sweep of bench.py, 2026-08-19,
  trained weights, real transcripts): 387x real time at B=1, 854x at
  B=16 (2.2x), 1651x at B=128 (4.3x), so under concurrent load batching
  multiplies requests/sec at ~one batch of added latency. The measured
  serving effect is in tools/loadtest_serve.py: 33.0 req/s p50 393 ms
  batched vs 8.1 req/s p50 1840 ms solo. Streaming requests bypass
  batching (their latency target is time-to-first-audio, not
  throughput).

Endpoints:
  GET  /healthz          -> {"ok": true, ...}
  POST /tts              -> audio/wav
       body: {"text": "...", "pitch_control": 1.0, "energy_control": 1.0,
              "duration_control": 1.0, "stream": false}

Usage: python serve.py --dataset LJSpeech --restore_step 900000 \
           [--port 8000] [--vocoder_ckpt ckpt]
Without checkpoints it serves a random-init model through griffin-lim —
useful only for smoke tests (tests/test_serve.py drives the real handler
stack end-to-end over a socket).
"""

import argparse
import io
import json
import struct
import threading
import time
import wave
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _wav_header_unknown_len(sr, max_riff=0xFFFFFFFF):
    """WAV header with unknown data size (the streaming convention:
    players treat 0xFFFFFFFF as 'read until EOF')."""
    return (b"RIFF" + struct.pack("<I", max_riff) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data" + struct.pack("<I", max_riff))


class _Request:
    """One queued synthesis request awaiting the batching worker."""

    __slots__ = ("seq", "controls", "done", "wav", "error")

    def __init__(self, seq, controls):
        self.seq, self.controls = seq, controls
        self.done = threading.Event()
        self.wav, self.error = None, None


class TTSService:
    """Model + vocoder behind one lock; owns shape-bucket compilation and
    the dynamic micro-batching worker."""

    def __init__(self, model, variables, configs, vocoder, bucket=128,
                 stream_chunk=64, max_batch=8, batch_window_ms=10.0):
        import jax.numpy as jnp                        # noqa: F401
        self.model, self.variables = model, variables
        self.pre, self.mod, self.tr = configs
        self.vocoder = vocoder
        self.bucket = bucket
        self.stream_chunk = stream_chunk
        self.max_batch = max(1, int(max_batch))
        self.batch_window_ms = batch_window_ms
        self.sr = self.pre["preprocessing"]["audio"]["sampling_rate"]
        self.hop = self.pre["preprocessing"]["stft"]["hop_length"]
        self.lock = threading.Lock()
        self.n_requests = 0
        self.n_batches = 0
        self._queue = deque()
        self._cv = threading.Condition()
        self._worker = None

        import jax

        def _infer_fn(variables, texts, src_lens, mel_budget, p, e, d):
            import jax.numpy as jnp
            return self.model.apply(
                variables,
                speakers=jnp.zeros(texts.shape[0], jnp.int32),
                texts=texts, src_lens=src_lens,
                mode="infer", max_mel_len=mel_budget,
                p_control=p, e_control=e, d_control=d, deterministic=True)

        # ONE jit wrapper for the service's lifetime: each distinct
        # (B, T_s, mel_budget, controls) signature compiles once and is
        # reused; calling model.apply eagerly instead would dispatch the
        # graph op-by-op (measured ~100x slower on the TPU tunnel)
        self._jit_infer = jax.jit(
            _infer_fn, static_argnames=("mel_budget", "p", "e", "d"))

    def _infer_arrays(self, texts_np, lens_np, controls, mel_budget):
        """Batched infer at a static (B, T_s, mel_budget) shape. Rows are
        independent (masked attention, per-row norms), so padding rows
        never change real rows' outputs."""
        import jax.numpy as jnp
        p, e, d = controls
        return self._jit_infer(self.variables,
                               jnp.asarray(np.asarray(texts_np, np.int32)),
                               jnp.asarray(np.asarray(lens_np, np.int32)),
                               mel_budget=int(mel_budget),
                               p=float(p), e=float(e), d=float(d))

    def _infer(self, seq, controls, mel_budget):
        # T_s rounds up to a multiple of 16 so distinct text lengths reuse
        # one compiled graph per 16-token bucket instead of one per length
        t_s = -(-max(len(seq), 1) // 16) * 16
        texts_np = np.zeros((1, t_s), np.int32)
        texts_np[0, :len(seq)] = seq
        return self._infer_arrays(texts_np,
                                  np.array([len(seq)], np.int32),
                                  controls, mel_budget)

    def warmup(self, buckets=(128, 256)):
        """Compile the probe bucket + common serving buckets up front so
        the first request doesn't pay compile latency; also every
        power-of-two batch bucket at the probe shape so a concurrent burst
        never stalls on a cold batched compile."""
        seq = [1] * 8
        with self.lock:
            for t_m in sorted(set((self.bucket,) + tuple(buckets))):
                out = self._infer(seq, (1.0, 1.0, 1.0), t_m)
                np.asarray(out["mel_lens"])
            b = 2
            while b <= self.max_batch:
                texts_np = np.zeros((b, 16), np.int32)
                texts_np[:, :len(seq)] = seq
                lens_np = np.full((b,), len(seq), np.int32)
                out = self._infer_arrays(texts_np, lens_np, (1.0, 1.0, 1.0),
                                         self.bucket)
                np.asarray(out["mel_lens"])
                b *= 2

    def synthesize(self, text, controls=(1.0, 1.0, 1.0), stream=False):
        """-> (sr, iterator of int16 PCM numpy chunks)."""
        from synthesize import preprocess_english
        seq = preprocess_english(text, self.pre)
        self.n_requests += 1
        if stream or self.max_batch <= 1:
            # streaming optimizes time-to-first-audio; run solo
            return self._synth_solo(seq, controls, stream)
        req = _Request(seq, tuple(controls))
        with self._cv:
            if self._worker is None:
                self._worker = threading.Thread(target=self._worker_loop,
                                                daemon=True)
                self._worker.start()
            self._queue.append(req)
            self._cv.notify_all()
        req.done.wait()
        if req.error is not None:
            raise req.error
        return self.sr, iter([req.wav])

    def _worker_loop(self):
        """Device-worker: pops one request, collects compatible (same
        control knobs) requests for up to batch_window_ms, synthesizes
        them as one padded batch."""
        while True:
            with self._cv:
                while not self._queue:
                    self._cv.wait()
                first = self._queue.popleft()
            batch = [first]
            deadline = time.monotonic() + self.batch_window_ms / 1e3
            while len(batch) < self.max_batch:
                with self._cv:
                    while (not self._queue
                           and (rem := deadline - time.monotonic()) > 0):
                        self._cv.wait(timeout=rem)
                    take = [r for r in self._queue
                            if r.controls == first.controls]
                    take = take[:self.max_batch - len(batch)]
                    for r in take:
                        self._queue.remove(r)
                batch.extend(take)
                if not take or deadline - time.monotonic() <= 0:
                    # window expired, or the queue holds only requests with
                    # other control knobs (they form their own batch next)
                    break
            try:
                self._run_batch(batch)
            except Exception as exc:                    # noqa: BLE001
                for r in batch:
                    r.error = exc
                    r.done.set()

    def _run_batch(self, batch):
        from ctts_tpu.utils.model import vocoder_infer
        seqs = [r.seq for r in batch]
        n = len(seqs)
        B = 1
        while B < n:                    # power-of-two batch buckets bound
            B *= 2                      # the set of compiled batch shapes
        seqs = seqs + [seqs[0]] * (B - n)
        t_s = -(-max(len(s) for s in seqs) // 16) * 16
        texts_np = np.zeros((B, t_s), np.int32)
        lens_np = np.zeros((B,), np.int32)
        for i, s in enumerate(seqs):
            texts_np[i, :len(s)] = s
            lens_np[i] = len(s)
        with self.lock:
            self.n_batches += 1
            probe = self._infer_arrays(texts_np, lens_np, batch[0].controls,
                                       self.bucket)
            total = int(np.asarray(probe["duration_rounded"])
                        .sum(axis=1)[:n].max())
            cap = 2 * self.mod["max_seq_len"]
            t_m = min(cap, -(-max(total, 1) // self.bucket) * self.bucket)
            out = (probe if t_m == self.bucket
                   else self._infer_arrays(texts_np, lens_np,
                                           batch[0].controls, t_m))
            mel = np.asarray(out["postnet_mel_predictions"])
            mel_lens = np.asarray(out["mel_lens"])
            wavs = vocoder_infer(mel[:n], self.vocoder, self.pre,
                                 lengths=mel_lens[:n])
        for r, w in zip(batch, wavs):
            r.wav = w
            r.done.set()

    def _synth_solo(self, seq, controls, stream):
        """Unbatched path (streaming requests, or max_batch=1). Holds the
        device lock for the duration (single-chip, single-stream)."""
        from ctts_tpu.utils.model import vocoder_infer, vocoder_stream
        with self.lock:
            probe = self._infer(seq, controls, self.bucket)
            total = int(np.asarray(probe["duration_rounded"]).sum())
            cap = 2 * self.mod["max_seq_len"]
            t_m = min(cap, -(-max(total, 1) // self.bucket) * self.bucket)
            out = (probe if t_m == self.bucket
                   else self._infer(seq, controls, t_m))
            mel = np.asarray(out["postnet_mel_predictions"])
            n = int(np.asarray(out["mel_lens"])[0])
            if stream and self.vocoder[0] != "griffin_lim":
                from ctts_tpu.vocoder.streaming import (RF_MEL,
                                                        RF_MEL_MELGAN)
                halo = (RF_MEL if self.vocoder[0] == "HiFi-GAN"
                        else RF_MEL_MELGAN)
                # truncate the padded mel to the first chunk multiple at
                # least `halo` frames past the true length: every kept
                # sample (< n*hop) then sees exactly the mel context the
                # full pass sees (its receptive field ends before the
                # truncation edge), while padding frames beyond it are
                # never vocoded — a throughput win over the full pass
                keep = min(mel.shape[1],
                           -(-(n + halo) // self.stream_chunk)
                           * self.stream_chunk)

                def chunks():
                    sent = 0
                    with self.lock:
                        for c in vocoder_stream(mel[:, :keep], self.vocoder,
                                                self.pre,
                                                chunk=self.stream_chunk):
                            take = min(c.shape[1], n * self.hop - sent)
                            if take > 0:
                                yield np.asarray(c[0, :take])
                            sent += c.shape[1]
                            if sent >= n * self.hop:
                                break
                return self.sr, chunks()
            wav = vocoder_infer(mel, self.vocoder, self.pre,
                                lengths=[n])[0]
        return self.sr, iter([wav])


def make_handler(service):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):          # quiet by default
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({"ok": True,
                               "requests": service.n_requests,
                               "batches": service.n_batches}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/tts":
                self.send_error(404)
                return
            try:
                req = json.loads(self.rfile.read(
                    int(self.headers.get("Content-Length", 0)) or 0))
                text = req["text"]
            except Exception as exc:                 # noqa: BLE001
                self.send_error(400, f"bad request: {exc}")
                return
            controls = (float(req.get("pitch_control", 1.0)),
                        float(req.get("energy_control", 1.0)),
                        float(req.get("duration_control", 1.0)))
            stream = bool(req.get("stream", False))
            try:
                sr, chunks = service.synthesize(text, controls, stream)
            except Exception as exc:                 # noqa: BLE001
                self.send_error(500, f"synthesis failed: {exc}")
                return
            if stream:
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def send(chunk_bytes):
                    self.wfile.write(
                        f"{len(chunk_bytes):x}\r\n".encode()
                        + chunk_bytes + b"\r\n")

                send(_wav_header_unknown_len(sr))
                for c in chunks:
                    send(c.astype("<i2").tobytes())
                self.wfile.write(b"0\r\n\r\n")
            else:
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    for c in chunks:
                        w.writeframes(np.asarray(c).astype("<i2").tobytes())
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return Handler


def make_server(service, host="127.0.0.1", port=0):
    """-> ThreadingHTTPServer bound to (host, port); port 0 = ephemeral."""
    return ThreadingHTTPServer((host, port), make_handler(service))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--restore_step", type=int, default=0)
    ap.add_argument("--packed_ckpt", default=None,
                    help="bf16 npz weights from tools/pack_ckpt.py "
                         "(e.g. assets/ljdemo_ckpt.npz)")
    ap.add_argument("--config_dir", default=None)
    ap.add_argument("--vocoder_ckpt", default="ckpt")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--stream_chunk", type=int, default=64)
    ap.add_argument("--max_batch", type=int, default=8,
                    help="dynamic micro-batching cap (1 disables)")
    ap.add_argument("--batch_window_ms", type=float, default=10.0,
                    help="collection window after the first queued request")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    from ctts_tpu.config import get_configs_of
    from ctts_tpu.utils.model import get_model, get_vocoder

    configs = get_configs_of(args.dataset, args.config_dir)
    model, variables = get_model(args.restore_step, configs, train=False,
                                 packed_ckpt=args.packed_ckpt)
    vocoder = get_vocoder(configs[1], args.vocoder_ckpt)
    if vocoder[0] == "griffin_lim":
        print("NOTE: no vocoder weights; serving griffin-lim fallback")
    service = TTSService(model, variables, configs, vocoder,
                         stream_chunk=args.stream_chunk,
                         max_batch=args.max_batch,
                         batch_window_ms=args.batch_window_ms)
    print("warming up compile cache ...")
    service.warmup()
    srv = make_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{srv.server_address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
