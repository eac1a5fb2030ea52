"""Benchmark: end-to-end batch synthesis speed on one TPU chip.

Pipeline: tokens → CompTransTTS (transformer_fs2, bf16) → HiFi-GAN V1 →
waveform. Metric: real-time factor (seconds of audio generated per second of
wall clock). Baseline target: ≥50× real time per chip (BASELINE.json
north_star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ctts_tpu.config import get_configs_of
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.vocoder.hifigan import HiFiGANGenerator, V1_CONFIG

    B, T_s, T_m = int(os.environ.get("BENCH_B", 16)), 128, 1024
    HOP, SR = 256, 22050

    preprocess, model_cfg, train_cfg = get_configs_of("LJSpeech")
    model_cfg = prepare_model_config(preprocess, model_cfg)
    model = CompTransTTS(preprocess, model_cfg, train_cfg)
    vocoder = HiFiGANGenerator(dict(V1_CONFIG), dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    texts = jnp.asarray(rng.randint(1, 300, size=(B, T_s)), jnp.int32)
    src_lens = jnp.full((B,), T_s, jnp.int32)
    speakers = jnp.zeros((B,), jnp.int32)

    am_vars = model.init(
        {"params": jax.random.PRNGKey(0)}, speakers=speakers, texts=texts,
        src_lens=src_lens, mode="infer", max_mel_len=T_m, deterministic=True)
    voc_vars = vocoder.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 16, 80), jnp.float32))

    @jax.jit
    def synthesize(am_params, voc_params, texts, src_lens, speakers):
        out = model.apply(
            {"params": am_params,
             "batch_stats": am_vars.get("batch_stats", {})},
            speakers=speakers, texts=texts, src_lens=src_lens, mode="infer",
            max_mel_len=T_m, deterministic=True)
        mel = out["postnet_mel_predictions"]
        wav = vocoder.apply(voc_params, mel)
        return wav, out["mel_lens"]

    args = (am_vars["params"], voc_vars, texts, src_lens, speakers)
    # warmup / compile
    wav, mel_lens = jax.block_until_ready(synthesize(*args))

    iters = int(os.environ.get("BENCH_ITERS", 10))
    t0 = time.perf_counter()
    for _ in range(iters):
        wav, mel_lens = synthesize(*args)
    jax.block_until_ready((wav, mel_lens))
    dt = time.perf_counter() - t0

    audio_seconds = float(jnp.sum(mel_lens)) * HOP / SR * iters
    rtx = audio_seconds / dt
    frames_per_sec = float(jnp.sum(mel_lens)) * iters / dt

    print(json.dumps({
        "metric": "batch_synthesis_xrealtime",
        "value": round(rtx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtx / 50.0, 3),
        "detail": {
            "batch": B, "mel_frames_per_sec": round(frames_per_sec),
            "wall_s_per_batch": round(dt / iters, 4),
            "audio_s_per_batch": round(audio_seconds / iters, 2),
        },
    }))


if __name__ == "__main__":
    main()
