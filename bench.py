"""Benchmark: end-to-end batch synthesis speed on one TPU chip.

Pipeline: tokens → CompTransTTS (transformer_fs2, bf16) → HiFi-GAN V1 →
waveform. Metric: real-time factor (seconds of audio generated per second of
wall clock). Baseline target: ≥50× real time per chip (BASELINE.json
north_star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The acoustic model and vocoder are jitted separately (one fused graph
compiles slower through the remote-compile path with no runtime win — both
stages are already device-bound), and a persistent compilation cache under
.cache/jax makes repeat runs start fast.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# BENCH_TEXT=real drives these through the production text frontend instead
# of synthetic uniform tokens (lengths and token stats match real traffic)
_REAL_SENTENCES = [
    "The quick brown fox jumps over the lazy dog near the riverbank.",
    "Printing, in the only sense with which we are at present concerned,"
    " differs from most if not from all the arts.",
    "Weather forecasts predict heavy rain across the northern counties"
    " by early tomorrow morning.",
    "She sells seashells by the seashore, and the shells she sells are"
    " surely seashells.",
    "Machine learning systems convert written text into natural sounding"
    " speech in real time.",
    "A committee was appointed to investigate the condition of the"
    " prisons throughout the country.",
    "He walked slowly down the long corridor, listening to the echo of"
    " his own footsteps.",
    "The orchestra tuned their instruments while the audience found"
    " their seats in the hall.",
]


def main():
    from ctts_tpu.config import get_configs_of
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.vocoder.hifigan import HiFiGANGenerator, V1_CONFIG

    # default serving batch: 128 utterances (throughput scales with batch —
    # 16→300×, 32→408×, 64→628×, 128→923×, 256→1000× real time; BENCH_B
    # overrides)
    B = int(os.environ.get("BENCH_B", 128))
    T_s = 128
    HOP, SR = 256, 22050
    BUCKET = 128

    preprocess, model_cfg, train_cfg = get_configs_of("LJSpeech")
    model_cfg = prepare_model_config(preprocess, model_cfg)
    model = CompTransTTS(preprocess, model_cfg, train_cfg)
    vocoder = HiFiGANGenerator(dict(V1_CONFIG), dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    text_mode = os.environ.get("BENCH_TEXT", "synthetic")
    d_control = float(os.environ.get("BENCH_DCONTROL", 1.0))
    if text_mode == "real":
        # real English sentences through the production text frontend
        # (lexicon/G2P path if configured, grapheme cleaners otherwise), so
        # token and length distributions match real serving traffic
        from synthesize import preprocess_english
        seqs = [preprocess_english(s, preprocess)[:T_s]
                for s in _REAL_SENTENCES]
        seqs = (seqs * (B // len(seqs) + 1))[:B]
        texts_np = np.zeros((B, T_s), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, s in enumerate(seqs):
            texts_np[i, :len(s)] = s
            lens[i] = len(s)
        texts = jnp.asarray(texts_np)
        src_lens = jnp.asarray(lens)
    else:
        texts = jnp.asarray(rng.randint(1, 300, size=(B, T_s)), jnp.int32)
        src_lens = jnp.full((B,), T_s, jnp.int32)
    speakers = jnp.zeros((B,), jnp.int32)

    am_vars = model.init(
        {"params": jax.random.PRNGKey(0)}, speakers=speakers, texts=texts,
        src_lens=src_lens, mode="infer", max_mel_len=BUCKET,
        deterministic=True)
    voc_vars = vocoder.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 16, 80), jnp.float32))

    def make_acoustic(t_m):
        @jax.jit
        def acoustic(params, texts, src_lens, speakers):
            out = model.apply(
                {"params": params,
                 "batch_stats": am_vars.get("batch_stats", {})},
                speakers=speakers, texts=texts, src_lens=src_lens,
                mode="infer", max_mel_len=t_m, d_control=d_control,
                deterministic=True)
            return (out["postnet_mel_predictions"], out["mel_lens"],
                    out["duration_rounded"])
        return acoustic

    # serving pattern: probe predicted total durations with a tiny mel
    # budget, then synthesize with a right-sized static bucket
    probe = make_acoustic(BUCKET)
    _, _, durs = probe(am_vars["params"], texts, src_lens, speakers)
    true_len = int(jnp.sum(durs, axis=1).max())
    T_m = int(-(-max(true_len, BUCKET) // BUCKET) * BUCKET)
    acoustic = make_acoustic(T_m)

    @jax.jit
    def vocode(voc_params, mel):
        wav = vocoder.apply(voc_params, mel)
        return wav, wav[:, ::4096].sum()      # cheap probe to force compute

    # warmup / compile
    mel, mel_lens, _ = acoustic(am_vars["params"], texts, src_lens, speakers)
    wav, pr = vocode(voc_vars, mel)
    _ = float(pr) + float(mel_lens.sum())

    # XLA cost-model FLOPs for an MFU figure (bf16 peak)
    flops = None
    try:
        c1 = (acoustic.lower(am_vars["params"], texts, src_lens, speakers)
              .compile().cost_analysis())
        c2 = vocode.lower(voc_vars, mel).compile().cost_analysis()
        c1 = c1[0] if isinstance(c1, (list, tuple)) else c1
        c2 = c2[0] if isinstance(c2, (list, tuple)) else c2
        flops = float(c1.get("flops", 0)) + float(c2.get("flops", 0)) or None
    except Exception:
        pass
    kind = jax.devices()[0].device_kind.lower()
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 0)) * 1e12
    if not peak:
        for tag, tflops in (("v5 lite", 197.0), ("v5e", 197.0),
                            ("v5p", 459.0), ("v4", 275.0), ("v6", 918.0)):
            if tag in kind:
                peak = tflops * 1e12
                break

    iters = int(os.environ.get("BENCH_ITERS", 10))
    t0 = time.perf_counter()
    total_frames = 0
    for _ in range(iters):
        mel, mel_lens, _ = acoustic(am_vars["params"], texts, src_lens,
                                    speakers)
        wav, pr = vocode(voc_vars, mel)
        total_frames += float(mel_lens.sum())
        _ = float(pr)                         # forces full pipeline each iter
    dt = time.perf_counter() - t0

    audio_seconds = total_frames * HOP / SR
    rtx = audio_seconds / dt
    mfu = (flops * iters / dt / peak) if (flops and peak) else None
    print(json.dumps({
        "metric": "batch_synthesis_xrealtime",
        "value": round(rtx, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtx / 50.0, 3),
        "detail": {
            "batch": B,
            "mel_frames_per_sec": round(total_frames / dt),
            "wall_s_per_batch": round(dt / iters, 4),
            "audio_s_per_batch": round(audio_seconds / iters, 2),
            "mfu_pct": round(100 * mfu, 2) if mfu else None,
            "device_kind": kind,
        },
    }))


if __name__ == "__main__":
    main()
