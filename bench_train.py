"""Training-step throughput benchmark (counterpart of the reference's
README training table: time per 1K steps at batch 16 — README.md:26-35).

Runs the full unsup+cwt training step (model fwd/bwd + on-device MAS + CTC +
optimizer) on synthetic batches at LJSpeech-like shapes and reports
ms/step + projected minutes per 1K steps. Not driver-run; see bench.py for
the headline synthesis metric.
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


def main():
    from ctts_tpu.config import get_configs_of
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    B = int(os.environ.get("BENCH_B", 16))
    T_s, T_m = 128, 896          # LJSpeech-like shape bucket
    preprocess, model_cfg, train_cfg = get_configs_of("LJSpeech")
    model_cfg["block_type"] = os.environ.get("BENCH_BLOCK",
                                             "transformer_fs2")
    # BENCH_PROSODY=du2021|liu2021 measures the prosody stacks' step cost
    # (AR GRU scan over phones for du2021). Both are supervised-duration
    # features (reference model.yaml:11,19), so the step flips to train_sup.
    # BENCH_PROSODY=sup_none benches the supervised step WITHOUT prosody —
    # the baseline the du2021/liu2021 rows are deltas against
    prosody = os.environ.get("BENCH_PROSODY", "none")
    mode = "train_unsup"
    if prosody != "none":
        if prosody != "sup_none":
            model_cfg["prosody_modeling"]["model_type"] = prosody
        model_cfg["duration_modeling"]["learn_alignment"] = False
        # the synthetic energies below are frame-level; the shipped config
        # would switch sup mode to phoneme-level energy ([B, T_s] targets)
        preprocess["preprocessing"]["energy"]["feature"] = "frame_level"
        mode = "train_sup"
    model_cfg = prepare_model_config(preprocess, model_cfg)
    model = CompTransTTS(preprocess, model_cfg, train_cfg)

    rng = np.random.RandomState(0)
    src_lens = np.full(B, T_s, np.int32)
    mel_lens = np.full(B, T_m, np.int32)
    batch = {
        "speakers": jnp.zeros(B, jnp.int32),
        "texts": jnp.asarray(rng.randint(1, 300, (B, T_s)), jnp.int32),
        "src_lens": jnp.asarray(src_lens),
        "mels": jnp.asarray(rng.randn(B, T_m, 80).astype(np.float32) - 4),
        "mel_lens": jnp.asarray(mel_lens),
        "pitch_data": {
            "pitch": jnp.zeros((B, T_m), jnp.int32),
            "f0": jnp.asarray(np.abs(rng.randn(B, T_m)).astype(np.float32)
                              * 0.4 + 7),
            "uv": jnp.asarray((rng.rand(B, T_m) < 0.2).astype(np.float32)),
            "cwt_spec": jnp.asarray(rng.randn(B, T_m, 10).astype(np.float32)),
            "f0_mean": jnp.full((B,), 5.3, jnp.float32),
            "f0_std": jnp.full((B,), 0.2, jnp.float32),
        },
        "energies": jnp.asarray(rng.randn(B, T_m).astype(np.float32)),
        "durations": None,
        "attn_priors": jnp.asarray(
            rng.rand(B, T_m, T_s).astype(np.float32) + 1e-3),
        "spker_embeds": None,
    }
    if mode == "train_sup":
        durations = np.vstack([
            rng.multinomial(T_m - T_s, np.ones(T_s) / T_s) + 1
            for _ in range(B)]).astype(np.int32)
        batch["durations"] = jnp.asarray(durations)
        batch["attn_priors"] = None
        batch["pitch_data"]["mel2ph"] = jnp.asarray(np.vstack(
            [np.repeat(np.arange(1, T_s + 1), d)[:T_m]
             for d in durations]).astype(np.int32))

    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode=mode,
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        pitch_targets=batch["pitch_data"], energy_targets=batch["energies"],
        duration_targets=batch["durations"],
        attn_priors=batch["attn_priors"],
        step=jnp.zeros((), jnp.int32), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    tx, _ = build_optimizer(model_cfg, train_cfg)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, preprocess, model_cfg, train_cfg,
                              mode, donate=False)

    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    _ = float(metrics["total"])                     # compile + warmup

    # analytic FLOPs from XLA's cost model for the whole compiled train step
    # (fwd + bwd + optimizer), for an MFU figure against the chip's bf16 peak
    flops = None
    try:
        cost = (step_fn.lower(state, batch, jax.random.PRNGKey(1))
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    iters = int(os.environ.get("BENCH_ITERS", 20))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(os.path.join(
            profile_dir, model_cfg["block_type"]))
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        _ = float(metrics["total"])
        dts.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(dts))
    if profile_dir:
        jax.profiler.stop_trace()

    # reference: transformer_fs2 at bs16 = 4m53s / 1K steps (README.md:35)
    ref_s_per_1k = {"transformer_fs2": 293.0, "transformer": 291.0,
                    "fastformer": 285.0, "lstransformer": 326.0,
                    "conformer": 424.0, "reformer": 616.0}.get(
        model_cfg["block_type"])
    # bf16 peak per chip: v5e (v5 lite) 197 TFLOP/s, v4 275, v5p 459
    kind = jax.devices()[0].device_kind.lower()
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 0)) * 1e12
    if not peak:
        for tag, tflops in (("v5 lite", 197.0), ("v5e", 197.0),
                            ("v5p", 459.0), ("v4", 275.0), ("v6", 918.0)):
            if tag in kind:
                peak = tflops * 1e12
                break
    mfu = (flops / dt / peak) if (flops and peak) else None

    out = {
        "metric": "train_step_ms",
        "value": round(dt * 1000, 2),
        "unit": "ms_per_step_bs16",
        "block": model_cfg["block_type"],
        "s_per_1k_steps": round(dt * 1000),
        "speedup_vs_reference_gpu": (round(ref_s_per_1k / (dt * 1000), 2)
                                     if ref_s_per_1k else None),
        "tflops_per_step": round(flops / 1e12, 3) if flops else None,
        "mfu_pct": round(100 * mfu, 2) if mfu else None,
        "repeats": repeats,
        "ms_std": round(float(np.std(dts)) * 1000, 3),
        "device_kind": kind,
    }
    if prosody != "none":
        out["prosody"] = prosody
        out["mode"] = mode
    print(json.dumps(out))


if __name__ == "__main__":
    main()
