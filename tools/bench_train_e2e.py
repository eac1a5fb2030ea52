"""End-to-end train.py timing on the real chip (VERDICT-r3 missing #1).

The reference's published training table is wall time of the REAL loop —
data loading, H2D, logging, step — over 1K steps at batch 16
(/root/reference/README.md:26-35, loop at /root/reference/train.py:93-210).
bench_train.py times only the jitted step on a device-resident synthetic
batch. This tool closes the gap: it times `python train.py` itself, with
the production Dataset (native C++ npy loader + background prefetch),
sort-group bucketing, per-host sharding and the logging cadence, on a
corpus of REAL preprocessed LJSpeech utterances (the LJdemo real-speech
micro-corpus replicated under fresh utterance ids — real mel/f0/energy
tensors through the real IO path; hardlinks, so the store costs ~nothing).

Method
  1. replicate the LJdemo store (tools/real_speech_validation.py build)
     REPLICAS times into output/bench_e2e/preprocessed_data
  2. write a merged-yaml config whose step cadence keeps logging every
     LOG_STEP steps but pushes val/synth/save beyond the run
  3. run `train.py --max_steps WARM+MEASURE` as a subprocess, parse its
     per-window "NNNms/step" log lines, and average the windows after the
     warmup (first epoch compiles every bucket shape; the persistent
     compilation cache makes reruns representative)
  4. comparator: re-create the deterministic batch stream, count the
     bucketed shapes the measured window actually saw, time the bare
     jitted train step per unique shape on device-resident batches
     (exactly bench_train.py's protocol), and report
     e2e_ms / weighted_jitted_ms — the loop's true overhead factor.

Writes E2E_TRAIN_BENCH.json and prints one JSON line.

Usage: python tools/bench_train_e2e.py [--measure 1000] [--warm 300]
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

_SRC = os.path.join(_REPO, "output", "real_speech", "LJdemo",
                    "preprocessed_data")
_OUT = os.path.join(_REPO, "output", "bench_e2e")
_DATASET = "LJSpeech_bench_e2e"


def build_store(replicas):
    """Hardlink-replicate the real LJdemo store under fresh utterance ids."""
    if not os.path.isfile(os.path.join(_SRC, "train_unsup.txt")):
        raise SystemExit(
            f"no LJdemo store under {_SRC} — run "
            "`python tools/real_speech_validation.py build` first")
    dst = os.path.join(_OUT, "preprocessed_data")
    shutil.rmtree(_OUT, ignore_errors=True)
    os.makedirs(dst)
    for fn in ("stats.json", "speakers.json"):
        shutil.copy(os.path.join(_SRC, fn), os.path.join(dst, fn))

    with open(os.path.join(_SRC, "train_unsup.txt")) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    bases = [ln.split("|")[0] for ln in lines]

    feat_dirs = [d for d in os.listdir(_SRC)
                 if os.path.isdir(os.path.join(_SRC, d))]
    new_lines = []
    for r in range(replicas):
        for base, line in zip(bases, lines):
            parts = line.split("|")
            nb = f"{base}_r{r:03d}"
            parts[0] = nb
            new_lines.append("|".join(parts))
            for d in feat_dirs:
                sdir = os.path.join(_SRC, d)
                for fn in os.listdir(sdir):
                    # files are <spk>-<feat>-<base>.npy
                    if fn.endswith(f"-{base}.npy"):
                        os.makedirs(os.path.join(dst, d), exist_ok=True)
                        os.link(os.path.join(sdir, fn), os.path.join(
                            dst, d, fn[:-len(base) - 4] + nb + ".npy"))
    with open(os.path.join(dst, "train_unsup.txt"), "w") as f:
        f.write("\n".join(new_lines) + "\n")
    # val set unused (val_step beyond the run) but the Dataset ctor wants it
    with open(os.path.join(dst, "val_unsup.txt"), "w") as f:
        f.write("\n".join(new_lines[:2]) + "\n")
    return len(new_lines)


def write_config(total_steps, log_step, device_cache_mb=None):
    import yaml
    with open(os.path.join(_REPO, "configs", "LJSpeech.yaml")) as f:
        merged = yaml.safe_load(f)
    if device_cache_mb is not None:
        # --device_cache_mb 0 measures the STREAMING loader (double-
        # buffered prefetch device_put) instead of the HBM corpus cache
        merged["train"]["device_cache_mb"] = device_cache_mb
    merged["preprocess"]["path"]["raw_path"] = os.path.join(_OUT, "raw")
    merged["preprocess"]["path"]["preprocessed_path"] = os.path.join(
        _OUT, "preprocessed_data")
    merged["train"]["path"] = {
        k: os.path.join(_OUT, "out", k)
        for k in ("ckpt_path", "log_path", "result_path")}
    merged["train"]["step"].update(
        total_step=total_steps, log_step=log_step,
        val_step=10**9, synth_step=10**9, save_step=10**9)
    cfg_dir = os.path.join(_OUT, "configs")
    os.makedirs(cfg_dir, exist_ok=True)
    path = os.path.join(cfg_dir, _DATASET + ".yaml")
    with open(path, "w") as f:
        yaml.safe_dump(merged, f)
    return cfg_dir


def run_train(cfg_dir, total_steps):
    cmd = [sys.executable, os.path.join(_REPO, "train.py"),
           "--dataset", _DATASET, "--config_dir", cfg_dir,
           "--max_steps", str(total_steps)]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=_REPO)
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(f"train.py failed rc={proc.returncode}")
    windows = {}   # step -> ms/step over the window ending at step
    for m in re.finditer(r"step (\d+): .*?([\d.]+)ms/step", proc.stdout):
        windows[int(m.group(1))] = float(m.group(2))
    return windows, wall, proc.stdout


def jitted_comparator(cfg_dir, warm, total_steps, seed):
    """Weighted bare-jitted-step time over the bucket shapes the measured
    window saw (bench_train.py protocol, real shapes)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ctts_tpu.config import get_configs_of
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step, prep_batch)
    from ctts_tpu.utils.optimizer import build_optimizer

    pre, mod, tr = get_configs_of(_DATASET, cfg_dir)
    mod = prepare_model_config(pre, mod)
    ds = Dataset("train_unsup.txt", pre, mod, tr, sort=True, drop_last=True)

    # deterministic replay of the batch stream train.py consumed
    shape_counts, step, epoch = {}, 0, 0
    example = {}
    while step < total_steps:
        for batch in ds.batches(epoch=epoch, seed=tr["seed"]):
            step += 1
            if step <= warm:
                continue
            key = (batch["texts"].shape[1], batch["mels"].shape[1],
                   batch["texts"].shape[0])
            shape_counts[key] = shape_counts.get(key, 0) + 1
            example.setdefault(key, batch)
            if step >= total_steps:
                break
        epoch += 1

    model = CompTransTTS(pre, mod, tr)
    tx, _ = build_optimizer(mod, tr)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_unsup",
                              donate=False)

    # TIMING TRAP: execute one eager op before any timing loop
    _ = float(jnp.abs(jnp.ones(8)).max())

    per_shape_ms = {}
    state = None
    for key, batch in example.items():
        # device_put ONCE (TIMING TRAP #3: host arrays fed to a jitted call
        # re-transfer the batch every iteration)
        dev = jax.device_put({k: v for k, v in batch.items()
                              if k not in ("ids", "raw_texts")})
        if state is None:
            # model.init needs real kwargs shapes: prep_batch fills the
            # on-device beta-binomial prior + upcasts f16 transfer arrays,
            # exactly like _make_train_step_fn does inside the jitted step
            # (the step_fn path below calls it traced)
            first = prep_batch(dev, pre, "train_unsup")
            kwargs = dict(
                speakers=first["speakers"], texts=first["texts"],
                src_lens=first["src_lens"], mode="train_unsup",
                mels=first["mels"], mel_lens=first["mel_lens"],
                pitch_targets=first["pitch_data"],
                energy_targets=first["energies"],
                attn_priors=first["attn_priors"],
                step=jnp.zeros((), jnp.int32), deterministic=True)
            variables = model.init({"params": jax.random.PRNGKey(0)},
                                   **kwargs)
            state = create_train_state(variables, tx)
        s, metrics = step_fn(state, dev, jax.random.PRNGKey(1))
        _ = float(metrics["total"])                       # compile+warm
        iters, reps, dts = 20, 3, []
        for _r in range(reps):
            t0 = time.perf_counter()
            s2 = state
            for _i in range(iters):
                s2, metrics = step_fn(s2, dev, jax.random.PRNGKey(1))
            jax.block_until_ready(metrics["total"])
            dts.append((time.perf_counter() - t0) / iters)
        per_shape_ms[key] = float(np.median(dts)) * 1000.0

    n = sum(shape_counts.values())
    weighted = sum(per_shape_ms[k] * c for k, c in shape_counts.items()) / n
    return weighted, {str(k): (shape_counts[k], round(per_shape_ms[k], 2))
                      for k in shape_counts}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", type=int, default=1000)
    ap.add_argument("--warm", type=int, default=300,
                    help="steps excluded from the measurement (bucket-shape "
                         "compiles land in the first epoch)")
    ap.add_argument("--log_step", type=int, default=100)
    ap.add_argument("--replicas", type=int, default=43)
    ap.add_argument("--skip_comparator", action="store_true")
    ap.add_argument("--device_cache_mb", type=int, default=None,
                    help="override train.device_cache_mb (0 = measure the "
                         "streaming loader); default: the shipped config")
    ap.add_argument("--out_json", type=str, default="E2E_TRAIN_BENCH.json")
    args = ap.parse_args()

    total = args.warm + args.measure
    n = build_store(args.replicas)
    print(f"store: {n} real utterances (6 unique x {args.replicas})",
          flush=True)
    cfg_dir = write_config(total, args.log_step, args.device_cache_mb)

    windows, wall, stdout = run_train(cfg_dir, total)
    measured = {s: ms for s, ms in windows.items() if s > args.warm}
    if len(measured) * args.log_step < args.measure:
        sys.stderr.write(stdout[-3000:])
        raise SystemExit(f"expected {args.measure} measured steps, got "
                         f"{len(measured) * args.log_step}")
    e2e_ms = float(np.mean(list(measured.values())))
    e2e_std = float(np.std(list(measured.values())))

    out = {
        "metric": "train_e2e_ms_per_step",
        "value": round(e2e_ms, 2),
        "unit": "ms_per_step_bs16_end_to_end",
        "s_per_1k_steps": round(e2e_ms, 1),
        "measured_steps": len(measured) * args.log_step,
        "warmup_steps": args.warm,
        "window_ms": {str(k): round(v, 1) for k, v in sorted(
            measured.items())},
        "window_std_ms": round(e2e_std, 2),
        "subprocess_wall_s": round(wall, 1),
        "corpus": f"{n} real LJSpeech utterances (LJdemo x{args.replicas})",
    }
    if not args.skip_comparator:
        jit_ms, shapes = jitted_comparator(cfg_dir, args.warm, total,
                                           seed=0)
        out["jitted_step_ms_weighted"] = round(jit_ms, 2)
        out["e2e_over_jitted"] = round(e2e_ms / jit_ms, 3)
        out["bucket_shapes_Ts_Tm_B"] = shapes
    if args.device_cache_mb is not None:
        out["device_cache_mb"] = args.device_cache_mb
    with open(os.path.join(_REPO, args.out_json), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
