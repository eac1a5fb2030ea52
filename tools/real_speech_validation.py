"""Real-speech validation on the audio shipped inside the reference repo.

The container has no LJSpeech/VCTK corpus, but `/root/reference/demo/
{LJSpeech,VCTK}_v0.2.1/900000/` ships 18 real speech wavs (22.05 kHz mono,
the reference model's 900k-step demo outputs — real glottal excitation,
formants and prosody), and every one of them has its transcript + ARPAbet
phone string in the reference's shipped `preprocessed_data/*/val_unsup.txt`.
This tool drives the PRODUCTION pipeline over that audio:

1. build: assemble raw_data micro-corpora (wav + .lab per utterance, the
   exact layout `prepare_align.py` produces; phones come from the shipped
   transcripts via an identity g2p so token sequences match the reference's
   own featurization), run `Preprocessor.build_from_path()` end-to-end, and
   compare the resulting stats.json (f0 mean/std from OUR YIN tracker,
   energy stats, mel ranges) against the reference's shipped full-corpus
   `stats.json` (ref preprocessor/preprocessor.py:287-300).
2. train: run the production unsup train step (parallel/train_step.py, the
   same function train.py jits) for a few hundred steps on the LJSpeech
   micro-corpus and record the alignment-learning evidence: ForwardSum CTC
   + bin losses falling and the soft attention concentrating onto the MAS
   path (mean soft mass on the hard path), plus hard-path diagonality.

Writes `REAL_SPEECH_VALIDATION.md` at the repo root.

Usage: python tools/real_speech_validation.py [build|train|vctk|all]
(default all). CPU-safe for `build`; `train` (LJdemo plateau + fidelity +
ckpt pack) and `vctk` (multi-speaker) want the TPU (CTTS_FORCE_CPU=1 to
override; RSV_MAX_STEPS / RSV_VCTK_STEPS bound the runs).
"""

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

_REF = "/root/reference"
_OUT = os.path.join(_REPO, "output", "real_speech")
_REPORT = os.path.join(_REPO, "REAL_SPEECH_VALIDATION.md")

CORPORA = {
    "LJdemo": {
        "demo_dir": f"{_REF}/demo/LJSpeech_v0.2.1/900000",
        "meta": f"{_REF}/preprocessed_data/LJSpeech/val_unsup.txt",
        "ref_stats": f"{_REF}/preprocessed_data/LJSpeech/stats.json",
        "base_config": "LJSpeech",
        "multi_speaker": False,
    },
    "VCTKdemo": {
        "demo_dir": f"{_REF}/demo/VCTK_v0.2.1/900000",
        "meta": f"{_REF}/preprocessed_data/VCTK/val_unsup.txt",
        "ref_stats": f"{_REF}/preprocessed_data/VCTK/stats.json",
        "base_config": "VCTK",
        "multi_speaker": True,
    },
}


def _load_meta(path):
    rows = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("|")
            if len(parts) >= 4:
                rows[parts[0]] = (parts[1], parts[2], parts[3])
    return rows


def build_corpus(name, spec):
    """demo wavs + shipped transcripts -> raw_data/<speaker>/<base>.{wav,lab}

    The .lab holds the shipped ARPAbet phone string (brace-stripped): with
    an identity per-token g2p the production pipeline reproduces the exact
    phone sequence the reference featurized, so alignment training sees
    real phones against real audio.
    """
    meta = _load_meta(spec["meta"])
    raw = os.path.join(_OUT, name, "raw_data")
    shutil.rmtree(os.path.join(_OUT, name), ignore_errors=True)
    used = []
    for fn in sorted(os.listdir(spec["demo_dir"])):
        if not fn.endswith(".wav"):
            continue
        base = fn[:-4]
        if base not in meta:
            continue
        speaker, phones, raw_text = meta[base]
        spk_dir = os.path.join(raw, speaker)
        os.makedirs(spk_dir, exist_ok=True)
        shutil.copy(os.path.join(spec["demo_dir"], fn),
                    os.path.join(spk_dir, fn))
        phone_line = phones.strip()
        if phone_line.startswith("{"):
            phone_line = phone_line[1:-1]
        with open(os.path.join(spk_dir, base + ".lab"), "w") as f:
            f.write(phone_line + "\n")
        used.append((base, speaker, raw_text))
    assert used, f"no usable wavs for {name}"
    return raw, used


def _configs_for(name, spec):
    from ctts_tpu.config import get_configs_of
    pre, mod, tr = get_configs_of(spec["base_config"])
    pre["path"]["raw_path"] = os.path.join(_OUT, name, "raw_data")
    pre["path"]["preprocessed_path"] = os.path.join(_OUT, name,
                                                    "preprocessed_data")
    pre["preprocessing"]["val_size"] = 2
    mod["multi_speaker"] = spec["multi_speaker"]
    # DeepSpeaker weights are an external download; fall back to the
    # trainable-embedding path for the micro-corpus
    pre["preprocessing"]["speaker_embedder"] = "none"
    tr["path"] = {k: os.path.join(_OUT, name, "out", k)
                  for k in ("ckpt_path", "log_path", "result_path")}
    return pre, mod, tr


def preprocess_corpus(name, spec):
    from ctts_tpu.preprocessing.preprocessor import Preprocessor
    pre, mod, tr = _configs_for(name, spec)
    prep = Preprocessor(pre, mod, tr)
    prep.g2p = lambda w: [w]      # .lab already holds ARPAbet tokens
    t0 = time.time()
    prep.build_from_path()
    dt = time.time() - t0
    with open(os.path.join(pre["path"]["preprocessed_path"],
                           "stats.json")) as f:
        stats = json.load(f)
    with open(spec["ref_stats"]) as f:
        ref_stats = json.load(f)
    return stats, ref_stats, dt


def compare_stats(name, stats, ref_stats, n_utts, seconds, report):
    f0 = stats["f0_unsup"]
    rf0 = ref_stats["f0_unsup"]
    e = stats["energy_unsup_frame"]
    re_ = ref_stats["energy_unsup_frame"]
    mel_min = np.asarray(stats["spec_unsup_min"])
    mel_max = np.asarray(stats["spec_unsup_max"])
    rmin = np.asarray(ref_stats["spec_unsup_min"])
    rmax = np.asarray(ref_stats["spec_unsup_max"])

    rows = [
        ("f0 mean (Hz)", f0[0], rf0[0]),
        ("f0 std (Hz)", f0[1], rf0[1]),
        ("energy mean", e[2], re_[2]),
        ("energy std", e[3], re_[3]),
        ("mel floor (min over bins)", float(mel_min.min()),
         float(rmin.min())),
        ("mel ceil (max over bins)", float(mel_max.max()),
         float(rmax.max())),
    ]
    report.append(f"\n### {name} ({n_utts} utterances, {seconds:.1f}s of "
                  "real speech)\n")
    report.append("| quantity | micro-corpus (ours) | reference full-corpus "
                  "stats.json | ratio |")
    report.append("|---|---|---|---|")
    checks = []
    for label, ours, ref in rows:
        ratio = ours / ref if ref else float("nan")
        report.append(f"| {label} | {ours:.2f} | {ref:.2f} | {ratio:.2f} |")
        checks.append((label, ratio))
    # mel values are log-compressed with a hard floor at log(1e-5); an
    # 18-utterance sample cannot reach the 13k-utterance extrema, so the
    # check is CONTAINMENT: the micro-corpus dynamic range must lie inside
    # the full-corpus range (same compression, same filterbank)
    ok_f0 = 0.7 <= checks[0][1] <= 1.3
    ok_mel = (rows[4][1] >= rows[4][2] - 0.1
              and rows[5][1] <= rows[5][2] + 0.3)
    report.append("")
    report.append(
        f"- f0 mean within 30% of the shipped corpus statistic: "
        f"**{'PASS' if ok_f0 else 'FAIL'}** (our YIN tracker on real "
        "speech vs the reference's parselmouth over the full corpus)")
    report.append(
        f"- log-mel dynamic range contained in the shipped full-corpus "
        f"range: **{'PASS' if ok_mel else 'FAIL'}**")
    return ok_f0 and ok_mel


def cmd_build(report):
    ok_all = True
    for name, spec in CORPORA.items():
        raw, used = build_corpus(name, spec)
        stats, ref_stats, dt = preprocess_corpus(name, spec)
        # total speech seconds from the preprocessed mels
        pre, _, _ = _configs_for(name, spec)
        hop = pre["preprocessing"]["stft"]["hop_length"]
        sr = pre["preprocessing"]["audio"]["sampling_rate"]
        mel_dir = os.path.join(pre["path"]["preprocessed_path"], "mel_unsup")
        frames = sum(np.load(os.path.join(mel_dir, f)).shape[0]
                     for f in os.listdir(mel_dir))
        secs = frames * hop / sr
        print(f"{name}: {len(used)} utts, {secs:.1f}s, preprocess {dt:.1f}s",
              flush=True)
        ok = compare_stats(name, stats, ref_stats, len(used), secs, report)
        ok_all = ok_all and ok
    return ok_all


# --------------------------------------------------------------------- #
# alignment training on real speech
# --------------------------------------------------------------------- #

_AM_JIT = {}


def _am_apply_jit(model):
    """Jitted attn-outs apply per model (EAGER model.apply dispatches
    op-by-op through the TPU tunnel — the round-3 serving bug class)."""
    import jax
    hit = _AM_JIT.get(id(model))
    if hit is None or hit[0] is not model:
        def apply(variables, speakers, texts, src_lens, mels, mel_lens,
                  pitch_targets, energy_targets, attn_priors, step):
            out, _ = model.apply(
                variables, mutable=["batch_stats"], speakers=speakers,
                texts=texts, src_lens=src_lens, mode="train_unsup",
                mels=mels, mel_lens=mel_lens, pitch_targets=pitch_targets,
                energy_targets=energy_targets, attn_priors=attn_priors,
                step=step, deterministic=True)
            return out["attn_outs"][0], out["attn_outs"][1]
        hit = (model, jax.jit(apply))
        _AM_JIT[id(model)] = hit
    return hit[1]


def _alignment_metrics(model, variables, batch, step):
    """Soft-mass-on-hard-path + hard-path diagonality for one batch."""
    import jax.numpy as jnp
    soft, hard = _am_apply_jit(model)(
        variables,
        jnp.asarray(batch["speakers"]),
        jnp.asarray(batch["texts"]),
        jnp.asarray(batch["src_lens"]),
        jnp.asarray(batch["mels"]),
        jnp.asarray(batch["mel_lens"]),
        {k: jnp.asarray(v) for k, v in batch["pitch_data"].items()},
        jnp.asarray(batch["energies"]),
        jnp.asarray(batch["attn_priors"]),
        jnp.asarray(step))
    soft = np.asarray(soft, np.float32)                  # [B(,1),T_m,T_s]
    hard = np.asarray(hard, np.float32)
    soft = soft[:, 0] if soft.ndim == 4 else soft
    hard = hard[:, 0] if hard.ndim == 4 else hard
    mass, diag = [], []
    for b in range(soft.shape[0]):
        L = int(batch["src_lens"][b])
        M = int(batch["mel_lens"][b])
        s, h = soft[b, :M, :L], hard[b, :M, :L]
        mass.append(float((s * h).sum() / M))
        ph = h.argmax(-1).astype(np.float64)             # mel2ph - 1
        ramp = np.arange(M) * (L - 1) / max(M - 1, 1)
        diag.append(float(np.corrcoef(ph, ramp)[0, 1]))
    return float(np.mean(mass)), float(np.mean(diag))


def _train_setup(name, batch_size=4, store=None):
    """Shared model/data/step setup for the real-speech training runs.
    `store` points the Dataset at a different preprocessed store (e.g. the
    172-utterance replicated one from tools/bench_train_e2e.py) while the
    configs/stats stay LJdemo's."""
    import jax
    if os.environ.get("CTTS_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    spec = CORPORA[name]
    pre, mod, tr = _configs_for(name, spec)
    if store is not None:
        pre["path"]["preprocessed_path"] = store
    mod = prepare_model_config(pre, mod)
    tr["optimizer"]["batch_size"] = batch_size
    # micro-corpus: binarize + use hard durations from the start so the
    # duration/variance losses see MAS output, and open the variance gate
    # so the duration/pitch/energy predictors train (with the reference's
    # 50k-step gate a short run would leave the duration head at random
    # init — bench.py's trained-ckpt mode needs real per-token durations)
    tr["step"]["binarization_start_steps"] = 0
    tr["step"]["var_start_steps"] = 0

    ds = Dataset("train_unsup.txt", pre, mod, tr, sort=True, drop_last=False)
    raw_batches = list(ds.batches(group_size=1, shuffle=False))
    from ctts_tpu.parallel.train_step import prep_batch
    # fills the beta-binomial prior when the production config runs with
    # train.on_device_prior (eagerly, once per micro-corpus batch), then
    # device_puts the WHOLE batch: prep_batch only touches dtypes/prior, so
    # without the explicit put the mels/texts stay host numpy and every
    # step pays a blocking ~10 MB device_put through the tunnel — measured
    # 291 ms/step vs ~30 ms with HBM-resident batches (the production loop
    # avoids this via the device cache, data/device_cache.py)
    batches = [jax.device_put(
                   prep_batch({k: v for k, v in b.items()
                               if k not in ("ids", "raw_texts")},
                              pre, "train_unsup"))
               for b in raw_batches]
    assert batches, f"no training batches in the {name} micro-corpus"

    model = CompTransTTS(pre, mod, tr)
    batch = batches[0]
    kwargs = dict(
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]), mode="train_unsup",
        mels=jnp.asarray(batch["mels"]),
        mel_lens=jnp.asarray(batch["mel_lens"]),
        pitch_targets={k: jnp.asarray(v)
                       for k, v in batch["pitch_data"].items()},
        energy_targets=jnp.asarray(batch["energies"]),
        attn_priors=jnp.asarray(batch["attn_priors"]),
        step=jnp.zeros((), jnp.int32), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    tx, _ = build_optimizer(mod, tr)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_unsup",
                              donate=False)
    return dict(pre=pre, mod=mod, tr=tr, model=model, state=state,
                step_fn=step_fn, batches=batches, raw_batches=raw_batches)


def _vars_of(state):
    return {"params": state.params, "batch_stats": state.batch_stats or {}}


def _run_training(setup, max_steps, plateau_window=0, plateau_tol=0.02,
                  min_steps=0, log_every=50):
    """Train on the micro-corpus; optional mel-loss plateau early-stop:
    stop when mean mel loss over the last window improves < plateau_tol
    relative to the window before it. Returns (state, hist, wall,
    compile_s, stop_step)."""
    import jax
    state, step_fn, batches = (setup["state"], setup["step_fn"],
                               setup["batches"])
    hist, mel_log = [], []
    # ONE key for the whole run: the jitted step fold_ins state.step
    # internally (parallel/train_step.py:132), so dropout still varies per
    # step. Creating PRNGKey(s) per step is an EAGER device dispatch each
    # iteration — through the axon tunnel it cost ~160 ms/step (191.5 vs
    # 29.2 ms/step in E2E_TRAIN_BENCH.json; TIMING TRAP #4 class).
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    compile_s = None
    s = 0
    while s < max_steps:
        b = batches[s % len(batches)]
        state, metrics = step_fn(state, b, rng)
        if s == 0:
            jax.block_until_ready(metrics["total"])
            compile_s = time.time() - t0
        if s % log_every == 0 or s == max_steps - 1:
            row = (s, float(metrics["total"]), float(metrics["ctc"]),
                   float(metrics["bin"]), float(metrics["mel"]))
            hist.append(row)
            mel_log.append(row[4])
            print(f"step {s}: total={row[1]:.3f} ctc={row[2]:.3f}"
                  f" bin={row[3]:.3f} mel={row[4]:.3f}", flush=True)
            k = max(plateau_window // log_every, 2)
            if (plateau_window and s >= max(min_steps, 2 * plateau_window)
                    and len(mel_log) >= 2 * k):
                prev = float(np.mean(mel_log[-2 * k:-k]))
                last = float(np.mean(mel_log[-k:]))
                if prev - last < plateau_tol * prev:
                    print(f"plateau at step {s}: mel {prev:.4f} -> "
                          f"{last:.4f} (<{plateau_tol:.0%} window gain)",
                          flush=True)
                    s += 1
                    break
        s += 1
    wall = time.time() - t0
    return state, hist, wall, compile_s, s


def cmd_train(report, max_steps=None):
    """LJdemo: train the FULL model to a mel-loss plateau (overfitting the
    4-utterance micro-corpus is the point), then quantify synthesis
    fidelity (teacher-forced mel L1 + free-running MCD-DTW) and commit
    wav/png artifacts. VERDICT-r3 missing #2."""
    import jax

    name = "LJdemo"
    max_steps = max_steps or int(os.environ.get("RSV_MAX_STEPS", 6000))
    setup = _train_setup(name, batch_size=4)
    batch = setup["batches"][0]
    model = setup["model"]

    m0_mass, m0_diag = _alignment_metrics(model, _vars_of(setup["state"]),
                                          batch, 0)
    state, hist, wall, compile_s, steps = _run_training(
        setup, max_steps, plateau_window=750, plateau_tol=0.02,
        min_steps=1500)
    m1_mass, m1_diag = _alignment_metrics(model, _vars_of(state), batch,
                                          steps)

    # persist the trained weights: bench.py picks them up (when present)
    # so its predicted durations come from a net trained on real speech
    from ctts_tpu.utils.checkpoint import save_checkpoint
    ckpt_dir = os.path.join(_OUT, name, "ckpt")
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    save_checkpoint(ckpt_dir, jax.device_get(_vars_of(state)), steps)
    print(f"checkpoint -> {ckpt_dir}", flush=True)

    steady_ms = ((wall - (compile_s or 0.0)) / max(steps - 1, 1)) * 1000
    report.append("\n## 2. Full-model training to a mel plateau on real "
                  "speech\n")
    report.append(
        f"Production unsup train step (parallel/train_step.py — the same "
        f"jitted function train.py runs) on the LJdemo micro-corpus, batch "
        f"4, real mels/f0/energy from part 1, on "
        f"`{jax.devices()[0].device_kind}`: stopped at step {steps} "
        f"(plateau early-stop: <2% mel gain over 750-step windows, cap "
        f"{max_steps}). Wall {wall:.0f}s = {compile_s:.0f}s first-step "
        f"compile + {steady_ms:.0f} ms/step steady-state.\n")
    report.append("| step | total | ctc | bin | mel |")
    report.append("|---|---|---|---|---|")
    stride = max(len(hist) // 14, 1)
    shown = hist[::stride]
    if shown[-1] is not hist[-1]:
        shown.append(hist[-1])
    for s, tot, ctc, bl, mel in shown:
        report.append(f"| {s} | {tot:.3f} | {ctc:.3f} | {bl:.3f} "
                      f"| {mel:.3f} |")
    report.append("")
    report.append("| alignment metric | step 0 (init) | after training |")
    report.append("|---|---|---|")
    report.append(f"| soft attention mass on the MAS path (mean/frame) "
                  f"| {m0_mass:.4f} | {m1_mass:.4f} |")
    report.append(f"| hard-path diagonality (corr of mel2ph vs linear ramp) "
                  f"| {m0_diag:.4f} | {m1_diag:.4f} |")
    ctc_drop = hist[0][2] - hist[-1][2]
    ok = (ctc_drop > 0.5 and m1_mass > m0_mass and m1_diag > 0.95)
    report.append("")
    report.append(
        f"- CTC (ForwardSum) fell by {ctc_drop:.2f} nats, soft mass on the "
        f"MAS path rose {m0_mass:.3f} → {m1_mass:.3f}, and the binarized "
        f"path is monotone-diagonal (corr {m1_diag:.3f}): "
        f"**{'PASS' if ok else 'FAIL'}** — the aligner locks onto real "
        "speech, not just synthetic tones.")

    fid_ok, _, _ = _fidelity(name, setup, state, report)
    if os.environ.get("RSV_PACK", "1") != "0":   # RSV_PACK=0: smoke runs
        _write_ckpt_manifest(name, setup, state, steps, hist)
    return ok and fid_ok


def cmd_train172(max_steps=None):
    """Fidelity-scaling run (VERDICT-r4 missing #3): plateau-train on the
    172-utterance replicated real store (tools/bench_train_e2e.py's
    builder — 6 unique LJSpeech utterances x 43, real mels through the
    real loader) with batch 16 and a tighter plateau (1% over 2000-step
    windows), then score fidelity on the 6 unique utterances and repack
    assets/ljdemo_ckpt.npz. APPENDS §5 to REAL_SPEECH_VALIDATION.md
    (does not regenerate §1-3)."""
    import jax
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_train_e2e

    max_steps = max_steps or int(os.environ.get("RSV172_MAX_STEPS", 30000))
    n = bench_train_e2e.build_store(replicas=43)
    store = os.path.join(bench_train_e2e._OUT, "preprocessed_data")
    print(f"store: {n} utterances at {store}", flush=True)

    setup = _train_setup("LJdemo", batch_size=16, store=store)
    state, hist, wall, compile_s, steps = _run_training(
        setup, max_steps, plateau_window=2000, plateau_tol=0.01,
        min_steps=8000, log_every=100)
    steady_ms = ((wall - (compile_s or 0.0)) / max(steps - 1, 1)) * 1000

    # fidelity on the 6 UNIQUE utterances via the original LJdemo setup
    # (same stats.json, so features are identical to the replicas)
    fid_setup = _train_setup("LJdemo", batch_size=4)
    report = ["\n## 5. Fidelity scaling: plateau training on the "
              "172-utterance replicated store\n"]
    report.append(
        f"Same production unsup step, batch 16, {n} real utterances "
        f"(6 unique x 43 — the container ships only 6 real LJSpeech wavs, "
        f"so this scales STEPS-AT-BATCH-DIVERSITY, not acoustic variety), "
        f"on `{jax.devices()[0].device_kind}`: stopped at step {steps} "
        f"(plateau <1% mel gain over 2000-step windows, cap {max_steps}), "
        f"{steady_ms:.1f} ms/step steady, wall {wall:.0f}s. Compare §2's "
        f"6-utterance/batch-4 run (stopped 6000: teacher-forced mel L1 "
        f"0.166, free-running MCD-DTW 15.11 dB).\n")
    report.append("| step | total | ctc | bin | mel |")
    report.append("|---|---|---|---|---|")
    stride = max(len(hist) // 12, 1)
    shown = hist[::stride]
    if shown[-1] is not hist[-1]:
        shown.append(hist[-1])
    for s, tot, ctc, bl, mel in shown:
        report.append(f"| {s} | {tot:.3f} | {ctc:.3f} | {bl:.3f} "
                      f"| {mel:.3f} |")
    report.append("")

    # persist FIRST (orbax ckpt at bench.py's default path + packed npz +
    # manifest): a crash in the fidelity pass must never lose the
    # plateau-trained state (it did once — 70 min of chip time)
    from ctts_tpu.utils.checkpoint import save_checkpoint
    ckpt_dir = os.path.join(_OUT, "LJdemo", "ckpt")
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    save_checkpoint(ckpt_dir, jax.device_get(_vars_of(state)), steps)
    print(f"checkpoint -> {ckpt_dir}", flush=True)
    if os.environ.get("RSV_PACK", "1") != "0":
        _write_ckpt_manifest("LJdemo", fid_setup, state, steps, hist)

    fid_ok, _, _ = _fidelity("LJdemo172", fid_setup, state, report)

    with open(_REPORT, "a") as f:
        f.write("\n".join(report) + "\n")
    print(f"appended §5 -> {_REPORT}  fidelity="
          f"{'PASS' if fid_ok else 'FAIL'}")
    return fid_ok


def cmd_trend(caps=(2000, 5000)):
    """Fidelity-vs-steps trend on the 172-utterance store: train ONCE to
    max(caps) and score metrics-only fidelity at each cap en route (one
    run with snapshots ≡ separate runs to each cap — same init, same key,
    same deterministic batch order, so the shorter run is a prefix of the
    longer). Appends a trend table under §5; never touches the committed
    plateau artifacts (assets/fidelity/LJdemo172/, packed ckpt)."""
    import jax
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_train_e2e

    caps = sorted(caps)
    n = bench_train_e2e.build_store(replicas=43)
    store = os.path.join(bench_train_e2e._OUT, "preprocessed_data")
    print(f"store: {n} utterances at {store}", flush=True)

    setup = _train_setup("LJdemo", batch_size=16, store=store)
    fid_setup = _train_setup("LJdemo", batch_size=4)
    state, step_fn, batches = (setup["state"], setup["step_fn"],
                               setup["batches"])
    rng = jax.random.PRNGKey(0)
    rows, train_s = [], 0.0
    t0 = time.time()
    compile_s = None
    s = 0
    for cap in caps:
        while s < cap:
            state, metrics = step_fn(state, batches[s % len(batches)], rng)
            if s == 0:
                jax.block_until_ready(metrics["total"])
                compile_s = time.time() - t0
            if s % 500 == 0:
                print(f"step {s}: mel={float(metrics['mel']):.3f}",
                      flush=True)
            s += 1
        jax.block_until_ready(state.params)
        train_s = time.time() - t0
        scratch = []
        _, tf_l1, mcd = _fidelity("trend", fid_setup, state, scratch,
                                  artifacts=False)
        print(f"cap {cap}: tf_l1={tf_l1:.3f} mcd={mcd:.2f}", flush=True)
        rows.append((cap, tf_l1, mcd))
        t0 = time.time() - train_s          # exclude fidelity time

    steady_ms = ((train_s - (compile_s or 0.0)) / max(s - 1, 1)) * 1000
    report = [
        "\n### Fidelity vs training steps (trend, fresh run on the same "
        "172-utterance store)\n",
        f"One deterministic run (batch 16, fixed key, fixed batch order) "
        f"scored at step snapshots — each row is what a run stopped at "
        f"that cap would produce. {steady_ms:.1f} ms/step steady with the "
        f"hoisted-PRNGKey loop (the §5 plateau run above predates the fix "
        f"and ran 191.5 ms/step). The step-13301 row is the committed §5 "
        f"plateau run (different rng stream, same protocol).\n",
        "| steps | teacher-forced mel L1 | free-running MCD-DTW (dB) |",
        "|---|---|---|"]
    for cap, tf_l1, mcd in rows:
        report.append(f"| {cap} | {tf_l1:.3f} | {mcd:.2f} |")
    report.append("| 13301 (plateau, §5) | 0.065 | 7.95 |")
    report.append("")
    l1s = [r[1] for r in rows] + [0.065]
    mcds = [r[2] for r in rows] + [7.95]
    mono = (all(a >= b for a, b in zip(l1s, l1s[1:])) and
            all(a >= b for a, b in zip(mcds, mcds[1:])))
    report.append(
        ("- Both metrics improve monotonically with steps at fixed data — "
         if mono else
         "- Metrics vs steps (not strictly monotonic — see table) — ") +
        "compare §2's 6-utterance run: L1 0.166, MCD-DTW 15.11 dB.")
    with open(_REPORT, "a") as f:
        f.write("\n".join(report) + "\n")
    print(f"appended trend -> {_REPORT}")
    return True


# --------------------------------------------------------------------- #
# synthesis fidelity after convergence
# --------------------------------------------------------------------- #

def _mel_cepstra(logmel, n_coef=13):
    """DCT-II (orthonormal) of the log-mel frames, coefficients 1..n_coef —
    the standard MCD front-end approximated from the model's own mel
    features (no WORLD/SPTK in the container)."""
    n = logmel.shape[-1]
    k = np.arange(n)
    basis = np.cos(np.pi * (k[:, None] + 0.5) * np.arange(n)[None, :] / n)
    basis *= np.sqrt(2.0 / n)
    basis[:, 0] = np.sqrt(1.0 / n)
    c = logmel @ basis
    return c[..., 1:n_coef + 1]


def _mcd_dtw(mel_a, mel_b):
    """Mel-cepstral distortion (dB) along the DTW path between two log-mel
    sequences [T,80] (natural-log compressed; converted to dB inside)."""
    ln_to_db = 10.0 / np.log(10.0)
    ca = _mel_cepstra(mel_a * ln_to_db)
    cb = _mel_cepstra(mel_b * ln_to_db)
    Ta, Tb = len(ca), len(cb)
    dist = np.sqrt(((ca[:, None, :] - cb[None, :, :]) ** 2).sum(-1))
    acc = np.full((Ta, Tb), np.inf)
    acc[0, 0] = dist[0, 0]
    for i in range(Ta):
        for j in range(Tb):
            if i == j == 0:
                continue
            best = min(acc[i - 1, j] if i else np.inf,
                       acc[i, j - 1] if j else np.inf,
                       acc[i - 1, j - 1] if i and j else np.inf)
            acc[i, j] = dist[i, j] + best
    # path length via backtrack
    i, j, steps = Ta - 1, Tb - 1, 1
    while i or j:
        choices = [(acc[i - 1, j - 1] if i and j else np.inf, i - 1, j - 1),
                   (acc[i - 1, j] if i else np.inf, i - 1, j),
                   (acc[i, j - 1] if j else np.inf, i, j - 1)]
        _, i, j = min(choices)
        steps += 1
    return float(np.sqrt(2.0) * acc[-1, -1] / steps)


def _fidelity(name, setup, state, report, artifacts=True):
    """Copy-synthesis fidelity on the training utterances after the
    plateau: teacher-forced (MAS-duration) postnet mel L1 vs ground truth,
    free-running (predicted-duration) MCD-DTW, committed wav/png artifacts
    (griffin-lim — no pretrained neural vocoder weights ship in this
    container). Counterpart of the reference's converged demo outputs
    (/root/reference/demo/LJSpeech_v0.2.1/900000/). `artifacts=False`
    computes the metrics only (trend points must not clobber the committed
    assets/fidelity/<name>/ of the full plateau run)."""
    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ctts_tpu.audio.tools import inv_mel_spec_batch
    from scipy.io import wavfile

    from ctts_tpu.parallel.train_step import prep_batch

    model, pre = setup["model"], setup["pre"]
    variables = _vars_of(state)
    if artifacts:
        art_dir = os.path.join(_REPO, "assets", "fidelity", name)
        shutil.rmtree(art_dir, ignore_errors=True)
        os.makedirs(art_dir)

    def tf_apply(variables, b):
        # production-config batches ship attn_priors=None
        # (train.on_device_prior) — compute the prior in-graph exactly
        # like the train step does (the round-4 e2e-bench crash class)
        b = prep_batch(b, pre, "train_unsup")
        out, _ = model.apply(
            variables, mutable=["batch_stats"],
            speakers=b["speakers"], texts=b["texts"],
            src_lens=b["src_lens"], mode="train_unsup",
            mels=b["mels"], mel_lens=b["mel_lens"],
            pitch_targets=b["pitch_data"], energy_targets=b["energies"],
            attn_priors=b["attn_priors"],
            step=jnp.asarray(10**9), deterministic=True)
        return out["postnet_mel_predictions"]

    tf_jit = jax.jit(tf_apply)

    def infer_apply(variables, speakers, texts, src_lens, budget):
        out = model.apply(variables, speakers=speakers, texts=texts,
                          src_lens=src_lens, mode="infer",
                          max_mel_len=budget, deterministic=True)
        return (out["postnet_mel_predictions"], out["mel_lens"])

    infer_jit = jax.jit(infer_apply, static_argnames=("budget",))

    rows, tf_l1s, mcds = [], [], []
    for raw in setup["raw_batches"]:
        b = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                 {kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else v)
             for k, v in raw.items() if k not in ("ids", "raw_texts")}
        tf_mel = np.asarray(tf_jit(variables, b), np.float32)
        budget = int(np.ceil(raw["mels"].shape[1] * 1.5 / 128) * 128)
        inf_mel, inf_lens = infer_jit(variables, b["speakers"], b["texts"],
                                      b["src_lens"], budget)
        inf_mel = np.asarray(inf_mel, np.float32)
        inf_lens = np.asarray(inf_lens)
        for i, utt in enumerate(raw["ids"]):
            M = int(raw["mel_lens"][i])
            gt = raw["mels"][i, :M]
            tf_i = tf_mel[i, :M]
            l1 = float(np.abs(tf_i - gt).mean())
            Mi = max(int(inf_lens[i]), 8)
            mcd = _mcd_dtw(inf_mel[i, :Mi], gt)
            tf_l1s.append(l1)
            mcds.append(mcd)
            rows.append((utt, M, l1, Mi, mcd))

            if not artifacts:
                continue
            fig, axes = plt.subplots(3, 1, figsize=(10, 7), sharex=False)
            for ax, m, title in zip(
                    axes, (gt, tf_i, inf_mel[i, :Mi]),
                    ("ground-truth mel",
                     f"teacher-forced (MAS durations), L1={l1:.3f}",
                     f"free-running inference, MCD-DTW={mcd:.2f} dB")):
                ax.imshow(m.T, origin="lower", aspect="auto",
                          interpolation="none")
                ax.set_title(title, fontsize=9)
            fig.tight_layout()
            fig.savefig(os.path.join(art_dir, f"{utt}_mel.png"), dpi=80)
            plt.close(fig)

        # audio artifacts for the first batch: free-running synthesis and
        # the griffin-lim oracle (GT mel through the same inverse) — the
        # oracle bounds what the mel→wav stage can reconstruct
        if artifacts and raw is setup["raw_batches"][0]:
            sr = pre["preprocessing"]["audio"]["sampling_rate"]
            for i, utt in enumerate(raw["ids"][:2]):
                M = int(raw["mel_lens"][i])
                Mi = max(int(inf_lens[i]), 8)
                synth = inv_mel_spec_batch(inf_mel[None, i, :Mi], pre)[0]
                oracle = inv_mel_spec_batch(
                    raw["mels"][None, i, :M].astype(np.float32), pre)[0]
                for tag, wav in (("synth", synth), ("oracle_gtmel", oracle)):
                    pcm = np.clip(wav, -1, 1)
                    pcm = (pcm * 32767).astype(np.int16)
                    wavfile.write(os.path.join(
                        art_dir, f"{utt}_{tag}.wav"), sr, pcm)

    report.append("\n### Synthesis fidelity after the plateau "
                  "(copy-synthesis on the training utterances)\n")
    report.append("| utterance | GT frames | teacher-forced mel L1 | "
                  "inferred frames | MCD-DTW (dB) |")
    report.append("|---|---|---|---|---|")
    for utt, M, l1, Mi, mcd in rows:
        report.append(f"| {utt} | {M} | {l1:.3f} | {Mi} | {mcd:.2f} |")
    tf_mean = float(np.mean(tf_l1s))
    mcd_mean = float(np.mean(mcds))
    report.append(f"| **mean** | | **{tf_mean:.3f}** | | "
                  f"**{mcd_mean:.2f}** |")
    ok = tf_mean < 0.45
    report.append("")
    report.append(
        f"- Teacher-forced postnet mel L1 {tf_mean:.3f} (vs 1.03 at the "
        f"round-3 400-step checkpoint) — the training loop drives the FULL "
        f"model (not just the aligner) to convergence on real speech: "
        f"**{'PASS' if ok else 'FAIL'}**. Free-running MCD-DTW "
        f"{mcd_mean:.2f} dB with durations from the trained duration "
        "head." + (
            " Wav/png artifacts: `assets/fidelity/" + name + "/` "
            "(griffin-lim mel inversion; `*_oracle_gtmel.wav` is the "
            "ground-truth mel through the same inverse — the mel→wav "
            "bound)." if artifacts else ""))
    return ok, tf_mean, mcd_mean


def _write_ckpt_manifest(name, setup, state, steps, hist):
    """Pack the plateau checkpoint to assets/ljdemo_ckpt.npz and record a
    behavioral manifest (fixed probe inputs + expected duration/mel
    statistics FROM THE PACKED WEIGHTS) so tests/test_checkpoint_pack.py
    can detect a stale or wrongly repacked npz (VERDICT-r3 weak #6)."""
    import jax
    import jax.numpy as jnp
    from ctts_tpu.utils.checkpoint import pack_params_npz, load_params_npz

    model = setup["model"]
    npz_path = os.path.join(_REPO, "assets", "ljdemo_ckpt.npz")
    pack_params_npz(jax.device_get(_vars_of(state)), npz_path, steps)

    packed, _ = load_params_npz(npz_path)
    raw = setup["raw_batches"][0]
    texts = np.asarray(raw["texts"], np.int32)
    src_lens = np.asarray(raw["src_lens"], np.int32)
    budget = int(np.ceil(raw["mels"].shape[1] * 1.5 / 128) * 128)

    def probe(variables):
        out = model.apply(
            variables, speakers=jnp.zeros(texts.shape[0], jnp.int32),
            texts=jnp.asarray(texts), src_lens=jnp.asarray(src_lens),
            mode="infer", max_mel_len=budget, deterministic=True)
        return out["postnet_mel_predictions"], out["mel_lens"]

    mel, mel_lens = jax.jit(probe)(
        {"params": packed["params"],
         "batch_stats": packed.get("batch_stats", {})})
    mel = np.asarray(mel, np.float32)
    mel_lens = np.asarray(mel_lens)
    mel_mean = [float(mel[i, :mel_lens[i]].mean())
                for i in range(len(mel_lens))]
    manifest = {
        "step": int(steps),
        "final_losses": {k: round(v, 4) for k, v in zip(
            ("total", "ctc", "bin", "mel"), hist[-1][1:])},
        "probe": {
            "texts": texts.tolist(),
            "src_lens": src_lens.tolist(),
            "budget": budget,
            "expect_mel_lens": mel_lens.tolist(),
            "expect_mel_mean": [round(v, 4) for v in mel_mean],
        },
    }
    man_path = os.path.join(_REPO, "assets", "ljdemo_ckpt_manifest.json")
    with open(man_path, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"packed ckpt -> {npz_path}; manifest -> {man_path}", flush=True)


# --------------------------------------------------------------------- #
# multi-speaker training on real VCTK audio
# --------------------------------------------------------------------- #

def cmd_vctk(report, steps=None):
    """VCTKdemo: run the unsup train loop with the speaker-embedding path
    active on 10 real VCTK speakers; assert per-speaker alignment
    diagonality and falling CTC (VERDICT-r3 missing #3). Counterpart of
    the reference's VCTK recipe (preprocessor/preprocessor.py:259-263,
    model/speaker_embedder.py:11-42 — here the trainable-table path, as
    the DeepSpeaker .h5 is an external download)."""
    import jax

    steps = steps or int(os.environ.get("RSV_VCTK_STEPS", 1000))
    name = "VCTKdemo"
    setup = _train_setup(name, batch_size=4)
    model, batches = setup["model"], setup["batches"]

    def batch_means(state, step):
        vals = [_alignment_metrics(model, _vars_of(state), b, step)
                for b in batches]
        return (float(np.mean([v[0] for v in vals])),
                float(np.mean([v[1] for v in vals])))

    m0_mass, m0_diag = batch_means(setup["state"], 0)

    state, hist, wall, compile_s, stop = _run_training(
        setup, steps, log_every=100)
    m1_mass, m1_diag = batch_means(state, stop)

    # per-speaker rows (one utterance per speaker in this micro-corpus):
    # slice each batch to a single row and reuse the batch metric
    spk_rows = []
    for raw, b in zip(setup["raw_batches"], batches):
        for i, utt in enumerate(raw["ids"]):
            bi = {k: (v[i:i + 1] if isinstance(v, np.ndarray) else
                      {kk: vv[i:i + 1] for kk, vv in v.items()}
                      if isinstance(v, dict) else v)
                  for k, v in b.items()}
            mi, di = _alignment_metrics(model, _vars_of(state), bi, stop)
            spk_rows.append((utt, mi, di))

    report.append("\n## 3. Multi-speaker training on real VCTK audio\n")
    report.append(
        f"Production unsup train step with the speaker-embedding table "
        f"active (multi_speaker=true, 10 real VCTK speakers, 1 utterance "
        f"each) for {stop} steps, batch 4, on "
        f"`{jax.devices()[0].device_kind}` ({wall:.0f}s wall incl. "
        f"{compile_s:.0f}s compile).\n")
    report.append("| step | total | ctc | bin | mel |")
    report.append("|---|---|---|---|---|")
    for s, tot, ctc, bl, mel in hist[:: max(len(hist) // 12, 1)]:
        report.append(f"| {s} | {tot:.3f} | {ctc:.3f} | {bl:.3f} "
                      f"| {mel:.3f} |")
    report.append("")
    report.append("| speaker (utterance) | soft mass on MAS path | "
                  "hard-path diagonality |")
    report.append("|---|---|---|")
    for utt, mi, di in spk_rows:
        report.append(f"| {utt} | {mi:.3f} | {di:.3f} |")
    ctc_drop = hist[0][2] - hist[-1][2]
    min_diag = min(di for _, _, di in spk_rows)
    ok = ctc_drop > 0.5 and m1_mass > m0_mass and min_diag > 0.9
    report.append("")
    report.append(
        f"- CTC fell {ctc_drop:.2f} nats; soft mass {m0_mass:.3f} → "
        f"{m1_mass:.3f}; worst per-speaker diagonality {min_diag:.3f}: "
        f"**{'PASS' if ok else 'FAIL'}** — the speaker-conditioned aligner "
        "locks onto every real VCTK speaker, not just single-speaker "
        "LJSpeech.")
    # persist for regression checks
    ckpt_dir = os.path.join(_OUT, name, "ckpt")
    from ctts_tpu.utils.checkpoint import save_checkpoint
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    save_checkpoint(ckpt_dir, jax.device_get(_vars_of(state)), stop)
    return ok


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what == "train172":
        # standalone append-mode command (never rewrites §1-3)
        sys.exit(0 if cmd_train172() else 1)
    if what == "trend":
        sys.exit(0 if cmd_trend() else 1)
    report = [
        "# Real-speech validation",
        "",
        "Evidence that the preprocessing/f0/alignment stack works on REAL "
        "speech, not only the synthetic corpora used by the test suite. "
        "Source audio: the 18 real speech wavs shipped in "
        "`/root/reference/demo/` (22.05 kHz mono) with their transcripts "
        "from the reference's `preprocessed_data/*/val_unsup.txt`; "
        "reference statistics: the shipped full-corpus `stats.json`. "
        "Generated by `tools/real_speech_validation.py`.",
        "",
        "## 1. Production preprocessing on real speech vs shipped "
        "reference statistics",
    ]
    ok = True
    if what in ("build", "all"):
        ok = cmd_build(report) and ok
    if what in ("train", "all"):
        ok = cmd_train(report) and ok
    if what in ("vctk", "all"):
        ok = cmd_vctk(report) and ok
    with open(_REPORT, "w") as f:
        f.write("\n".join(report) + "\n")
    print(f"report -> {_REPORT}  overall={'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
