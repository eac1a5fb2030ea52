"""Train the prosody models (du2021 GMM-MDN, liu2021 DelightfulTTS) through
the production loop on real speech (VERDICT-r4 missing #2).

Both prosody models are supervised-duration features in the reference
(model.yaml:11 "only supported under supervised duration modeling",
:19 "only tested under supervised"), and this container has no MFA. So the
tool first DISTILLS supervised durations from the round-4 unsup checkpoint:
the trained aligner's MAS output (attn_hard_dur) becomes duration/*.npy +
mel2ph/*.npy in the reference's dual-pipeline store layout — the same store
then serves train_sup.txt. (MAS-as-MFA-replacement is exactly the premise
of "One TTS Alignment To Rule Them All", which the reference implements.)

Then, per prosody mode:
  * plateau-train the full model (train_sup) with the prosody loss gate
    OPEN from step 0 (prosody_loss_enable_steps=0; the reference gates at
    100k, loss.py:316-324) — losses logged, steady ms/step measured,
  * run inference twice with different sample rngs: du2021 must DRAW from
    the MDN (different outputs), liu2021 is deterministic (same outputs),
  * report teacher-forced mel L1 at the plateau.

Appends §4 to REAL_SPEECH_VALIDATION.md.

Usage: python tools/prosody_validation.py [--steps 4000] [--skip_distill]
"""

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_OUT = os.path.join(_REPO, "output", "real_speech")
_STORE = os.path.join(_OUT, "LJdemo", "preprocessed_data")
_REPORT = os.path.join(_REPO, "REAL_SPEECH_VALIDATION.md")

_SUP_LINK_DIRS = [
    ("mel_unsup", "mel_sup"),
    ("pitch_unsup", "pitch_sup"),
    ("f0_unsup", "f0_sup"),
    ("energy_unsup_frame", "energy_sup_frame"),
    ("cwt_spec_unsup", "cwt_spec_sup"),
    ("f0cwt_mean_std_unsup", "f0cwt_mean_std_sup"),
]


def _restore_trained():
    from ctts_tpu.utils.checkpoint import (load_params_npz,
                                           restore_checkpoint_raw)
    ckpt_dir = os.path.join(_OUT, "LJdemo", "ckpt")
    if os.path.isdir(ckpt_dir):
        restored, step = restore_checkpoint_raw(ckpt_dir)
        if restored is not None:
            return restored, step, ckpt_dir
    packed = os.path.join(_REPO, "assets", "ljdemo_ckpt.npz")
    restored, step = load_params_npz(packed)
    if restored is None:
        raise SystemExit("no trained LJdemo checkpoint — run "
                         "`python tools/real_speech_validation.py train`")
    return restored, step, packed


def distill_durations():
    """MAS durations from the trained unsup aligner -> supervised store
    (duration/ + mel2ph/ + *_sup feature hardlinks + train_sup.txt)."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import real_speech_validation as rsv
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import prep_batch

    if not os.path.isfile(os.path.join(_STORE, "train_unsup.txt")):
        raise SystemExit(f"no LJdemo store under {_STORE} — run "
                         "`python tools/real_speech_validation.py build`")

    pre, mod, tr = rsv._configs_for("LJdemo", rsv.CORPORA["LJdemo"])
    mod = prepare_model_config(pre, mod)
    tr["optimizer"]["batch_size"] = 4
    model = CompTransTTS(pre, mod, tr)
    restored, ck_step, src = _restore_trained()
    variables = jax.device_put({"params": restored["params"],
                                "batch_stats": restored.get("batch_stats",
                                                            {}) or {}})
    print(f"distilling MAS durations from {src} (step {ck_step})",
          flush=True)

    @jax.jit
    def hard_dur(speakers, texts, src_lens, mels, mel_lens, pitch_targets,
                 energy_targets, attn_priors):
        out, _ = model.apply(
            variables, mutable=["batch_stats"], speakers=speakers,
            texts=texts, src_lens=src_lens, mode="train_unsup", mels=mels,
            mel_lens=mel_lens, pitch_targets=pitch_targets,
            energy_targets=energy_targets, attn_priors=attn_priors,
            step=jnp.asarray(10**6), deterministic=True)
        return out["attn_outs"][2]                      # [B, T_s]

    os.makedirs(os.path.join(_STORE, "duration"), exist_ok=True)
    os.makedirs(os.path.join(_STORE, "mel2ph"), exist_ok=True)
    n = 0
    for split in ("train_unsup.txt", "val_unsup.txt"):
      ds = Dataset(split, pre, mod, tr, sort=False, drop_last=False)
      for raw in ds.batches(group_size=1, shuffle=False):
        b = prep_batch({k: v for k, v in raw.items()
                        if k not in ("ids", "raw_texts")}, pre,
                       "train_unsup")
        dur = np.asarray(hard_dur(
            jnp.asarray(b["speakers"]), jnp.asarray(b["texts"]),
            jnp.asarray(b["src_lens"]), jnp.asarray(b["mels"]),
            jnp.asarray(b["mel_lens"]),
            {k: jnp.asarray(v) for k, v in b["pitch_data"].items()},
            jnp.asarray(b["energies"]), jnp.asarray(b["attn_priors"])),
            np.int64)
        for i, base in enumerate(raw["ids"]):
            L = int(raw["src_lens"][i])
            M = int(raw["mel_lens"][i])
            d = dur[i, :L]
            assert d.sum() == M, (base, int(d.sum()), M)
            mel2ph = np.repeat(np.arange(1, L + 1), d)
            spk = [s for s, idx in ds.speaker_map.items()
                   if idx == int(raw["speakers"][i])][0]
            np.save(os.path.join(_STORE, "duration",
                                 f"{spk}-duration-{base}.npy"), d)
            np.save(os.path.join(_STORE, "mel2ph",
                                 f"{spk}-mel2ph-{base}.npy"), mel2ph)
            n += 1

    # mirror the unsup stats under sup keys: features are hardlinked, so
    # the normalisation constants are identical by construction
    stats_path = os.path.join(_STORE, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    for k in list(stats):
        if "unsup" in k:
            stats.setdefault(k.replace("unsup", "sup"), stats[k])
    with open(stats_path, "w") as f:
        json.dump(stats, f)

    for src_d, dst_d in _SUP_LINK_DIRS:
        sdir = os.path.join(_STORE, src_d)
        ddir = os.path.join(_STORE, dst_d)
        if not os.path.isdir(sdir):
            continue
        shutil.rmtree(ddir, ignore_errors=True)
        os.makedirs(ddir)
        for fn in os.listdir(sdir):
            os.link(os.path.join(sdir, fn), os.path.join(ddir, fn))
    for split in ("train", "val"):
        shutil.copy(os.path.join(_STORE, f"{split}_unsup.txt"),
                    os.path.join(_STORE, f"{split}_sup.txt"))
    print(f"distilled durations for {n} utterances -> {_STORE}", flush=True)
    return n


# --------------------------------------------------------------------- #


def _sup_setup(prosody):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import real_speech_validation as rsv
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    pre, mod, tr = rsv._configs_for("LJdemo", rsv.CORPORA["LJdemo"])
    mod["duration_modeling"]["learn_alignment"] = False
    mod["prosody_modeling"]["model_type"] = prosody
    # the distilled store links unsup frame energies as energy_sup_frame
    pre["preprocessing"]["energy"]["feature"] = "frame_level"
    tr["optimizer"]["batch_size"] = 4
    tr["step"]["var_start_steps"] = 0
    tr["prosody"]["prosody_loss_enable_steps"] = 0
    mod = prepare_model_config(pre, mod)

    ds = Dataset("train_sup.txt", pre, mod, tr, sort=True, drop_last=False)
    batches = [{k: v for k, v in b.items() if k not in ("ids", "raw_texts")}
               for b in ds.batches(group_size=1, shuffle=False)]
    assert batches, "empty supervised store — run distill first"

    model = CompTransTTS(pre, mod, tr)
    b = batches[0]
    kwargs = dict(
        speakers=jnp.asarray(b["speakers"]), texts=jnp.asarray(b["texts"]),
        src_lens=jnp.asarray(b["src_lens"]), mode="train_sup",
        mels=jnp.asarray(b["mels"]), mel_lens=jnp.asarray(b["mel_lens"]),
        pitch_targets={k: jnp.asarray(v)
                       for k, v in b["pitch_data"].items()},
        energy_targets=jnp.asarray(b["energies"]),
        duration_targets=jnp.asarray(b["durations"]),
        step=jnp.zeros((), jnp.int32), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    tx, _ = build_optimizer(mod, tr)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_sup",
                              donate=False)
    dev_batches = [jax.device_put(x) for x in batches]
    return dict(pre=pre, mod=mod, tr=tr, model=model, state=state,
                step_fn=step_fn, batches=dev_batches, ds=ds)


def _train_prosody(setup, max_steps, log_every=50):
    import jax
    state, step_fn, batches = (setup["state"], setup["step_fn"],
                               setup["batches"])
    hist, mel_log = [], []
    # one key for the run — the jitted step fold_ins state.step internally;
    # per-step PRNGKey(s) creation is an eager dispatch (~160 ms each
    # through the tunnel, see real_speech_validation._run_training)
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
            row = (s, float(metrics["total"]), float(metrics["mel"]),
                   float(metrics["prosody"]))
            hist.append(row)
            mel_log.append(row[2])
            print(f"step {s}: total={row[1]:.3f} mel={row[2]:.3f} "
                  f"prosody={row[3]:.4f}", flush=True)
            k = max(750 // log_every, 2)
            if s >= 1500 and len(mel_log) >= 2 * k:
                prev = float(np.mean(mel_log[-2 * k:-k]))
                last = float(np.mean(mel_log[-k:]))
                if prev - last < 0.02 * prev:
                    print(f"plateau at step {s}", flush=True)
                    s += 1
                    break
        s += 1
    wall = time.time() - t0
    return state, hist, wall, compile_s, s


def _teacher_forced_l1(setup, state):
    import jax
    import jax.numpy as jnp
    model = setup["model"]

    @jax.jit
    def tf_apply(variables, speakers, texts, src_lens, mels, mel_lens,
                 pitch_targets, energy_targets, duration_targets):
        out, _ = model.apply(
            variables, mutable=["batch_stats"], speakers=speakers,
            texts=texts, src_lens=src_lens, mode="train_sup", mels=mels,
            mel_lens=mel_lens, pitch_targets=pitch_targets,
            energy_targets=energy_targets,
            duration_targets=duration_targets,
            step=jnp.asarray(10**6), deterministic=True)
        return out["postnet_mel_predictions"]

    variables = {"params": state.params,
                 "batch_stats": state.batch_stats or {}}
    errs = []
    for b in setup["batches"]:
        pred = np.asarray(tf_apply(
            variables, b["speakers"], b["texts"], b["src_lens"], b["mels"],
            b["mel_lens"], b["pitch_data"], b["energies"], b["durations"]))
        tgt = np.asarray(b["mels"])
        for i in range(pred.shape[0]):
            M = int(np.asarray(b["mel_lens"])[i])
            errs.append(float(np.abs(pred[i, :M] - tgt[i, :M]).mean()))
    return float(np.mean(errs))


def _infer_twice(setup, state, prosody):
    """Run inference with two sample rngs. du2021 must differ (MDN draw);
    liu2021 must not (parallel predictors, no sampling)."""
    import jax
    import jax.numpy as jnp
    model = setup["model"]
    b = setup["batches"][0]
    budget = int(np.asarray(b["mels"]).shape[1])

    @jax.jit
    def infer(variables, speakers, texts, src_lens, rng):
        out = model.apply(
            variables, speakers=speakers, texts=texts, src_lens=src_lens,
            mode="infer", max_mel_len=budget, deterministic=True, rng=rng)
        return out["postnet_mel_predictions"], out["mel_lens"]

    variables = {"params": state.params,
                 "batch_stats": state.batch_stats or {}}
    m1, len1 = infer(variables, b["speakers"], b["texts"], b["src_lens"],
                     jax.random.PRNGKey(1))
    m2, _ = infer(variables, b["speakers"], b["texts"], b["src_lens"],
                  jax.random.PRNGKey(2))
    m1, m2 = np.asarray(m1), np.asarray(m2)
    assert np.isfinite(m1).all(), "non-finite inference mel"
    delta = float(np.abs(m1 - m2).mean())
    if prosody == "du2021":
        assert delta > 1e-4, f"MDN sampling inert (delta {delta})"
    else:
        assert delta < 1e-6, f"liu2021 inference nondeterministic ({delta})"
    return delta, int(np.asarray(len1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--skip_distill", action="store_true")
    args = ap.parse_args()

    if not args.skip_distill:
        distill_durations()

    report = ["\n## 4. Prosody models trained through the loop "
              "(du2021 / liu2021)\n"]
    report.append(
        "Both prosody models are supervised-duration features (reference "
        "model.yaml:11,19); this container has no MFA, so supervised "
        "durations are DISTILLED from the round-4 unsup checkpoint's MAS "
        "alignments (`tools/prosody_validation.py distill` — attn_hard_dur "
        "→ duration/ + mel2ph/ in the reference store layout). Training "
        "runs the production train_sup step with the prosody loss gate "
        "open from step 0 (reference gates at 100k, loss.py:316-324), "
        "batch 4, LJdemo real-speech store.\n")

    results = {}
    for prosody in ("du2021", "liu2021"):
        print(f"\n=== {prosody} ===", flush=True)
        setup = _sup_setup(prosody)
        state, hist, wall, compile_s, steps = _train_prosody(
            setup, args.steps)
        steady_ms = ((wall - (compile_s or 0)) / max(steps - 1, 1)) * 1000
        l1 = _teacher_forced_l1(setup, state)
        delta, inf_len = _infer_twice(setup, state, prosody)
        results[prosody] = dict(steps=steps, steady_ms=steady_ms, l1=l1,
                                sample_delta=delta,
                                prosody_first=hist[0][3],
                                prosody_last=hist[-1][3])

        import jax as _jax
        report.append(f"### {prosody}\n")
        report.append(
            f"Stopped at step {steps} (plateau early-stop, cap "
            f"{args.steps}) on `{_jax.devices()[0].device_kind}`: "
            f"{steady_ms:.1f} ms/step steady-state (batch 4), teacher-"
            f"forced mel L1 **{l1:.3f}** at the plateau.\n")
        report.append("| step | total | mel | prosody |")
        report.append("|---|---|---|---|")
        stride = max(len(hist) // 10, 1)
        shown = hist[::stride]
        if shown[-1] is not hist[-1]:
            shown.append(hist[-1])
        for s, tot, mel, pros in shown:
            report.append(f"| {s} | {tot:.3f} | {mel:.3f} | {pros:.4f} |")
        report.append("")
        if prosody == "du2021":
            report.append(
                f"- GMM-MDN NLL fell {hist[0][3]:.4f} → {hist[-1][3]:.4f} "
                f"(β=0.02-weighted); inference DRAWS from the mixture: two "
                f"sample rngs differ by mean |Δmel| {delta:.4f} over "
                f"{inf_len} predicted frames.")
        else:
            report.append(
                f"- utterance+phoneme prosody L1 fell {hist[0][3]:.4f} → "
                f"{hist[-1][3]:.4f}; inference uses the parallel predictors "
                f"and is deterministic (two rngs: |Δmel| {delta:.1e}).")
        report.append("")

    with open(_REPORT, "a") as f:
        f.write("\n".join(report) + "\n")
    out = {"metric": "prosody_validation",
           **{f"{k}_{m}": round(v[m], 4) if isinstance(v[m], float) else v[m]
              for k, v in results.items()
              for m in ("steps", "steady_ms", "l1", "prosody_last")}}
    with open(os.path.join(_REPO, "PROSODY_VALIDATION.json"), "w") as f:
        json.dump({"results": results}, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
