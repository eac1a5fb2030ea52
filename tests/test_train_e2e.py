"""End-to-end smoke: synthetic npy store → Dataset → jitted train steps →
orbax checkpoint roundtrip. Mirrors SURVEY.md §4's test plan."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import tiny_configs


def make_fake_store(root, n_utts=6, sup=False, n_mel=80):
    rng = np.random.RandomState(0)
    tag = "sup" if sup else "unsup"
    dirs = [f"mel_{tag}", f"pitch_{tag}", f"f0_{tag}",
            f"energy_{tag}_frame", "attn_prior", f"cwt_spec_{tag}",
            f"f0cwt_mean_std_{tag}", "duration", "mel2ph",
            f"energy_{tag}_phone"]
    for d in dirs:
        os.makedirs(os.path.join(root, d), exist_ok=True)
    lines = []
    spk = "LJSpeech"
    for i in range(n_utts):
        base = f"utt{i:03d}"
        T_s = int(rng.randint(8, 14))
        T_m = int(rng.randint(30, 60))
        mel = rng.randn(T_m, n_mel).astype(np.float32) * 0.5 - 4
        f0 = np.abs(rng.randn(T_m)).astype(np.float32) * 40 + 150
        f0[rng.rand(T_m) < 0.2] = 0.0
        pitch = np.clip((f0 / 4).astype(np.int64), 1, 255)
        energy = (rng.rand(T_m).astype(np.float32) * 8 - 1)
        prior = rng.rand(T_s, T_m).astype(np.float32) + 1e-3
        cwt = rng.randn(T_m, 10).astype(np.float32)
        np.save(f"{root}/mel_{tag}/{spk}-mel-{base}.npy", mel)
        np.save(f"{root}/pitch_{tag}/{spk}-pitch-{base}.npy", pitch)
        np.save(f"{root}/f0_{tag}/{spk}-f0-{base}.npy", f0)
        np.save(f"{root}/energy_{tag}_frame/{spk}-energy-{base}.npy", energy)
        np.save(f"{root}/attn_prior/{spk}-attn_prior-{base}.npy", prior)
        np.save(f"{root}/cwt_spec_{tag}/{spk}-cwt_spec-{base}.npy", cwt)
        np.save(f"{root}/f0cwt_mean_std_{tag}/{spk}-f0cwt_mean_std-{base}.npy",
                np.array([5.3, 0.2], np.float32))
        if sup:
            dur = rng.multinomial(T_m - T_s, np.ones(T_s) / T_s) + 1
            np.save(f"{root}/duration/{spk}-duration-{base}.npy", dur)
            m2p = np.repeat(np.arange(1, T_s + 1), dur)
            np.save(f"{root}/mel2ph/{spk}-mel2ph-{base}.npy", m2p)
            np.save(f"{root}/energy_{tag}_phone/{spk}-energy-{base}.npy",
                    energy[:T_s])
        words = " ".join("HH AH0 L OW1".split()[: max(2, T_s // 3)])
        text = "{" + " ".join(["HH", "AH0"] * (T_s // 2)
                              + ["L"] * (T_s % 2)) + "}"
        lines.append(f"{base}|{spk}|{text}|hello")
    for split in ("train", "val"):
        with open(f"{root}/{split}_{tag}.txt", "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(f"{root}/speakers.json", "w") as f:
        json.dump({spk: 0}, f)
    with open(f"{root}/stats.json", "w") as f:
        json.dump({
            "f0_unsup": [214.2, 63.4], "f0_sup": [214.3, 64.0],
            "energy_unsup_frame": [-1.17, 9.09, 37.2, 31.7],
            "energy_sup_frame": [-1.15, 9.1, 36.5, 31.8],
            "energy_sup_phone": [-1.43, 8.18, 37.3, 26.0],
            "max_seq_len": 60,
        }, f)


@pytest.mark.parametrize("sup", [False, True])
def test_train_loop_e2e(tmp_path, sup):
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    root = str(tmp_path / "store")
    make_fake_store(root, sup=sup)
    pre, mod, tr = tiny_configs(learn_alignment=not sup,
                                pitch_type="cwt",
                                energy_feature="frame_level")
    pre["path"]["preprocessed_path"] = root
    tr["optimizer"]["batch_size"] = 3
    tr["optimizer"]["warm_up_step"] = 10   # make LR ramp fast for the smoke
    mod = prepare_model_config(pre, mod)
    tag = "unsup" if not sup else "sup"
    mode = f"train_{tag}"

    ds = Dataset(f"train_{tag}.txt", pre, mod, tr, sort=True,
                 bucket_src=8, bucket_mel=16)
    batches = list(ds.batches(shuffle=False))
    assert len(batches) >= 1
    batch = batches[0]
    assert batch["texts"].shape[0] == 3
    assert batch["mels"].shape[1] % 16 == 0

    model = CompTransTTS(pre, mod, tr)
    kwargs = dict(
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]), mode=mode,
        mels=jnp.asarray(batch["mels"]),
        mel_lens=jnp.asarray(batch["mel_lens"]),
        pitch_targets={k: jnp.asarray(v)
                       for k, v in batch["pitch_data"].items()},
        energy_targets=jnp.asarray(batch["energies"]),
        duration_targets=(jnp.asarray(batch["durations"])
                          if batch["durations"] is not None else None),
        attn_priors=(jnp.asarray(batch["attn_priors"])
                     if batch["attn_priors"] is not None else None),
        step=jnp.zeros((), jnp.int32), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    tx, _ = build_optimizer(mod, tr)
    state = create_train_state(variables, tx)
    train_step = make_train_step(model, tx, pre, mod, tr, mode, donate=False)

    device_batch = {k: v for k, v in batch.items()
                    if k not in ("ids", "raw_texts")}
    losses = []
    for i in range(8):
        state, metrics = train_step(state, device_batch,
                                    jax.random.PRNGKey(1))
        losses.append(float(metrics["total"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses  # optimizing something

    # checkpoint roundtrip
    from ctts_tpu.utils.checkpoint import (restore_checkpoint,
                                           save_checkpoint)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, jax.device_get(state), int(state.step))
    fresh = create_train_state(variables, tx)
    restored, step = restore_checkpoint(ckpt_dir, jax.device_get(fresh))
    assert step == int(state.step)
    a = jax.tree.leaves(restored.params)[0]
    b = jax.tree.leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_evaluate_cli_restore_path(tmp_path):
    """The evaluate.py surface end-to-end: train briefly, save a step-keyed
    checkpoint into the configured ckpt_path, then drive get_model(
    restore_step) + evaluate() exactly as evaluate.main() does
    (reference evaluate.py:15-109)."""
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.checkpoint import save_checkpoint
    from ctts_tpu.utils.model import get_model
    from ctts_tpu.utils.optimizer import build_optimizer
    from evaluate import evaluate

    root = str(tmp_path / "store")
    make_fake_store(root, sup=False)
    pre, mod, tr = tiny_configs(pitch_type="cwt",
                                energy_feature="frame_level")
    pre["path"]["preprocessed_path"] = root
    tr["optimizer"]["batch_size"] = 3
    tr["path"]["ckpt_path"] = str(tmp_path / "ckpt")
    mod = prepare_model_config(pre, mod)

    ds = Dataset("train_unsup.txt", pre, mod, tr, sort=True,
                 bucket_src=8, bucket_mel=16)
    batch = next(ds.batches(shuffle=False))
    model = CompTransTTS(pre, mod, tr)
    kwargs = dict(
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]), mode="train_unsup",
        mels=jnp.asarray(batch["mels"]),
        mel_lens=jnp.asarray(batch["mel_lens"]),
        pitch_targets={k: jnp.asarray(v)
                       for k, v in batch["pitch_data"].items()},
        energy_targets=jnp.asarray(batch["energies"]),
        duration_targets=None,
        attn_priors=jnp.asarray(batch["attn_priors"]),
        step=jnp.zeros((), jnp.int32), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    tx, _ = build_optimizer(mod, tr)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_unsup",
                              donate=False)
    device_batch = {k: v for k, v in batch.items()
                    if k not in ("ids", "raw_texts")}
    for _ in range(2):
        state, _ = step_fn(state, device_batch, jax.random.PRNGKey(1))
    save_checkpoint(tr["path"]["ckpt_path"], jax.device_get(state),
                    int(state.step))

    # the evaluate.main() path: restore by step, run the val sweep
    model2, state2, _ = get_model(int(state.step), (pre, mod, tr),
                                  train=True)
    a = np.asarray(jax.tree.leaves(state2.params)[0])
    b = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_allclose(a, b)
    # pass a logger so the full reference figure surface (mel, f0/energy
    # contours, soft/hard/prior attention) builds from real eval outputs
    from ctts_tpu.utils.logging import Logger
    logger = Logger(str(tmp_path / "log"), "val")
    message, means = evaluate(model2, state2, (pre, mod, tr),
                              logger=logger, step=int(state.step))
    logger.close()
    assert "Validation Step" in message
    assert means and all(np.isfinite(v) for v in means.values()), means
