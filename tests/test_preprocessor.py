"""End-to-end preprocessing: tiny synthetic corpus (wav+lab+TextGrid) →
Preprocessor → .npy store → Dataset → one train step."""

import os

import numpy as np
import pytest

from helpers import tiny_configs
from ctts_tpu.preprocessing.audio_io import save_wav


def _speechlike_wav(rng, seconds, sr):
    """Voiced-ish signal: f0-modulated pulse train + noise, amplitude
    modulated so trim/energy/f0 paths all engage."""
    n = int(seconds * sr)
    t = np.arange(n) / sr
    f0 = 150 + 40 * np.sin(2 * np.pi * 1.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = (np.sin(phase) + 0.4 * np.sin(2 * phase)
           + 0.2 * np.sin(3 * phase))
    env = 0.35 + 0.3 * np.sin(2 * np.pi * 0.9 * t) ** 2
    sig = sig * env + rng.randn(n) * 0.005
    # small lead/tail silence for the trim path
    pad = np.zeros(int(0.05 * sr))
    return np.concatenate([pad, sig, pad]).astype(np.float32) * 0.6


def _write_textgrid(path, phones, per_dur, offset=0.05):
    t0 = offset
    parts = []
    for i, (p, d) in enumerate(zip(phones, per_dur)):
        parts.append(
            f"intervals [{i+1}]:\n"
            f"  xmin = {t0:.4f}\n  xmax = {t0+d:.4f}\n  text = \"{p}\"\n")
        t0 += d
    tg = (
        'File type = "ooTextFile"\nObject class = "TextGrid"\n\n'
        f"xmin = 0\nxmax = {t0:.4f}\ntiers? <exists>\nsize = 1\n"
        "item []:\n  item [1]:\n"
        '    class = "IntervalTier"\n    name = "phones"\n'
        f"    xmin = 0\n    xmax = {t0:.4f}\n"
        f"    intervals: size = {len(phones)}\n" + "".join(parts))
    with open(path, "w") as f:
        f.write(tg)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    raw = root / "raw" / "LJSpeech"
    out = root / "preprocessed"
    raw.mkdir(parents=True)
    (out / "TextGrid" / "LJSpeech").mkdir(parents=True)
    rng = np.random.RandomState(0)
    sr = 22050
    texts = ["printing in the only sense",
             "with which we are at present",
             "concerned differs from most",
             "arts and crafts hello world"]
    for i, text in enumerate(texts):
        base = f"LJ{i:03d}"
        wav = _speechlike_wav(rng, 1.2 + 0.3 * i, sr)
        save_wav(str(raw / f"{base}.wav"), wav, sr)
        (raw / f"{base}.lab").write_text(text)
        words = text.split()
        phones = []
        for w in words:
            phones += ["HH", "AH0", "L"][: max(1, len(w) // 3)]
        dur = (len(wav) / sr - 0.12) / len(phones)
        _write_textgrid(str(out / "TextGrid" / "LJSpeech" /
                            f"{base}.TextGrid"),
                        phones, [dur] * len(phones), offset=0.06)
    return str(raw.parent), str(out)   # raw_path contains speaker subdirs


def test_preprocess_and_train(corpus):
    raw, out = corpus
    pre, mod, tr = tiny_configs()
    pre["path"]["raw_path"] = raw
    pre["path"]["preprocessed_path"] = out
    pre["preprocessing"]["val_size"] = 1

    from ctts_tpu.preprocessing.preprocessor import Preprocessor
    train_unsup, val_unsup, train_sup, val_sup = Preprocessor(
        pre, mod, tr).build_from_path()

    assert len(train_unsup) >= 2 and len(val_unsup) == 1
    assert len(train_sup) >= 2
    assert os.path.exists(os.path.join(out, "stats.json"))
    import json
    stats = json.load(open(os.path.join(out, "stats.json")))
    for key in ("f0_unsup", "f0_sup", "energy_unsup_frame",
                "energy_sup_frame", "energy_sup_phone", "max_seq_len"):
        assert key in stats, key
    assert stats["f0_unsup"][0] > 50        # plausible mean f0

    # durations sum equals mel length for sup features
    dur = np.load(os.path.join(out, "duration",
                               "LJSpeech-duration-LJ000.npy"))
    mel = np.load(os.path.join(out, "mel_sup", "LJSpeech-mel-LJ000.npy"))
    assert dur.sum() == mel.shape[0]
    prior = np.load(os.path.join(out, "attn_prior",
                                 "LJSpeech-attn_prior-LJ000.npy"))
    # rows are betabinom pmfs over phones (mass at x=P is dropped by the
    # reference construction, preprocessor.py:551-560)
    sums = prior.sum(-1)
    assert np.all(sums > 0) and np.all(sums <= 1 + 1e-6)
    assert np.median(sums) > 0.9

    # Dataset loads the store and a train step runs
    import jax
    import jax.numpy as jnp
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    tr["optimizer"]["batch_size"] = 2
    mod = prepare_model_config(pre, mod)
    ds = Dataset("train_unsup.txt", pre, mod, tr, bucket_src=8,
                 bucket_mel=16)
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
        attn_priors=jnp.asarray(batch["attn_priors"]),
        step=jnp.zeros((), jnp.int32), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    tx, _ = build_optimizer(mod, tr)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_unsup",
                              donate=False)
    db = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
    state, metrics = step_fn(state, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))


def test_parallel_worker_pool_bit_identical(corpus, tmp_path, monkeypatch):
    """CTTS_PREPROCESS_WORKERS=2 must reproduce the serial build
    bit-for-bit: same stats.json, same splits, same bytes in every .npy
    (the pool preserves task order, so every reduction is identical)."""
    import filecmp
    import json
    import shutil

    raw, out = corpus
    outs = {}
    for name, workers in (("serial", "1"), ("pool", "2")):
        dst = tmp_path / name
        (dst / "TextGrid").mkdir(parents=True)
        shutil.copytree(os.path.join(out, "TextGrid", "LJSpeech"),
                        str(dst / "TextGrid" / "LJSpeech"))
        pre, mod, tr = tiny_configs()
        pre["path"]["raw_path"] = raw
        pre["path"]["preprocessed_path"] = str(dst)
        pre["preprocessing"]["val_size"] = 1
        monkeypatch.setenv("CTTS_PREPROCESS_WORKERS", workers)
        from ctts_tpu.preprocessing.preprocessor import Preprocessor
        Preprocessor(pre, mod, tr).build_from_path()
        outs[name] = dst

    a, b = outs["serial"], outs["pool"]
    assert json.load(open(a / "stats.json")) == json.load(
        open(b / "stats.json"))
    for txt in ("train_unsup.txt", "val_unsup.txt", "train_sup.txt",
                "val_sup.txt", "speakers.json"):
        assert (a / txt).read_text() == (b / txt).read_text(), txt
    npys = sorted(p.relative_to(a) for p in a.rglob("*.npy"))
    assert npys == sorted(p.relative_to(b) for p in b.rglob("*.npy"))
    for rel in npys:
        assert filecmp.cmp(a / rel, b / rel, shallow=False), rel
