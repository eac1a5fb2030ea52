"""Packed-weights artifact (assets/*.npz) roundtrip: tools/pack_ckpt.py.

The committed bf16 npz is what bench.py falls back to when the orbax
checkpoint under output/ is absent (containers reset between sessions), so
its encode/decode must preserve tree structure, integer leaves bit-exactly,
and float leaves to exact bfloat16 rounding.
"""

import os

import ml_dtypes
import numpy as np

from ctts_tpu.utils.checkpoint import load_params_npz, pack_params_npz


def _tree():
    rng = np.random.RandomState(0)
    return {
        "params": {
            "encoder": {
                "layer_0": {
                    "kernel": rng.randn(37, 53).astype(np.float32),
                    "bias": rng.randn(53).astype(np.float32),
                },
                "table": rng.randn(101, 7).astype(np.float64),
            },
            "steps_seen": np.int64(12345),
            "bins": rng.randint(0, 255, size=(16,)).astype(np.int32),
            "gate": np.array([True, False, True]),
        },
        "batch_stats": {"mean": rng.randn(8).astype(np.float32)},
    }


def test_pack_roundtrip(tmp_path):
    tree = _tree()
    path = os.path.join(tmp_path, "packed.npz")
    pack_params_npz(tree, path, step=400)
    out, step = load_params_npz(path)
    assert step == 400

    def paths(node, prefix=()):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from paths(v, prefix + (k,))
        else:
            yield prefix, node

    got = dict(paths(out))
    want = dict(paths(tree))
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        w = np.asarray(w)
        assert g.shape == w.shape, key
        if w.dtype in (np.float32, np.float64):
            # floats come back as fp32 holding the exact bf16 rounding
            assert g.dtype == np.float32, key
            expect = w.astype(ml_dtypes.bfloat16).astype(np.float32)
            np.testing.assert_array_equal(g, expect, err_msg=str(key))
            # and the rounding is tight: ~8 mantissa bits
            denom = np.maximum(np.abs(w), 1e-6)
            assert float(np.max(np.abs(g - w) / denom)) < 2 ** -8, key
        else:
            assert g.dtype == w.dtype, key
            np.testing.assert_array_equal(g, w, err_msg=str(key))


def test_get_model_loads_packed_ckpt(tmp_path):
    """get_model(packed_ckpt=...) must hand back the packed values (to bf16
    rounding), not a fresh init — the path synthesize.py/serve.py use."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    from helpers import tiny_configs
    from ctts_tpu.utils.model import get_model

    configs = tiny_configs()
    _, variables = get_model(0, configs, train=False)
    # perturb so the packed tree is distinguishable from any fresh init
    params = jax.tree.map(
        lambda a: np.asarray(a) + 1.0 if np.asarray(a).dtype.kind == "f"
        else np.asarray(a), jax.device_get(variables["params"]))
    path = os.path.join(tmp_path, "w.npz")
    pack_params_npz({"params": params,
                     "batch_stats": variables.get("batch_stats") or {}},
                    path, step=7)

    _, loaded = get_model(0, configs, train=False, packed_ckpt=path)
    want_leaves, want_def = jax.tree_util.tree_flatten(params)
    got_leaves, got_def = jax.tree_util.tree_flatten(
        jax.device_get(loaded["params"]))
    assert want_def == got_def
    for w, g in zip(want_leaves, got_leaves):
        w = np.asarray(w)
        if w.dtype.kind == "f":
            expect = w.astype(ml_dtypes.bfloat16).astype(np.float32)
            np.testing.assert_array_equal(np.asarray(g, np.float32), expect)
        else:
            np.testing.assert_array_equal(np.asarray(g), w)


def test_committed_ckpt_matches_manifest():
    """The committed assets/ljdemo_ckpt.npz must reproduce the behavioral
    manifest written by tools/real_speech_validation.py at pack time
    (probe texts -> predicted mel lengths + mel means). A stale or wrongly
    repacked npz shifts the duration distribution and fails here, instead
    of silently changing bench.py's headline workload."""
    import json
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    npz = os.path.join(repo, "assets", "ljdemo_ckpt.npz")
    man_path = os.path.join(repo, "assets", "ljdemo_ckpt_manifest.json")
    if not (os.path.isfile(npz) and os.path.isfile(man_path)):
        pytest.skip("no committed packed ckpt + manifest")
    with open(man_path) as f:
        man = json.load(f)

    from ctts_tpu.config import get_configs_of
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    pre, mod, tr = get_configs_of("LJSpeech")
    mod = prepare_model_config(pre, mod)
    model = CompTransTTS(pre, mod, tr)
    packed, step = load_params_npz(npz)
    assert step == man["step"]

    probe = man["probe"]
    texts = jnp.asarray(np.asarray(probe["texts"], np.int32))
    src_lens = jnp.asarray(np.asarray(probe["src_lens"], np.int32))

    def run(variables):
        out = model.apply(
            variables, speakers=jnp.zeros(texts.shape[0], jnp.int32),
            texts=texts, src_lens=src_lens, mode="infer",
            max_mel_len=probe["budget"], deterministic=True)
        return out["postnet_mel_predictions"], out["mel_lens"]

    variables = {"params": packed["params"],
                 "batch_stats": packed.get("batch_stats", {})}
    mel, mel_lens = jax.jit(run)(variables)
    mel = np.asarray(mel, np.float32)
    mel_lens = np.asarray(mel_lens)

    want_lens = np.asarray(probe["expect_mel_lens"])
    # CPU-vs-TPU duration rounding may flip a frame or two per utterance
    assert np.all(np.abs(mel_lens - want_lens)
                  <= np.maximum(0.05 * want_lens, 3)), (mel_lens, want_lens)
    for i, want_mean in enumerate(probe["expect_mel_mean"]):
        got = float(mel[i, :mel_lens[i]].mean())
        assert abs(got - want_mean) < 0.1, (i, got, want_mean)

    # sensitivity: the gate must actually detect a perturbed pack — nudge
    # one duration-predictor kernel and require the probe to move
    def perturb(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        target = None
        for path, leaf in flat:
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            if "duration" in keys.lower() and np.asarray(leaf).ndim >= 2:
                target = keys
                break
        assert target is not None, "no duration-predictor leaf found"

        def mut(path, leaf):
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            if keys == target:
                return np.asarray(leaf) + 0.5
            return leaf
        return jax.tree_util.tree_map_with_path(mut, tree)

    mel2, mel_lens2 = jax.jit(run)(
        {"params": perturb(packed["params"]),
         "batch_stats": packed.get("batch_stats", {})})
    assert not np.array_equal(np.asarray(mel_lens2), mel_lens), \
        "perturbed duration head left predicted lengths unchanged"


def test_pack_is_compact(tmp_path):
    tree = {"params": {"w": np.zeros((256, 256), np.float32)}}
    path = os.path.join(tmp_path, "packed.npz")
    pack_params_npz(tree, path, step=1)
    # bf16 storage: at most ~half the fp32 byte count even before
    # compression (this all-zeros tree compresses much further)
    assert os.path.getsize(path) < 256 * 256 * 4 / 2 + 4096
