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


def test_pack_is_compact(tmp_path):
    tree = {"params": {"w": np.zeros((256, 256), np.float32)}}
    path = os.path.join(tmp_path, "packed.npz")
    pack_params_npz(tree, path, step=1)
    # bf16 storage: at most ~half the fp32 byte count even before
    # compression (this all-zeros tree compresses much further)
    assert os.path.getsize(path) < 256 * 256 * 4 / 2 + 4096
