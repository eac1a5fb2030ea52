"""Device-resident dataset cache (ctts_tpu/data/device_cache.py):
index_batches must replay Dataset.batches()'s composition exactly, and
gather_batch must reproduce collate()'s padded arrays bit-for-bit, so the
cached train loop is the SAME training run as the streaming loader —
just without the per-step host->device batch transfer."""

import numpy as np
import jax
import jax.numpy as jnp

from helpers import tiny_configs
from test_train_e2e import make_fake_store

from ctts_tpu.data.dataset import Dataset
from ctts_tpu.data.device_cache import DeviceCache, gather_batch


def _setup(tmp_path, transfer_dtype="float16", n_utts=10):
    pre, mod, tr = tiny_configs(learn_alignment=True, pitch_type="cwt",
                                energy_feature="frame_level")
    root = str(tmp_path / "store")
    make_fake_store(root, sup=False, n_utts=n_utts)
    pre["path"]["preprocessed_path"] = root
    tr["optimizer"]["batch_size"] = 3
    tr["on_device_prior"] = True
    tr["transfer_dtype"] = transfer_dtype
    from ctts_tpu.models.comp_trans_tts import prepare_model_config
    mod = prepare_model_config(pre, mod)
    ds = Dataset("train_unsup.txt", pre, mod, tr, sort=True, drop_last=True,
                 bucket_src=8, bucket_mel=16)
    return pre, mod, tr, ds


def test_gathered_batches_match_streaming_loader(tmp_path):
    pre, mod, tr, ds = _setup(tmp_path)
    dc = DeviceCache(ds, transfer_dtype="float16")
    dc.put()

    kw = dict(group_size=2, shuffle=True, seed=tr["seed"], epoch=3)
    stream = list(ds.batches(**kw))
    cached = list(dc.index_batches(**kw))
    assert len(stream) == len(cached) > 0

    for want, (idx, T_s, T_m) in zip(stream, cached):
        got = jax.tree.map(np.asarray,
                           gather_batch(dc.arrays, jnp.asarray(idx),
                                        T_s, T_m, energy_on_src=False))
        assert got["texts"].shape == want["texts"].shape
        np.testing.assert_array_equal(got["texts"], want["texts"])
        np.testing.assert_array_equal(got["src_lens"], want["src_lens"])
        np.testing.assert_array_equal(got["mel_lens"], want["mel_lens"])
        np.testing.assert_array_equal(got["speakers"], want["speakers"])
        # float fields: the cache stores the f16 transfer dtype — identical
        # to what train.py's _compress_f16 would have shipped
        np.testing.assert_array_equal(
            got["mels"], want["mels"].astype(np.float16))
        np.testing.assert_array_equal(
            got["energies"], want["energies"].astype(np.float16))
        for k in ("pitch", "f0", "uv", "cwt_spec", "f0_mean", "f0_std"):
            w = want["pitch_data"][k]
            if w.dtype == np.float32:
                w = w.astype(np.float16)
            np.testing.assert_array_equal(got["pitch_data"][k], w)
        assert got["attn_priors"] is None and got["durations"] is None


def test_cached_step_matches_streaming_step(tmp_path):
    from ctts_tpu.models.comp_trans_tts import CompTransTTS
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step,
                                              make_cached_train_step,
                                              prep_batch)
    from ctts_tpu.utils.optimizer import build_optimizer

    pre, mod, tr, ds = _setup(tmp_path, transfer_dtype="float32")
    dc = DeviceCache(ds, transfer_dtype="float32")
    dc.put()

    batch = next(ds.batches(shuffle=False))
    first = prep_batch({k: v for k, v in batch.items()
                        if k not in ("ids", "raw_texts")}, pre,
                       "train_unsup")
    model = CompTransTTS(pre, mod, tr)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        speakers=first["speakers"], texts=first["texts"],
        src_lens=first["src_lens"], mode="train_unsup",
        mels=first["mels"], mel_lens=first["mel_lens"],
        pitch_targets=first["pitch_data"], energy_targets=first["energies"],
        attn_priors=first["attn_priors"], step=jnp.zeros((), jnp.int32),
        deterministic=True)
    tx, _ = build_optimizer(mod, tr)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_unsup",
                              donate=False)
    cached_fn = make_cached_train_step(model, tx, pre, mod, tr,
                                       "train_unsup", energy_on_src=False,
                                       donate=False)

    state = create_train_state(variables, tx)
    db = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
    _, m_stream = step_fn(state, db, jax.random.PRNGKey(1))

    idx, T_s, T_m = next(dc.index_batches(shuffle=False))
    state2 = create_train_state(variables, tx)
    _, m_cached = cached_fn(state2, dc.arrays, jnp.asarray(idx),
                            jax.random.PRNGKey(1), T_s, T_m)

    for k in ("total", "mel", "ctc", "grad_norm"):
        a, b = float(m_stream[k]), float(m_cached[k])
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (k, a, b)


def test_cached_step_under_mesh(tmp_path):
    """The cached step compiles and runs under a dp mesh: the gather's
    output is sharding-constrained onto the 'data' axis in-graph."""
    from ctts_tpu.models.comp_trans_tts import CompTransTTS
    from ctts_tpu.parallel.mesh import make_mesh, shard_params
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_cached_train_step,
                                              prep_batch)
    from ctts_tpu.utils.optimizer import build_optimizer

    pre, mod, tr, ds = _setup(tmp_path)
    tr["optimizer"]["batch_size"] = 4
    ds = Dataset("train_unsup.txt", pre, mod, tr, sort=True, drop_last=True,
                 bucket_src=8, bucket_mel=16)
    dc = DeviceCache(ds, transfer_dtype="float16")
    # explicit 4-device subset: the suite runs with 8 virtual devices, and
    # make_mesh(4, 1) over all of them trips the data*model == n assert
    mesh = make_mesh(4, 1, devices=jax.devices()[:4])
    with mesh:
        dc.put()
        batch = next(ds.batches(shuffle=False))
        first = prep_batch({k: v for k, v in batch.items()
                            if k not in ("ids", "raw_texts")}, pre,
                           "train_unsup")
        model = CompTransTTS(pre, mod, tr)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            speakers=first["speakers"], texts=first["texts"],
            src_lens=first["src_lens"], mode="train_unsup",
            mels=first["mels"], mel_lens=first["mel_lens"],
            pitch_targets=first["pitch_data"],
            energy_targets=first["energies"],
            attn_priors=first["attn_priors"], step=jnp.zeros((), jnp.int32),
            deterministic=True)
        variables = shard_params(variables, mesh)
        tx, _ = build_optimizer(mod, tr)
        state = create_train_state(variables, tx)
        cached_fn = make_cached_train_step(model, tx, pre, mod, tr,
                                           "train_unsup",
                                           energy_on_src=False, mesh=mesh,
                                           donate=False)
        idx, T_s, T_m = next(dc.index_batches(shuffle=False))
        state, metrics = cached_fn(state, dc.arrays, jnp.asarray(idx),
                                   jax.random.PRNGKey(1), T_s, T_m)
        assert np.isfinite(float(metrics["total"]))
