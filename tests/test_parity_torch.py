"""Output parity vs the reference PyTorch model with ported weights.

Builds the reference CompTransTTS (transformer_fs2) from /root/reference with
random-initialized weights, ports the state_dict through
ctts_tpu.utils.torch_import, and compares forward outputs. This is the
mechanism that makes the published 900k-step checkpoints (README.md:70)
directly servable by the TPU framework.
"""

import copy
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_env():
    import ref_stubs
    ref_stubs.install()
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)        # reference loads ./preprocessed_data/... stats.json
    yield
    os.chdir(cwd)
    sys.path.remove(REF)


def _ref_configs(ref_env_unused=None):
    import yaml
    with open(f"{REF}/config/LJSpeech/preprocess.yaml") as f:
        pre = yaml.safe_load(f)
    with open(f"{REF}/config/LJSpeech/model.yaml") as f:
        mod = yaml.safe_load(f)
    with open(f"{REF}/config/LJSpeech/train.yaml") as f:
        tr = yaml.safe_load(f)
    # supervised + frame pitch/energy: the widest torch-importable slice
    # that avoids the reference's numba/pycwt runtime deps
    mod["duration_modeling"]["learn_alignment"] = False
    pre["preprocessing"]["pitch"]["pitch_type"] = "frame"
    pre["preprocessing"]["energy"]["feature"] = "frame_level"
    pre["path"]["preprocessed_path"] = f"{REF}/preprocessed_data/LJSpeech"
    return pre, mod, tr


def _batch(B=2, T_s=11, T_m=36, seed=0):
    rng = np.random.RandomState(seed)
    src_lens = np.array([T_s, T_s - 3])
    mel_lens = np.array([T_m, T_m - 5])
    texts = np.zeros((B, T_s), np.int64)
    for b, L in enumerate(src_lens):
        texts[b, :L] = rng.randint(1, 300, size=L)
    durations = np.zeros((B, T_s), np.int64)
    for b in range(B):
        L, M = src_lens[b], mel_lens[b]
        d = rng.multinomial(M - L, np.ones(L) / L) + 1
        durations[b, :L] = d
    mel2ph = np.zeros((B, T_m), np.int64)
    for b in range(B):
        m2p = np.repeat(np.arange(1, src_lens[b] + 1), durations[b, :src_lens[b]])
        mel2ph[b, :len(m2p)] = m2p
    mels = rng.randn(B, T_m, 80).astype(np.float32) - 4
    f0 = np.abs(rng.randn(B, T_m).astype(np.float32)) * 0.4 + 7.0
    uv = (rng.rand(B, T_m) < 0.2).astype(np.float32)
    energy = rng.rand(B, T_m).astype(np.float32) * 6 - 1
    for b, L in enumerate(mel_lens):
        mels[b, L:] = 0
        f0[b, L:] = 0
        uv[b, L:] = 0
        energy[b, L:] = 0
    return dict(texts=texts, src_lens=src_lens, mel_lens=mel_lens,
                durations=durations, mel2ph=mel2ph, mels=mels, f0=f0, uv=uv,
                energy=energy)


@pytest.mark.parametrize("block", ["transformer_fs2", "transformer"])
def test_transformer_fs2_output_parity(ref_env, block):
    from model.CompTransTTS import CompTransTTS as RefModel

    pre, mod, tr = _ref_configs()
    mod["block_type"] = block
    torch.manual_seed(0)
    ref = RefModel(pre, mod, tr).eval()

    b = _batch()
    with torch.no_grad():
        pitch_data = {
            "pitch": None,
            "f0": torch.from_numpy(b["f0"]).clone(),
            "uv": torch.from_numpy(b["uv"]).clone(),
            "cwt_spec": None, "f0_mean": None, "f0_std": None,
            "mel2ph": torch.from_numpy(b["mel2ph"]),
        }
        out = ref(
            torch.zeros(2, dtype=torch.long),
            torch.from_numpy(b["texts"]),
            torch.from_numpy(b["src_lens"]), int(b["src_lens"].max()),
            torch.from_numpy(b["mels"]),
            torch.from_numpy(b["mel_lens"]), int(b["mel_lens"].max()),
            pitch_data,
            torch.from_numpy(b["energy"]),
            torch.from_numpy(b["durations"]),
            None, None, 1.0, 1.0, 1.0, 200000)
        ref_mel = out[0].numpy()
        ref_postnet = out[1].numpy()
        ref_pitch = out[2]["pitch_pred"].numpy()
        ref_logd = out[4].numpy()

    # ---- JAX twin with ported weights ----
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.utils.torch_import import import_reference_checkpoint

    mod_j = copy.deepcopy(mod)
    mod_j["compute_dtype"] = "float32"
    mod_j = prepare_model_config(pre, mod_j)
    model = CompTransTTS(pre, mod_j, tr)
    kwargs = dict(
        speakers=jnp.zeros(2, jnp.int32),
        texts=jnp.asarray(b["texts"], jnp.int32),
        src_lens=jnp.asarray(b["src_lens"], jnp.int32),
        mode="train_sup",
        mels=jnp.asarray(b["mels"]),
        mel_lens=jnp.asarray(b["mel_lens"], jnp.int32),
        pitch_targets={"f0": jnp.asarray(b["f0"]),
                       "uv": jnp.asarray(b["uv"]),
                       "mel2ph": jnp.asarray(b["mel2ph"], jnp.int32)},
        energy_targets=jnp.asarray(b["energy"]),
        duration_targets=jnp.asarray(b["durations"], jnp.int32),
        step=jnp.asarray(200000), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    ported = import_reference_checkpoint(ref.state_dict(), pre, mod_j)

    # tree structures must agree
    want = jax.tree_util.tree_structure(variables["params"])
    got = jax.tree_util.tree_structure(ported["params"])
    assert want == got, f"\nwant {want}\ngot {got}"

    out_j, _ = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        mutable=["batch_stats"], **kwargs)

    np.testing.assert_allclose(np.asarray(out_j["log_duration_predictions"]),
                               ref_logd, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["pitch_predictions"]["pitch_pred"]), ref_pitch,
        atol=2e-4)
    mel_mae = np.abs(np.asarray(out_j["mel_predictions"]) - ref_mel).mean()
    post_mae = np.abs(np.asarray(out_j["postnet_mel_predictions"])
                      - ref_postnet).mean()
    assert mel_mae < 1e-3, mel_mae
    assert post_mae < 1e-3, post_mae


def test_flagship_unsup_cwt_parity(ref_env):
    """Flagship config: unsupervised alignment + CWT pitch. Also cross-checks
    the on-device MAS against the reference binarization (pure-python via
    stubbed numba)."""
    from model.CompTransTTS import CompTransTTS as RefModel
    from ctts_tpu.ops.cwt import get_lf0_cwt

    pre, mod, tr = _ref_configs()
    mod["duration_modeling"]["learn_alignment"] = True
    pre["preprocessing"]["pitch"]["pitch_type"] = "cwt"
    scales = get_lf0_cwt(np.ones(10))[1]
    pre["preprocessing"]["pitch"]["cwt_scales"] = scales

    torch.manual_seed(1)
    ref = RefModel(pre, mod, tr).eval()

    b = _batch(seed=3)
    B, T_m, T_s = 2, b["mels"].shape[1], b["texts"].shape[1]
    rng = np.random.RandomState(4)
    attn_prior = rng.rand(B, T_s, T_m).astype(np.float32) + 1e-3
    cwt_spec = rng.randn(B, T_m, 10).astype(np.float32)
    f0_mean = np.array([5.3, 5.4], np.float32)
    f0_std = np.array([0.2, 0.25], np.float32)

    with torch.no_grad():
        pitch_data = {
            "pitch": None,
            "f0": torch.from_numpy(b["f0"]).clone(),
            "uv": torch.from_numpy(b["uv"]).clone(),
            "cwt_spec": torch.from_numpy(cwt_spec).clone(),
            "f0_mean": torch.from_numpy(f0_mean).clone(),
            "f0_std": torch.from_numpy(f0_std).clone(),
            "mel2ph": None,
        }
        out = ref(
            torch.zeros(2, dtype=torch.long),
            torch.from_numpy(b["texts"]),
            torch.from_numpy(b["src_lens"]), int(b["src_lens"].max()),
            torch.from_numpy(b["mels"]),
            torch.from_numpy(b["mel_lens"]), int(b["mel_lens"].max()),
            pitch_data,
            torch.from_numpy(b["energy"]),
            None,
            torch.from_numpy(attn_prior), None, 1.0, 1.0, 1.0, 200000)
        ref_mel = out[0].numpy()
        ref_postnet = out[1].numpy()
        attn_soft_t, attn_hard_t, attn_hard_dur_t, attn_logprob_t = out[10]
        ref_dur = attn_hard_dur_t.numpy()
        ref_soft = attn_soft_t.squeeze(1).numpy()

    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.utils.torch_import import import_reference_checkpoint

    mod_j = copy.deepcopy(mod)
    mod_j["compute_dtype"] = "float32"
    mod_j = prepare_model_config(pre, mod_j)
    model = CompTransTTS(pre, mod_j, tr)
    kwargs = dict(
        speakers=jnp.zeros(2, jnp.int32),
        texts=jnp.asarray(b["texts"], jnp.int32),
        src_lens=jnp.asarray(b["src_lens"], jnp.int32),
        mode="train_unsup",
        mels=jnp.asarray(b["mels"]),
        mel_lens=jnp.asarray(b["mel_lens"], jnp.int32),
        pitch_targets={"f0": jnp.asarray(b["f0"]),
                       "uv": jnp.asarray(b["uv"]),
                       "cwt_spec": jnp.asarray(cwt_spec),
                       "f0_mean": jnp.asarray(f0_mean),
                       "f0_std": jnp.asarray(f0_std)},
        energy_targets=jnp.asarray(b["energy"]),
        duration_targets=None,
        attn_priors=jnp.asarray(attn_prior).transpose(0, 2, 1),
        step=jnp.asarray(200000), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    ported = import_reference_checkpoint(ref.state_dict(), pre, mod_j)
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(ported["params"]))

    out_j, _ = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        mutable=["batch_stats"], **kwargs)

    attn_soft_j, attn_hard_j, attn_hard_dur_j, _ = out_j["attn_outs"]
    np.testing.assert_allclose(np.asarray(attn_soft_j), ref_soft, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(attn_hard_dur_j), ref_dur)
    mel_mae = np.abs(np.asarray(out_j["mel_predictions"]) - ref_mel).mean()
    post_mae = np.abs(np.asarray(out_j["postnet_mel_predictions"])
                      - ref_postnet).mean()
    assert mel_mae < 1e-3, mel_mae
    assert post_mae < 1e-3, post_mae
