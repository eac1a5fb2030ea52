"""On-device beta-binomial prior vs the preprocessor's scipy formulation
(ctts_tpu/ops/attn_prior.py vs preprocessing/preprocessor.py:520-529).

The train step computes the prior from (mel_lens, src_lens) on device
instead of shipping the precomputed [T_m, T_s] array from host; these
tests pin that computation to the stored-prior semantics: same values to
~1e-4 relative (f32 gammaln anchors the recurrence; negligible against a
prior that enters as log(prior + 1e-8) on attention logits), zero outside the (mel_len, src_len) rectangle (the collate
zero-pads), and the exact scaling-factor parameterization.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ctts_tpu.ops.attn_prior import beta_binomial_prior

scipy_stats = pytest.importorskip("scipy.stats")


def _scipy_prior(mel_count, phoneme_count, scaling=1.0):
    # verbatim semantics of Preprocessor.beta_binomial_prior_distribution
    P, M = phoneme_count, mel_count
    x = np.arange(0, P)
    probs = []
    for i in range(1, M + 1):
        a, b = scaling * i, scaling * (M + 1 - i)
        probs.append(scipy_stats.betabinom(P, a, b).pmf(x))
    return np.array(probs)


@pytest.mark.parametrize("scaling", [1.0, 0.05])
def test_matches_scipy_batch(scaling):
    rng = np.random.RandomState(0)
    B, T_m, T_s = 3, 90, 24
    mel_lens = np.array([90, 55, 31], np.int32)
    src_lens = np.array([24, 11, 7], np.int32)
    got = np.asarray(beta_binomial_prior(jnp.asarray(mel_lens),
                                         jnp.asarray(src_lens),
                                         T_m, T_s, scaling=scaling))
    assert got.shape == (B, T_m, T_s)
    for b in range(B):
        want = _scipy_prior(int(mel_lens[b]), int(src_lens[b]), scaling)
        np.testing.assert_allclose(got[b, :mel_lens[b], :src_lens[b]],
                                   want.astype(np.float32), rtol=0,
                                   atol=2e-4)
        # zero padding outside the true rectangle (collate semantics)
        assert got[b, mel_lens[b]:, :].max(initial=0.0) == 0.0
        assert got[b, :, src_lens[b]:].max(initial=0.0) == 0.0
        assert np.isfinite(got[b]).all()


def test_realistic_lengths_no_underflow_nan():
    # LJSpeech-scale rows: long mels, long texts — the regime where a
    # direct gammaln formulation loses ~1e-3 and tails underflow
    mel_lens = np.array([968, 740], np.int32)
    src_lens = np.array([160, 121], np.int32)
    got = np.asarray(beta_binomial_prior(jnp.asarray(mel_lens),
                                         jnp.asarray(src_lens),
                                         1000, 176))
    assert np.isfinite(got).all()
    want = _scipy_prior(968, 160).astype(np.float32)
    # the f32 gammaln anchor's error grows with gammaln magnitude: ~1.4e-3
    # abs at M~1000 (log-prior shift of 0.0015 nats — immaterial)
    np.testing.assert_allclose(got[0, :968, :160], want, rtol=0,
                               atol=2e-3)
    # middle rows sum to ~1 over the stored support k=0..n-1 (the k=n atom
    # they exclude only carries mass for rows near the utterance end,
    # where b -> 1 skews the pmf to k=n — true of the reference's stored
    # prior as well, since it evaluates x=arange(P))
    sums = got[1, :740, :121].sum(axis=-1)
    mid = sums[200:540]
    assert (np.abs(mid - 1.0) < 1e-3).all()


def test_train_step_on_device_prior_matches_shipped():
    """A jitted train step fed attn_priors=None (on_device_prior mode)
    computes the prior in-graph and produces the same losses as one fed
    the host-precomputed prior, to prior-accuracy noise. Also covers the
    transfer_dtype=float16 upcast path of prep_batch."""
    import jax
    from ctts_tpu.utils.testing import tiny_configs, synth_batch
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step, prep_batch)
    from ctts_tpu.utils.optimizer import build_optimizer

    pre, mod, tr = tiny_configs()
    mod = prepare_model_config(pre, mod)
    batch = synth_batch(B=2, T_s=12, T_m=48)
    scaling = (pre["preprocessing"].get("duration", {})
               .get("beta_binomial_scaling_factor", 1.0))
    # replace the random prior with the real beta-binomial so the two
    # paths are comparable
    shipped = beta_binomial_prior(batch["mel_lens"], batch["src_lens"],
                                  48, 12, scaling=scaling)
    batch = dict(batch, attn_priors=shipped)

    model = CompTransTTS(pre, mod, tr)
    kw = prep_batch(batch, pre, "train_unsup")
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        speakers=kw["speakers"], texts=kw["texts"], src_lens=kw["src_lens"],
        mode="train_unsup", mels=kw["mels"], mel_lens=kw["mel_lens"],
        pitch_targets=kw["pitch_data"], energy_targets=kw["energies"],
        attn_priors=kw["attn_priors"], step=jnp.zeros((), jnp.int32),
        deterministic=True)
    tx, _ = build_optimizer(mod, tr)
    step_fn = make_train_step(model, tx, pre, mod, tr, "train_unsup",
                              donate=False)

    state = create_train_state(variables, tx)
    _, m_shipped = step_fn(state, batch, jax.random.PRNGKey(1))

    # on-device: drop the prior, ship f16 floats (train.py's compress)
    b2 = {k: (v.astype(np.float16)
              if getattr(v, "dtype", None) == jnp.float32 else v)
          for k, v in batch.items() if k != "pitch_data"}
    b2["pitch_data"] = {k: (v.astype(np.float16)
                            if getattr(v, "dtype", None) == jnp.float32
                            else v)
                        for k, v in batch["pitch_data"].items()}
    b2["attn_priors"] = None
    state2 = create_train_state(variables, tx)
    _, m_device = step_fn(state2, b2, jax.random.PRNGKey(1))

    for k in ("total", "mel", "ctc"):
        a, b = float(m_shipped[k]), float(m_device[k])
        assert abs(a - b) < 5e-2 * max(1.0, abs(a)), (k, a, b)
