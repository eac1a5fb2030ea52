import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctts_tpu.ops.masks import get_mask_from_lengths
from ctts_tpu.ops.length_regulator import (dur_to_mel2ph, length_regulate,
                                           mel2ph_to_dur)
from ctts_tpu.ops.segment import (phoneme_mean_by_mel2ph,
                                  phoneme_mean_by_duration)
from ctts_tpu.ops.pitch import f0_to_coarse, norm_f0, denorm_f0
from ctts_tpu.ops.cwt import (get_lf0_cwt, norm_scale, inverse_cwt, cwt2f0,
                              cwt_mexican_hat)
from ctts_tpu.ops.mas import b_mas, mas_width1_np
from ctts_tpu.ops.forward_sum import forward_sum_loss, bin_loss


def test_mask():
    m = get_mask_from_lengths(jnp.array([2, 4]), 5)
    assert m.tolist() == [[False, False, True, True, True],
                          [False, False, False, False, True]]


def test_dur_to_mel2ph_matches_docstring_example():
    dur = jnp.array([[2, 2, 3]])
    m2p = dur_to_mel2ph(dur, max_len=9)
    assert m2p.tolist() == [[1, 1, 2, 2, 3, 3, 3, 0, 0]]


def test_dur_to_mel2ph_zero_durations():
    dur = jnp.array([[2, 0, 3, 0]])
    m2p = dur_to_mel2ph(dur, max_len=6)
    assert m2p.tolist() == [[1, 1, 3, 3, 3, 0]]


def test_length_regulate_gather():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    dur = jnp.array([[1, 0, 2]])
    out, mel_len, m2p = length_regulate(x, dur, max_len=5)
    assert mel_len.tolist() == [3]
    np.testing.assert_allclose(
        np.asarray(out[0]),
        [[0, 1], [4, 5], [4, 5], [0, 0], [0, 0]])


def test_mel2ph_to_dur_roundtrip():
    rng = np.random.RandomState(0)
    dur = rng.randint(0, 5, size=(4, 13))
    m2p = dur_to_mel2ph(jnp.asarray(dur), max_len=int(dur.sum(1).max()))
    back = mel2ph_to_dur(m2p, 13)
    np.testing.assert_array_equal(np.asarray(back), dur)


def test_phoneme_mean():
    vals = jnp.array([[1.0, 2.0, 3.0, 4.0, 0.0]])
    m2p = jnp.array([[1, 1, 2, 2, 0]])
    ph = phoneme_mean_by_mel2ph(vals, m2p, 3)
    np.testing.assert_allclose(np.asarray(ph[0]), [1.5, 3.5, 0.0])
    ph2 = phoneme_mean_by_duration(vals, jnp.array([[2, 2, 0]]), 3, 5)
    np.testing.assert_allclose(np.asarray(ph2[0]), [1.5, 3.5, 0.0])


def test_f0_to_coarse_range():
    f0 = jnp.array([0.0, 50.0, 100.0, 440.0, 1100.0, 2000.0])
    c = f0_to_coarse(f0)
    assert int(c.min()) >= 1 and int(c.max()) <= 255
    # monotone in voiced region
    assert c[1] < c[2] < c[3] < c[4]


def test_f0_norm_denorm_roundtrip():
    cfg = {"pitch_norm": "log", "pitch_norm_eps": 1e-9, "use_uv": True}
    f0 = jnp.array([[100.0, 200.0, 0.0, 300.0]])
    uv = (f0 == 0).astype(jnp.float32)
    n = norm_f0(f0, uv, cfg)
    d = denorm_f0(n, uv, cfg)
    np.testing.assert_allclose(np.asarray(d), np.asarray(f0), rtol=1e-4)


def test_cwt_forward_matches_brute_force():
    # The FFT path must agree with a direct time-domain CWT away from the
    # circular-padding edges (pycwt uses the same FFT construction, so edge
    # behavior matches the reference's dependency by algorithm).
    rng = np.random.RandomState(1)
    n = 256
    x = np.cumsum(rng.randn(n))
    x -= x.mean()
    W, scales = cwt_mexican_hat(x)
    assert W.shape == (n, 10) and scales.shape == (10,)
    np.testing.assert_allclose(scales, 0.01 * 2.0 ** np.arange(10))
    dt = 0.005
    k = np.arange(n)

    def psi(t):
        return 2 / (np.sqrt(3) * np.pi ** 0.25) * (1 - t ** 2) * np.exp(-t ** 2 / 2)

    for j in [1, 2, 3]:            # scales whose support ≪ signal length
        s = scales[j]
        ref = np.array([np.sum(x * np.sqrt(dt / s) * psi((k - t0) * dt / s))
                        for t0 in range(n)])
        interior = slice(n // 4, 3 * n // 4)
        np.testing.assert_allclose(W[interior, j], ref[interior],
                                   rtol=2e-2, atol=2e-2 * np.abs(ref).max())


def test_cwt_roundtrip_correlation():
    # The reference's inverse is an ad-hoc fixed-weight sum over standardized
    # scales (utils/pitch_tools.py:258-272) — approximate by design. Assert a
    # sane correlation on a broadband f0-like contour.
    rng = np.random.RandomState(0)
    n = 700
    x = np.convolve(np.cumsum(rng.randn(n)) * 3, np.ones(9) / 9, mode="same")
    lf0 = np.log(np.clip(200 + x, 60, 500))
    lf0n = (lf0 - lf0.mean()) / lf0.std()
    W, _ = get_lf0_cwt(lf0n)
    Wn, _, _ = norm_scale(W)
    rec = np.asarray(inverse_cwt(jnp.asarray(Wn)[None], 10))[0]
    corr = np.corrcoef(rec, lf0n)[0, 1]
    assert corr > 0.4, corr


def test_cwt2f0_positive():
    rng = np.random.RandomState(2)
    W = jnp.asarray(rng.randn(2, 50, 10).astype(np.float32))
    f0 = cwt2f0(W, jnp.array([5.0, 5.2]), jnp.array([0.2, 0.3]))
    assert f0.shape == (2, 50)
    assert np.all(np.asarray(f0) > 0)


def test_mas_matches_numpy_reference():
    rng = np.random.RandomState(3)
    B, T_m, T_s = 3, 37, 11
    attn = rng.rand(B, T_m, T_s).astype(np.float32) + 1e-3
    attn /= attn.sum(-1, keepdims=True)
    in_lens = np.array([11, 7, 9])
    out_lens = np.array([37, 25, 30])
    hard = np.asarray(b_mas(jnp.asarray(attn), jnp.asarray(in_lens),
                            jnp.asarray(out_lens)))
    for b in range(B):
        ref = mas_width1_np(attn[b, :out_lens[b], :in_lens[b]])
        np.testing.assert_array_equal(hard[b, :out_lens[b], :in_lens[b]], ref)
        assert hard[b, out_lens[b]:].sum() == 0
        assert hard[b, :, in_lens[b]:].sum() == 0
        # valid path: each mel frame has exactly one phone
        assert (hard[b, :out_lens[b]].sum(-1) == 1).all()


def test_mas_durations_sum_to_mel_len():
    rng = np.random.RandomState(4)
    attn = rng.rand(2, 50, 9).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)
    hard = b_mas(jnp.asarray(attn), jnp.array([9, 5]), jnp.array([50, 33]))
    dur = np.asarray(hard.sum(1))
    assert dur[0].sum() == 50 and dur[1].sum() == 33


def test_forward_sum_loss_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as Ftorch

    rng = np.random.RandomState(5)
    B, T_m, T_s = 3, 20, 7
    attn_logprob = rng.randn(B, T_m, T_s).astype(np.float32)
    in_lens = np.array([7, 5, 6])
    out_lens = np.array([20, 15, 18])

    # torch reference computation (model/loss.py:350-377 semantics)
    alp = torch.from_numpy(attn_logprob)[:, None]
    padded = Ftorch.pad(alp, (1, 0), value=-1.0)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    total = 0.0
    for b in range(B):
        tgt = torch.arange(1, in_lens[b] + 1).unsqueeze(0)
        cur = padded[b].permute(1, 0, 2)[: out_lens[b], :, : in_lens[b] + 1]
        cur = torch.log_softmax(cur[None], dim=3)[0]
        total = total + ctc(cur, tgt,
                            input_lengths=torch.tensor([out_lens[b]]),
                            target_lengths=torch.tensor([in_lens[b]]))
    ref = (total / B).item()

    got = float(forward_sum_loss(jnp.asarray(attn_logprob),
                                 jnp.asarray(in_lens), jnp.asarray(out_lens)))
    assert abs(got - ref) < 1e-3, (got, ref)


def test_ctc_alpha_recursion_matches_optax():
    """The unrolled in-house CTC recursion (values AND grads) equals
    optax.ctc_loss on variable-length batches."""
    import optax
    from ctts_tpu.ops.forward_sum import (_ctc_neg_log_likelihood,
                                          _log_softmax, BLANK_LOGPROB, _NEG)
    rng = np.random.RandomState(11)
    B, T_m, T_s = 4, 67, 13
    attn = jnp.asarray(rng.randn(B, T_m, T_s).astype(np.float32))
    in_lens = jnp.asarray([13, 10, 7, 1], jnp.int32)
    out_lens = jnp.asarray([67, 50, 33, 5], jnp.int32)
    valid = jnp.arange(T_s + 1)[None, None, :] <= in_lens[:, None, None]
    labels = jnp.broadcast_to(jnp.arange(1, T_s + 1)[None, :], (B, T_s))
    lp = (labels > in_lens[:, None]).astype(np.float32)
    op = (jnp.arange(T_m)[None, :] >= out_lens[:, None]).astype(np.float32)

    def prep(a):
        lg = jnp.concatenate([jnp.full((B, T_m, 1), BLANK_LOGPROB), a], -1)
        return _log_softmax(jnp.where(valid, lg, _NEG))

    ref = optax.ctc_loss(prep(attn), op, labels, lp, blank_id=0)
    got = _ctc_neg_log_likelihood(prep(attn), in_lens, out_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    g_ref = jax.grad(lambda a: optax.ctc_loss(
        prep(a), op, labels, lp, blank_id=0).sum())(attn)
    g_got = jax.grad(lambda a: _ctc_neg_log_likelihood(
        prep(a), in_lens, out_lens).sum())(attn)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-4)


def test_bin_loss():
    soft = jnp.array([[[0.9, 0.1], [0.2, 0.8]]])
    hard = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    got = float(bin_loss(hard, soft))
    ref = -(np.log(0.9) + np.log(0.8)) / 2
    assert abs(got - ref) < 1e-4
