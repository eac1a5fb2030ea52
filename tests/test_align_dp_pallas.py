"""Pallas MAS + ForwardSum-CTC kernels vs the lax.scan references
(interpreter mode on CPU). The scan paths are themselves pinned against
numpy/torch/optax in tests/test_ops.py; these tests pin the Pallas
kernels against the scan paths — values exactly (the arithmetic is
identical), gradients to summation-order tolerance (the Pallas CTC
backward runs the beta recursion instead of autodiff of alpha).

Interpret mode is toggled per-test via monkeypatch (not the env var) so
nothing leaks into other test modules' dispatch decisions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ctts_tpu.ops.forward_sum as fs
import ctts_tpu.ops.mas as mas


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(mas, "_INTERPRET", True)
    monkeypatch.setattr(fs, "_INTERPRET", True)


def _soft_attn(rng, B, T_m, T_s):
    attn = rng.rand(B, T_m, T_s).astype(np.float32) + 1e-3
    return attn / attn.sum(-1, keepdims=True)


@pytest.mark.parametrize("B,T_m,T_s,il,ol", [
    (3, 37, 11, [11, 7, 9], [37, 25, 30]),
    (4, 300, 60, [60, 33, 47, 1], [300, 120, 271, 5]),
    (2, 128, 128, [128, 100], [128, 101]),     # already lane/chunk aligned
])
def test_mas_pallas_matches_scan(interp, B, T_m, T_s, il, ol):
    rng = np.random.RandomState(3)
    attn = jnp.asarray(_soft_attn(rng, B, T_m, T_s))
    in_lens, out_lens = jnp.asarray(il), jnp.asarray(ol)
    h_scan = np.asarray(mas.b_mas_scan(attn, in_lens, out_lens))
    h_pal = np.asarray(mas.b_mas_pallas(attn, in_lens, out_lens))
    np.testing.assert_array_equal(h_pal, h_scan)
    # structural invariants, directly on the kernel output
    for b in range(B):
        assert (h_pal[b, :ol[b]].sum(-1) == 1).all()
        assert h_pal[b, ol[b]:].sum() == 0
        assert h_pal[b, :, il[b]:].sum() == 0


def test_mas_dispatch_uses_pallas_under_interpret(interp):
    rng = np.random.RandomState(5)
    attn = jnp.asarray(_soft_attn(rng, 2, 50, 9))
    il, ol = jnp.array([9, 5]), jnp.array([50, 33])
    got = np.asarray(mas.b_mas(attn, il, ol))
    ref = np.asarray(mas.b_mas_scan(attn, il, ol))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("B,T_m,T_s,il,ol", [
    (4, 67, 13, [13, 10, 7, 1], [67, 50, 33, 5]),
    (3, 300, 60, [60, 41, 2], [300, 177, 9]),
])
def test_ctc_pallas_matches_scan(interp, B, T_m, T_s, il, ol):
    rng = np.random.RandomState(11)
    attn = jnp.asarray(rng.randn(B, T_m, T_s).astype(np.float32))
    in_lens = jnp.asarray(il, jnp.int32)
    out_lens = jnp.asarray(ol, jnp.int32)
    valid = jnp.arange(T_s + 1)[None, None, :] <= in_lens[:, None, None]

    def prep(a):
        lg = jnp.concatenate(
            [jnp.full((B, T_m, 1), fs.BLANK_LOGPROB), a], -1)
        return fs._log_softmax(jnp.where(valid, lg, fs._NEG))

    em = fs._interleave(prep(attn))
    ref = np.asarray(fs._ctc_nll_scan(em, in_lens, out_lens))
    got = np.asarray(fs._ctc_state_nll(em, in_lens, out_lens))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)

    g_ref = jax.grad(lambda a: fs._ctc_nll_scan(
        _em(prep, a), in_lens, out_lens).sum())(attn)
    g_got = jax.grad(lambda a: fs._ctc_state_nll(
        _em(prep, a), in_lens, out_lens).sum())(attn)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=5e-4)


def _em(prep, a):
    return fs._interleave(prep(a))


def test_forward_sum_loss_pallas_matches_scan(interp):
    rng = np.random.RandomState(7)
    B, T_m, T_s = 3, 90, 17
    attn = jnp.asarray(rng.randn(B, T_m, T_s).astype(np.float32))
    il = jnp.asarray([17, 12, 4], jnp.int32)
    ol = jnp.asarray([90, 61, 20], jnp.int32)
    got = float(fs.forward_sum_loss(attn, il, ol))

    # scan value via the non-pallas dispatch
    import unittest.mock as mock
    with mock.patch.object(fs, "pallas_supported", lambda *a, **k: False):
        ref = float(fs.forward_sum_loss(attn, il, ol))
    assert abs(got - ref) < 1e-5, (got, ref)
