"""Fused Pallas LSH chunk attention vs the composed-jnp reference path
(interpreter mode on CPU). The jnp slow path in models/reformer.py is the
oracle (itself pinned against the reference implementation by the ported-
weight parity tests); these tests pin the fused kernel's values and
gradients against it, including ragged padding, both causal modes, and
the wrap-around look-one-back at chunk 0.

Interpret mode is toggled per-test via monkeypatch (not the env var) so
nothing leaks into other test modules' dispatch decisions.
"""

from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ctts_tpu.ops.lsh_chunk_attention as lca
import ctts_tpu.ops.sort_gather as sg
from ctts_tpu.models import reformer


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(lca, "_INTERPRET", True)
    monkeypatch.setattr(sg, "_INTERPRET", True)
    # the kernel is measured-and-rejected (see lca.supported) so the
    # default is off; these parity tests opt back in
    monkeypatch.setenv("CTTS_FUSED_LSH", "1")


def _inputs(B, N, d, lens, seed=0):
    rng = np.random.RandomState(seed)
    qk = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(B, N, d).astype(np.float32))
    valid = jnp.arange(N)[None] < jnp.asarray(lens)[:, None]
    qk = qk * valid[..., None]
    v = v * valid[..., None]
    return qk, v, valid


def _both_paths(qk, v, valid, bucket, n_hashes, causal, grad=False):
    """(fused, slow-jnp) outputs of lsh_attention with identical hash
    rotations; with grad=True returns (d_qk, d_v) pairs instead."""
    key = jax.random.PRNGKey(7)

    def run(x_qk, x_v):
        return reformer.lsh_attention(x_qk, x_v, valid, key,
                                      bucket_size=bucket, n_hashes=n_hashes,
                                      causal=causal)

    def loss(x_qk, x_v):
        out = run(x_qk, x_v)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                     .reshape(out.shape) * 0.01))

    fn = jax.grad(loss, argnums=(0, 1)) if grad else run
    fused = fn(qk, v)
    # slow path: disable both the fused kernel and the sort-gather fast
    # path so the oracle is the pure composed-jnp formulation
    with mock.patch.object(reformer.sort_gather, "supported",
                           lambda *a, **k: False), \
         mock.patch.object(reformer.lsh_chunk_attention, "supported",
                           lambda *a, **k: False):
        slow = fn(qk, v)
    return fused, slow


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("lens", [[256, 256, 256], [256, 130, 64]])
def test_fused_lsh_matches_jnp(interp, causal, lens):
    qk, v, valid = _inputs(3, 256, 32, lens)
    assert lca.supported(256, 64, 32, 2)
    fused, slow = _both_paths(qk, v, valid, 64, 2, causal)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(slow),
                               atol=2e-5, rtol=2e-5)


def test_fused_lsh_grads_match_jnp(interp):
    qk, v, valid = _inputs(2, 256, 32, [256, 100], seed=3)
    (dqk_f, dv_f), (dqk_s, dv_s) = _both_paths(
        qk, v, valid, 64, 2, True, grad=True)
    np.testing.assert_allclose(np.asarray(dqk_f), np.asarray(dqk_s),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(dv_f), np.asarray(dv_s),
                               atol=3e-5, rtol=3e-5)


def test_supported_gates(interp):
    assert lca.supported(256, 64, 32, 2)              # opt-in + valid
    assert not lca.supported(255, 64, 32, 2)          # N % cs
    assert not lca.supported(256, 12, 32, 2)          # cs % 8
    assert not lca.supported(256, 64, 200, 2)         # d too wide


def test_default_off():
    # rejected-by-measurement: must not engage unless CTTS_FUSED_LSH=1
    assert not lca.supported(256, 64, 32, 2)
