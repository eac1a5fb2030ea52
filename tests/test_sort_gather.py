"""One-hot-matmul gather/scatter kernels vs jnp (interpreter mode on CPU),
and the reformer LSH fast path they serve (reference reformer.py:304-563)."""

import os

os.environ["CTTS_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # the env var above only takes effect if this module is imported
    # before ctts_tpu.ops.* (each op snapshots it at import); under a
    # full-suite run another test file may import them first, so force
    # the flag on the already-imported modules too
    from ctts_tpu.ops import local_window_attention, lsh_chunk_attention, \
        sort_gather
    for m in (sort_gather, local_window_attention, lsh_chunk_attention):
        monkeypatch.setattr(m, "_INTERPRET", True)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("G,N,M,F", [(4, 128, 512, 65), (2, 896, 3584, 33),
                                     (3, 64, 64, 128)])
def test_gather_rows_exact(G, N, M, F, dtype):
    from ctts_tpu.ops import sort_gather
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.randn(G, N, F).astype(np.float32), dtype)
    idx = jnp.asarray(rng.randint(0, N, (G, M)), jnp.int32)
    assert sort_gather.supported(N, M, F)
    got = sort_gather.gather_rows(vals, idx)
    ref = jnp.take_along_axis(vals, idx[..., None], axis=1)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_scatter_rows_permutation_exact():
    from ctts_tpu.ops import sort_gather
    rng = np.random.RandomState(1)
    G, M, F = 3, 512, 48
    vals = jnp.asarray(rng.randn(G, M, F).astype(np.float32))
    perm = jnp.asarray(np.stack([rng.permutation(M) for _ in range(G)]),
                       jnp.int32)
    got = sort_gather.scatter_rows(vals, perm, M)
    ref = jax.vmap(lambda v, i: jnp.zeros((M, F)).at[i].add(v))(vals, perm)
    assert (np.asarray(got) == np.asarray(ref)).all()


def test_scatter_rows_collisions_sum():
    from ctts_tpu.ops import sort_gather
    rng = np.random.RandomState(2)
    G, M, F, n_out = 2, 256, 16, 64
    vals = jnp.asarray(rng.randn(G, M, F).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, n_out, (G, M)), jnp.int32)
    got = sort_gather.scatter_rows(vals, idx, n_out)
    ref = jax.vmap(lambda v, i: jnp.zeros((n_out, F)).at[i].add(v))(vals, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_vjp_roundtrip():
    from ctts_tpu.ops import sort_gather
    rng = np.random.RandomState(3)
    G, N, M, F = 2, 128, 256, 32
    vals = jnp.asarray(rng.randn(G, N, F).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (G, M)), jnp.int32)
    g1 = jax.grad(lambda v: (sort_gather.gather_rows(v, idx) ** 2).sum())(vals)
    g2 = jax.grad(lambda v: (jnp.take_along_axis(
        v, idx[..., None], axis=1) ** 2).sum())(vals)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=3e-5)

    sv = jnp.asarray(rng.randn(G, M, F).astype(np.float32))
    g3 = jax.grad(lambda v: (sort_gather.scatter_rows(v, idx, N) ** 2).sum())(
        sv)
    g4 = jax.grad(lambda v: (jax.vmap(
        lambda vv, i: jnp.zeros((N, F)).at[i].add(vv))(v, idx) ** 2).sum())(sv)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4),
                               rtol=1e-6, atol=3e-5)


def test_lsh_fast_path_matches_fallback():
    """The sort_gather-backed LSH path is bit-identical to the
    take_along_axis path (forward) and grad-equivalent. The fully fused
    chunk-attention kernel is disabled here — it is NOT bit-identical
    (different contraction order) and has its own parity suite
    (tests/test_lsh_pallas.py); this test pins the sort_gather path."""
    from unittest import mock

    from ctts_tpu.ops import sort_gather
    from ctts_tpu.models import reformer as R

    rng = np.random.RandomState(4)
    B, N, d = 4, 256, 32
    qk = jnp.asarray(rng.randn(B, N, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, N, d).astype(np.float32) * 0.3)
    valid = jnp.asarray(rng.rand(B, N) > 0.1)
    key = jax.random.PRNGKey(0)

    with mock.patch.object(R.lsh_chunk_attention, "supported",
                           lambda *a, **k: False):
        fast = R.lsh_attention(qk, v, valid, key)
        gfast = jax.grad(lambda q: (R.lsh_attention(
            q, v, valid, key) ** 2).sum())(qk)
    orig = sort_gather.supported
    sort_gather.supported = lambda *a, **k: False
    try:
        slow = R.lsh_attention(qk, v, valid, key)
        gslow = jax.grad(lambda q: (R.lsh_attention(
            q, v, valid, key) ** 2).sum())(qk)
    finally:
        sort_gather.supported = orig
    assert (np.asarray(fast) == np.asarray(slow)).all()
    np.testing.assert_allclose(np.asarray(gfast), np.asarray(gslow),
                               rtol=1e-6, atol=1e-6)


def test_local_window_attention_matches_fallback():
    """The fused per-batch-row local attention kernel (interpret mode)
    is bit-identical to the jnp windowed path, grads equivalent."""
    from ctts_tpu.ops import local_window_attention as LW
    from ctts_tpu.models import reformer as R

    rng = np.random.RandomState(7)
    B, N, d, win = 3, 384, 128, 128
    qk = jnp.asarray(rng.randn(B, N, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, N, d).astype(np.float32) * 0.3)
    valid = jnp.asarray(rng.rand(B, N) > 0.15)
    assert LW.supported(N, win, d)

    fast = R.local_attention(qk, v, valid, win)
    gfast = jax.grad(lambda q, vv: (R.local_attention(
        q, vv, valid, win) ** 2).sum(), argnums=(0, 1))(qk, v)
    orig = LW.supported
    LW.supported = lambda *a, **k: False
    try:
        slow = R.local_attention(qk, v, valid, win)
        gslow = jax.grad(lambda q, vv: (R.local_attention(
            q, vv, valid, win) ** 2).sum(), argnums=(0, 1))(qk, v)
    finally:
        LW.supported = orig
    assert (np.asarray(fast) == np.asarray(slow)).all()
    for a, b in zip(gfast, gslow):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=5e-4)
