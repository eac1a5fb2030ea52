"""Fused Transformer-XL rel-pos attention vs the jnp reference
(interpreter mode on CPU). Covers the conformer's attention math
(reference model/transformers/conformer.py:347-431)."""

import os

os.environ["CTTS_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _inputs(B, T, H, d, dtype, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3,  # noqa
                                dtype)
    return (mk(B, T, H, d), mk(B, T, H, d), mk(B, T, H, d),
            mk(H, T, d), mk(H, d), mk(H, d))


def _ref(ra, q, k, v, pos, ub, vb, scale):
    return ra.relpos_attention_reference(
        q, k, v, pos[None].transpose(0, 2, 1, 3), ub, vb, scale)


@pytest.mark.parametrize("T,block_q", [(128, None), (256, None), (256, 128),
                                       (384, 128), (256, 64)])
def test_fwd_matches_reference(T, block_q):
    from ctts_tpu.ops import relpos_attention as ra
    B, H, d = 2, 4, 32
    q, k, v, pos, ub, vb = _inputs(B, T, H, d, jnp.float32)
    scale = 1.0 / np.sqrt(H * d)
    got = ra.relpos_attention(q, k, v, pos, ub, vb, scale, block_q=block_q)
    ref = _ref(ra, q, k, v, pos, ub, vb, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_relative_shift_semantics():
    """The kernel's roll-based shift equals the reference pad-reshape-slice
    (incl. the legacy wrap where row q reads row q+1 past the diagonal)."""
    from ctts_tpu.ops import relpos_attention as ra
    B, T, H, d = 1, 128, 2, 16
    q, k, v, pos, ub, vb = _inputs(B, T, H, d, jnp.float32, seed=3)
    # isolate the pos-score path: zero content by zeroing k
    got = ra.relpos_attention(q, jnp.zeros_like(k), v, pos, ub, vb, 1.0)
    ref = _ref(ra, q, jnp.zeros_like(k), v, pos, ub, vb, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 3e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_grads_match_reference(dtype, tol):
    from ctts_tpu.ops import relpos_attention as ra
    B, T, H, d = 2, 256, 4, 32
    args = _inputs(B, T, H, d, dtype)
    scale = 1.0 / np.sqrt(H * d)

    def loss_fused(a):
        return (ra.relpos_attention(*a, scale).astype(jnp.float32) ** 2).sum()

    def loss_ref(a):
        return (_ref(ra, *a, scale).astype(jnp.float32) ** 2).sum()

    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for name, a, b in zip("q k v pos ub vb".split(), gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert rel < tol, f"grad {name}: rel err {rel}"


def test_dropout_deterministic_and_unbiased():
    from ctts_tpu.ops import relpos_attention as ra
    B, T, H, d = 2, 128, 2, 32
    q, k, v, pos, ub, vb = _inputs(B, T, H, d, jnp.float32)
    key = jax.random.PRNGKey(11)
    f = lambda: ra.relpos_attention(q, k, v, pos, ub, vb, 0.1,  # noqa
                                    dropout_p=0.3, dropout_rng=key)
    a, b = f(), f()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a different key gives a different mask
    c = ra.relpos_attention(q, k, v, pos, ub, vb, 0.1, dropout_p=0.3,
                            dropout_rng=jax.random.PRNGKey(12))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6

    # dropout grads are deterministic per seed (fwd/bwd same mask): the
    # custom-vjp backward regenerates identical bits from the same seed
    g1 = jax.grad(lambda q_: (ra.relpos_attention(
        q_, k, v, pos, ub, vb, 0.1, dropout_p=0.3,
        dropout_rng=key) ** 2).sum())(q)
    g2 = jax.grad(lambda q_: (ra.relpos_attention(
        q_, k, v, pos, ub, vb, 0.1, dropout_p=0.3,
        dropout_rng=key) ** 2).sum())(q)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_conformer_block_uses_kernel_in_interpret_mode():
    """ConformerBlock output with the kernel path (interpret) matches the
    einsum fallback path."""
    from ctts_tpu.ops import relpos_attention as ra
    from ctts_tpu.models.conformer import RelativeMultiHeadAttention

    B, T, D, H = 2, 128, 64, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.3)
    # pos_embedding is structurally batch-invariant: _Stack passes the
    # unbroadcast [1, T, D] sinusoid table (a [B, T, D] one is rejected)
    pos = jnp.asarray(rng.randn(1, T, D).astype(np.float32) * 0.3)
    m = RelativeMultiHeadAttention(d_model=D, num_heads=H, dropout=0.1)
    params = m.init(jax.random.PRNGKey(0), x, pos)
    assert ra.supported(T)          # interpret mode forces the kernel path
    out_kernel = m.apply(params, x, pos)

    orig = ra.supported
    ra.supported = lambda *a, **kw: False
    try:
        out_fallback = m.apply(params, x, pos)
    finally:
        ra.supported = orig
    np.testing.assert_allclose(np.asarray(out_kernel),
                               np.asarray(out_fallback), atol=2e-5)


def test_masked_fused_matches_masked_reference():
    """`attend_to_padding: false` path: fused kernel with a key-padding
    mask equals the masked jnp reference, values and grads."""
    from ctts_tpu.ops import relpos_attention as ra
    B, T, H, d = 2, 256, 4, 32
    q, k, v, pos, ub, vb = _inputs(B, T, H, d, jnp.float32, seed=3)
    scale = 1.0 / np.sqrt(H * d)
    lengths = np.array([200, 137])
    mask = jnp.asarray(np.arange(T)[None, :] >= lengths[:, None])

    got = ra.relpos_attention(q, k, v, pos, ub, vb, scale,
                              key_padding_mask=mask)
    ref = _ref_masked(ra, q, k, v, pos, ub, vb, scale, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    g_got = jax.grad(lambda a: (ra.relpos_attention(
        *a, scale, key_padding_mask=mask) ** 2).sum())((q, k, v, pos, ub, vb))
    g_ref = jax.grad(lambda a: (_ref_masked(
        ra, *a, scale, mask) ** 2).sum())((q, k, v, pos, ub, vb))
    for a, b in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def _ref_masked(ra, q, k, v, pos, ub, vb, scale, mask):
    return ra.relpos_attention_reference(
        q, k, v, pos[None].transpose(0, 2, 1, 3), ub, vb, scale,
        key_padding_mask=mask)


def test_masked_ignores_padded_key_content():
    """With the key-padding mask, outputs at valid query rows are exactly
    invariant to the padded positions' content (the defect the reference
    keeps: conformer.py:244-246 never forwards the mask)."""
    from ctts_tpu.ops import relpos_attention as ra
    B, T, H, d = 2, 128, 2, 32
    q, k, v, pos, ub, vb = _inputs(B, T, H, d, jnp.float32, seed=5)
    scale = 1.0 / np.sqrt(H * d)
    L = 90
    mask = jnp.asarray(np.arange(T)[None, :] >= np.array([[L], [L]]))

    out1 = ra.relpos_attention(q, k, v, pos, ub, vb, scale,
                               key_padding_mask=mask)
    bump = jnp.where(mask[..., None, None], 7.0, 0.0)
    out2 = ra.relpos_attention(q + bump, k + bump, v + bump, pos, ub, vb,
                               scale, key_padding_mask=mask)
    np.testing.assert_array_equal(np.asarray(out1[:, :L]),
                                  np.asarray(out2[:, :L]))

    # and WITHOUT the mask, padded content does leak (sanity of the test)
    out3 = ra.relpos_attention(q, k, v, pos, ub, vb, scale)
    out4 = ra.relpos_attention(q + bump, k + bump, v + bump, pos, ub, vb,
                               scale)
    assert np.abs(np.asarray(out3[:, :L]) - np.asarray(out4[:, :L])).max() > 1e-4
