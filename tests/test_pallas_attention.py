"""Pallas fused attention vs the jnp reference (interpreter mode on CPU)."""

import os

os.environ["CTTS_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import jax.numpy as jnp


def test_fused_matches_reference_fwd_and_grad():
    from ctts_tpu.ops.attention import (_reference_attention, _fused,
                                        fused_attention)

    rng = np.random.RandomState(0)
    N, T, d = 4, 256, 128
    q = jnp.asarray(rng.randn(N, T, d).astype(np.float32))
    k = jnp.asarray(rng.randn(N, T, d).astype(np.float32))
    v = jnp.asarray(rng.randn(N, T, d).astype(np.float32))
    lengths = jnp.asarray([256, 200, 128, 7], jnp.int32)
    scale = 1.0 / np.sqrt(d)

    ref = _reference_attention(q, k, v, lengths, scale)
    got = _fused(q, k, v, lengths, scale, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # public wrapper (dispatch) agrees too
    got2 = fused_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), atol=2e-5)

    # gradients flow through the custom VJP and match the reference VJP
    def loss_fused(q_, k_, v_):
        return jnp.sum(_fused(q_, k_, v_, lengths, scale, 128) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(_reference_attention(q_, k_, v_, lengths, scale) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_zero_length_rows_are_safe():
    from ctts_tpu.ops.attention import _fused, _reference_attention
    rng = np.random.RandomState(1)
    N, T, d = 2, 128, 128
    q = jnp.asarray(rng.randn(N, T, d).astype(np.float32))
    k = jnp.asarray(rng.randn(N, T, d).astype(np.float32))
    v = jnp.asarray(rng.randn(N, T, d).astype(np.float32))
    lengths = jnp.asarray([128, 0], jnp.int32)
    out = np.asarray(_fused(q, k, v, lengths, 0.1, 128))
    assert np.all(np.isfinite(out))
