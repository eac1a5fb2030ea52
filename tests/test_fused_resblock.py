"""Fused HiFi-GAN resblock kernel vs the XLA reference math (interpret
mode on CPU) — exact parity including sequence-boundary re-padding."""

import os

os.environ["CTTS_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("k", [3, 7, 11])
@pytest.mark.parametrize("C", [32, 128])
def test_fused_matches_reference(k, C):
    from ctts_tpu.ops.fused_resblock import (fused_resblock1,
                                             reference_resblock1)
    rng = np.random.RandomState(0)
    N, T = 2, 256
    x = jnp.asarray(rng.randn(N, T, C).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.randn(3, k, C, C).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(3, k, C, C).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(3, C).astype(np.float32) * 0.05)
    ref = np.asarray(reference_resblock1(x, w1, b1, w2, b2, k))
    got = np.asarray(fused_resblock1(x, w1, b1, w2, b2, k, block_t=128))
    np.testing.assert_allclose(got, ref, atol=2e-5)
