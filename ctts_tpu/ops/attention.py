"""Fused padding-masked attention (Pallas, flash-style) for the FFT blocks.

The transformer stacks attend over ≤ ~1.5k frames with head_dim 128 — small
enough that K/V for one (batch, head) fit VMEM whole. The kernel therefore
tiles only the query axis: each program loads a [BLOCK_Q, d] query block and
the full [T, d] K/V, computes the masked softmax in VMEM, and writes the
context block — the [T, T] probability matrix never touches HBM (XLA's
unfused path materializes it: ~128 MB per fs2 decoder layer at B16/T1024).

Backward is recompute-based: a custom VJP re-runs plain-XLA attention under
the hood, so training gets the fused forward + flash-style memory behavior
without a handwritten bwd kernel.

Falls back to the jnp reference implementation on CPU or odd shapes.
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9

# force the kernel through the Pallas interpreter (CPU testing)
_INTERPRET = os.environ.get("CTTS_PALLAS_INTERPRET", "") == "1"


def _reference_attention(q, k, v, lengths, scale):
    """[N, T, d] q/k/v with per-row valid lengths → [N, T, d]."""
    logits = jnp.einsum("nqd,nkd->nqk", q * scale, k)
    mask = jnp.arange(k.shape[1])[None, None, :] < lengths[:, None, None]
    logits = jnp.where(mask, logits, NEG)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("nqk,nkd->nqd", probs.astype(q.dtype), v)


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    n = pl.program_id(0)
    valid_len = len_ref[n]
    q = q_ref[0].astype(jnp.float32) * scale            # [BQ, d]
    k = k_ref[0].astype(jnp.float32)                    # [T, d]
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [BQ, T]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < valid_len, logits, NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(q, k, v, lengths, scale, block_q):
    N, T, d = q.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, T // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda n, i, *_: (n, i, 0)),
                pl.BlockSpec((1, T, d), lambda n, i, *_: (n, 0, 0)),
                pl.BlockSpec((1, T, d), lambda n, i, *_: (n, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda n, i, *_: (n, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_INTERPRET,
    )(lengths.astype(jnp.int32), q, k, v)


def _fused_fwd(q, k, v, lengths, scale, block_q):
    return _fused(q, k, v, lengths, scale, block_q), (q, k, v, lengths)


def _fused_bwd(scale, block_q, res, g):
    q, k, v, lengths = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, lengths, scale),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(q, k, v, lengths, scale=None, block_q=256):
    """Padding-masked softmax attention, fused on TPU.

    q/k/v: [N, T, d] (N = batch·heads); lengths: [N] valid key counts.
    Uses the Pallas kernel when the backend is TPU and shapes tile cleanly;
    otherwise the jnp reference path (identical math).
    """
    N, T, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    ok = ((jax.default_backend() not in ("cpu",) or _INTERPRET)
          and d in (64, 128, 256)
          and T % 128 == 0)
    if not ok:
        return _reference_attention(q, k, v, lengths, scale)
    bq = min(block_q, T)
    while T % bq:
        bq //= 2
    return _fused(q, k, v, lengths, scale, bq)
