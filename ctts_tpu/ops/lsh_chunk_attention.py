"""Fused LSH chunk attention (Pallas, fwd + bwd) for the reformer's hashed
heads (reference model/transformers/reformer.py:304-563).

The sorted-domain middle of LSH attention — gather q/k/v into hash-bucket
order, look-one-back chunked attention, emit per-position outputs and
log-normalizers — is pure data movement plus tiny matmuls, and running it
as composed XLA ops materializes every intermediate in HBM (sorted qk/v,
the look-one-back concats, the [n_chunks, cs, 2cs] logits/probs tensors):
PROFILE.md measured 79% of the reformer step there, with `%reshape`/
`%split`/`%pad_add` fusions and copies alone at ~17 ms/step. This kernel
keeps the whole sorted domain in VMEM: one program per (batch·head,
chunk) builds the chunk's one-hot gather tile in registers, contracts it
with [qk | v] on the MXU (the sort-gather trick from ops/sort_gather.py),
attends with the look-one-back keys, and writes only the [cs, d+1]
result (output ‖ logsumexp) back to HBM. The caller keeps XLA's
3-operand sort (cheap) and the existing one-hot un-sort scatter.

Semantics exactly match models/reformer.py:lsh_attention's chunked core:
queries are the UN-normalized sorted qk, keys are L2-normalized, keys =
[chunk i, chunk i-1] with chunk 0 wrapping to the LAST chunk (the jnp
`_look_one_back` rolls over the whole chunk axis, crossing hash-round
boundaries), the validity mask is applied first, then the causal mask
(bq_t < bkv_t), then the self position is pinned to SELF_ATTN_VAL (the
pin is LAST, so it survives the validity mask — padded rows softmax to
one-hot-on-self, which the round-combine then neutralizes).

The backward recomputes the chunk's gather and probabilities flash-style
(residuals are just the forward's inputs) and scatter-adds dqk/dv through
the transposed one-hot contraction into whole-row f32 accumulators; the
logsumexp output's own cotangent (the round-combine differentiates
through it) enters as the extra `+ dlse * probs` term in ddots.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("CTTS_PALLAS_INTERPRET", "") == "1"
F32 = jnp.float32
NEG = -1e9
SELF_ATTN_VAL = -5e4
_META_F = 8          # meta lanes: [position, validity, 0...]


def supported(N, cs, d, n_hashes, backend=None):
    """Kernel applicability: per-(b·h) qk/v rows resident in VMEM, chunk
    tiles sublane-aligned, the 2·cs one-hot lane tile MXU-sized.

    MEASURED AND REJECTED on TPU v5e at reformer bench shapes
    (B·heads=64, N=896, d=32, 4 hashes; bench_kernels.py 2026-08-19):
    fused 12.7 ms fwd / 28.1 ms fwd+bwd vs the incumbent sort_gather
    fast path at 6.7 / 14.7 ms. The per-chunk one-hot gather re-pays
    O(N·2cs·2d) MXU FLOPs per chunk (the incumbent's single big gather
    amortizes them), and exactness for f32 forces Precision.HIGHEST
    (6-pass) on the gather matmuls. Opt-in via CTTS_FUSED_LSH=1; the
    default stays the sort_gather path."""
    backend = backend or jax.default_backend()
    if os.environ.get("CTTS_FUSED_LSH", "0") != "1":
        return False
    return ((backend not in ("cpu",) or _INTERPRET)
            and N % cs == 0 and cs % 8 == 0 and 16 <= cs <= 256
            and d <= 128 and N % 8 == 0 and (n_hashes * N) % cs == 0
            and N * max(d, 128) * 4 * 3 < 8 * 2 ** 20)


def _lane_tile(row, start, size, M):
    """row [1, M] -> [1, size] starting at dynamic lane `start` (the
    rotate hardware does not reduce shift amounts mod the lane count)."""
    shift = jax.lax.rem(M - start, M)
    return pltpu.roll(row, shift=shift, axis=1)[:, :size]


def _chunk_tiles(st_ref, sv_ref, qk_ref, v_ref, meta_ref, i,
                 *, N, cs, n_chunks):
    """Gather chunk i's sorted-domain tiles: one one-hot MXU contraction
    for [qk | v] (compute dtype) and one for [pos | valid] (f32)."""
    M = n_chunks * cs
    prev = jax.lax.rem(i + n_chunks - 1, n_chunks)
    strow = st_ref[0]                                     # [1, M]
    ids = jnp.concatenate(
        [_lane_tile(strow, i * cs, cs, M),
         _lane_tile(strow, prev * cs, cs, M)], axis=1)    # [1, 2cs]
    svrow = sv_ref[0]
    mkv = jnp.concatenate(
        [_lane_tile(svrow, i * cs, cs, M),
         _lane_tile(svrow, prev * cs, cs, M)], axis=1) > 0  # [1, 2cs]

    sub = jax.lax.broadcasted_iota(jnp.int32, (N, 2 * cs), 0)
    oh = (jnp.broadcast_to(ids, (N, 2 * cs)) == sub).astype(F32)

    vals = jnp.concatenate([qk_ref[0], v_ref[0]], axis=1)  # [N, 2d] cdt
    # TPU DEFAULT matmul precision runs f32 operands through bf16 MXU
    # passes — a one-hot "gather" matmul then ROUNDS the gathered values
    # (bf16 operands are exact, so DEFAULT is fine for them), and rounds
    # the integer-valued position metadata (exact only up to 256), which
    # breaks the qt == kt self-pin for N > 256. HIGHEST restores exact
    # f32; the meta contraction always needs it.
    vprec = (jax.lax.Precision.HIGHEST if vals.dtype == F32
             else jax.lax.Precision.DEFAULT)
    gath = jax.lax.dot_general(
        oh.astype(vals.dtype), vals, (((0,), (0,)), ((), ())),
        preferred_element_type=F32, precision=vprec)       # [2cs, 2d] f32
    gmeta = jax.lax.dot_general(
        oh, meta_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=F32,
        precision=jax.lax.Precision.HIGHEST)               # [2cs, _META_F]
    return ids, mkv, oh, gath, gmeta


def _masked_probs(gath, gmeta, ids, mkv, *, cs, d, causal, scale, cdt):
    """[cs, 2cs] probabilities + logsumexp and the normalized-key
    tensors (shared by fwd and bwd)."""
    q = gath[:cs, :d].astype(cdt)
    k2f = gath[:, :d]                                      # [2cs, d] f32
    v2 = gath[:, d:].astype(cdt)
    r = jax.lax.rsqrt(jnp.sum(k2f * k2f, axis=-1, keepdims=True) + 1e-12)
    kn = (k2f * r).astype(cdt)

    dots = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32) * scale
    qt = gmeta[:cs, 0:1]                                   # [cs, 1] f32
    mq = gmeta[:cs, 1:2] > 0.5
    kt = ids.astype(F32)                                   # [1, 2cs]
    dots = jnp.where(mq & mkv, dots, NEG)
    if causal:
        dots = jnp.where(qt < kt, NEG, dots)
    dots = jnp.where(qt == kt, SELF_ATTN_VAL, dots)

    m = jnp.max(dots, axis=-1, keepdims=True)
    s = jnp.sum(jnp.exp(dots - m), axis=-1, keepdims=True)
    lse = m + jnp.log(s)
    # exp(dots - lse), NOT e/s: at self-dominated rows (all logits are
    # the -5e4 pin) the rounded lse makes these differ by ~0.2%, and the
    # jnp/reference formulation is the one full-model parity pins against
    probs = jnp.exp(dots - lse)
    return q, k2f, v2, r, kn, probs, lse


def _fwd_kernel(st_ref, sv_ref, qk_ref, v_ref, meta_ref, o_ref,
                *, N, cs, d, n_chunks, causal, scale):
    cdt = qk_ref.dtype
    ids, mkv, _, gath, gmeta = _chunk_tiles(
        st_ref, sv_ref, qk_ref, v_ref, meta_ref, pl.program_id(1),
        N=N, cs=cs, n_chunks=n_chunks)
    _, _, v2, _, _, probs, lse = _masked_probs(
        gath, gmeta, ids, mkv, cs=cs, d=d, causal=causal, scale=scale,
        cdt=cdt)
    bo = jax.lax.dot_general(probs.astype(cdt), v2, (((1,), (0,)), ((), ())),
                             preferred_element_type=F32)   # [cs, d]
    o_ref[0] = jnp.concatenate([bo, lse], axis=1)          # [cs, d+1]


def _bwd_kernel(st_ref, sv_ref, qk_ref, v_ref, meta_ref, g_ref, dg_ref,
                *, N, cs, d, n_chunks, causal, scale):
    cdt = qk_ref.dtype
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    ids, mkv, oh, gath, gmeta = _chunk_tiles(
        st_ref, sv_ref, qk_ref, v_ref, meta_ref, i,
        N=N, cs=cs, n_chunks=n_chunks)
    q, k2f, v2, r, kn, probs, _ = _masked_probs(
        gath, gmeta, ids, mkv, cs=cs, d=d, causal=causal, scale=scale,
        cdt=cdt)

    g = g_ref[0]                                           # [cs, d+1] f32
    do = g[:, :d]
    dlse = g[:, d:d + 1]
    probs_c = probs.astype(cdt)

    dP = jax.lax.dot_general(do.astype(cdt), v2, (((1,), (1,)), ((), ())),
                             preferred_element_type=F32)   # [cs, 2cs]
    dS = probs * (dP - jnp.sum(dP * probs, axis=-1, keepdims=True))
    dS = dS + dlse * probs                                 # lse cotangent
    # self positions hold the CONSTANT SELF_ATTN_VAL (and masked ones
    # NEG, where probs underflows to exactly 0): no gradient flows from
    # those logits back into q/k, though dv still does through probs
    dS = jnp.where(gmeta[:cs, 0:1] == ids.astype(F32), 0.0, dS)
    dSc = (dS * scale).astype(cdt)

    dq = jax.lax.dot_general(dSc, kn, (((1,), (0,)), ((), ())),
                             preferred_element_type=F32)   # [cs, d]
    dkn = jax.lax.dot_general(dSc, q, (((0,), (0,)), ((), ())),
                              preferred_element_type=F32)  # [2cs, d]
    # kn = k2 * r(k2):  dk2 = r*dkn - k2 * r^3 * <k2, dkn>
    inner = jnp.sum(k2f * dkn, axis=-1, keepdims=True)
    dk2 = r * dkn - k2f * (r * r * r) * inner              # [2cs, d]
    dv2 = jax.lax.dot_general(probs_c, do.astype(cdt), (((0,), (0,)), ((), ())),
                              preferred_element_type=F32)  # [2cs, d]

    grows = jnp.concatenate(
        [jnp.concatenate([dk2[:cs] + dq, dk2[cs:]], axis=0), dv2], axis=1)
    dg_ref[0] += jax.lax.dot_general(
        oh, grows, (((1,), (0,)), ((), ())),
        preferred_element_type=F32)                        # [N, 2d]


def _specs(B, N, d, M):
    return [
        pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0)),       # st
        pl.BlockSpec((1, 1, M), lambda b, i: (b, 0, 0)),       # svalid
        pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0)),       # qk
        pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0)),       # v
        pl.BlockSpec((1, N, _META_F), lambda b, i: (b, 0, 0)),  # meta
    ]


def _meta(validf, N):
    B = validf.shape[0]
    pos = jnp.broadcast_to(jnp.arange(N, dtype=F32)[None, :, None],
                           (B, N, 1))
    return jnp.concatenate(
        [pos, validf[..., None],
         jnp.zeros((B, N, _META_F - 2), F32)], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(qk, v, st, svalid, validf, cs, causal, scale):
    B, N, d = qk.shape
    M = st.shape[1]
    n_chunks = M // cs
    kern = functools.partial(_fwd_kernel, N=N, cs=cs, d=d,
                             n_chunks=n_chunks, causal=causal, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B, n_chunks),
        in_specs=_specs(B, N, d, M),
        out_specs=pl.BlockSpec((1, cs, d + 1), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, M, d + 1), F32),
        interpret=_INTERPRET,
    )(st[:, None], svalid[:, None], qk, v, _meta(validf, N))


def _fused_fwd(qk, v, st, svalid, validf, cs, causal, scale):
    return (_fused(qk, v, st, svalid, validf, cs, causal, scale),
            (qk, v, st, svalid, validf))


def _fused_bwd(cs, causal, scale, res, g):
    qk, v, st, svalid, validf = res
    B, N, d = qk.shape
    M = st.shape[1]
    n_chunks = M // cs
    kern = functools.partial(_bwd_kernel, N=N, cs=cs, d=d,
                             n_chunks=n_chunks, causal=causal, scale=scale)
    dg = pl.pallas_call(
        kern,
        grid=(B, n_chunks),
        in_specs=_specs(B, N, d, M) + [
            pl.BlockSpec((1, cs, d + 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, N, 2 * d), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, 2 * d), F32),
        interpret=_INTERPRET,
    )(st[:, None], svalid[:, None], qk, v, _meta(validf, N), g)
    return (dg[..., :d].astype(qk.dtype), dg[..., d:].astype(v.dtype),
            np.zeros(st.shape, jax.dtypes.float0),
            np.zeros(svalid.shape, jax.dtypes.float0),
            jnp.zeros_like(validf))


_fused.defvjp(_fused_fwd, _fused_bwd)


def chunk_attention(qk, v, st, svalid, valid, bucket_size, causal, scale):
    """Sorted-domain LSH chunk attention.

    qk, v: [B, N, d]; st: [B, M] int32 sorted source positions (sticker %
    N, M = n_hashes*N); svalid: [B, M] int32 sorted validity; valid:
    [B, N] bool. Returns [B, M, d+1] f32: per sorted position the
    attention output (cols :d) and its logsumexp (col d), ready for the
    un-sort scatter + round combine in models/reformer.py.
    """
    return _fused(qk, v, st.astype(jnp.int32), svalid.astype(jnp.int32),
                  valid.astype(F32), int(bucket_size), bool(causal),
                  float(scale))
