"""Fused Transformer-XL relative-position attention (Pallas, fwd + bwd).

The conformer blocks (ctts_tpu/models/conformer.py, reference
conformer.py:347-431) score attention as

    S = ((Q+u)·Kᵀ + shift((Q+v)·Pᵀ)) / sqrt(d_model)
    ctx = dropout(softmax(S)) · V

XLA materializes five-plus [B, H, T, T] tensors per layer for this
(content, pos, the shift's concat copy, fp32 probabilities, the dropout
mask) in forward AND backward — measured 13.97 ms/layer at B16/H8/T896,
63% of the whole conformer train step, 8% MFU. These kernels keep every
[T, T]-shaped intermediate in VMEM: one query-tile loop, full K/V/pos per
(batch·head) program (T·Dh is tiny), softmax + dropout + both matmuls
fused, and a recompute-based backward that never writes probabilities to
HBM either. Dropout uses the in-kernel PRNG seeded per (program, tile) so
forward and backward regenerate the identical mask.

The relative shift (reference _relative_shift: pad-reshape-slice) is
reproduced EXACTLY — including its legacy wrap semantics where row q takes
right-of-diagonal entries from row q+1:

    rel[q, k] = qv[q,   T-1-q+k]   for k <= q        (left, distances)
    rel[q, q+1] = 0                                  (the injected zero)
    rel[q, k] = qv[q+1, k-q-2]     for k >  q+1      (legacy wrap)

Mosaic has no take_along_axis on lanes, so the per-row shift is done
gather-free with a SINGLE strided `tpu.dynamic_rotate`: `pltpu.roll`
rotates row r by `shift + r*stride`, and the shift amounts here are affine
in the row index. Forward: row q left-rolls W = [qv_row | 0 | qv_next_row]
by (T-1-q); with the layout statically pre-rotated to
[0 | qv_next | pad | qv_a] this is one right-roll by (q0+1) + r (stride
+1, amounts in [1, T] — hardware does NOT reduce amounts mod the lane
count, so staying in range matters). The backward scatter is the inverse
roll, whose amounts DESCEND in r — inexpressible with the non-negative
stride — so the rows of dS are first flipped (one [bq, bq] permutation
matmul, exact via a bf16 hi+lo split), rolled with ascending amounts
(T-bq-q0) + r, and the few small [bq, d] tensors that interact with them
are flipped/unflipped by tiny permutation matmuls. A 10-step log2
roll+select ladder per pass (the obvious alternative) measures 0.43 ms/
step/pass at B16/H8/T896 — 8 of the 13.5 ms went to the ladders.
"""

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("CTTS_PALLAS_INTERPRET", "") == "1"

F32 = jnp.float32


# --------------------------------------------------------------------- #
# reference (jnp) implementation — fallback path and test oracle
# --------------------------------------------------------------------- #

def relative_shift(pos_score):
    """The reference's pad-reshape-slice shift (conformer.py:407-415)."""
    B, H, T1, T2 = pos_score.shape
    zeros = jnp.zeros((B, H, T1, 1), pos_score.dtype)
    padded = jnp.concatenate([zeros, pos_score], axis=-1)
    padded = padded.reshape(B, H, T2 + 1, T1)
    return padded[:, :, 1:].reshape(B, H, T1, T2)


def relpos_attention_reference(q, k, v, pos_p, u_bias, v_bias, scale,
                               dropout_p=0.0, dropout_rng=None,
                               key_padding_mask=None):
    """q/k/v: [B, T, H, Dh]; pos_p: [B or 1, T, H, Dh]; biases [H, Dh].
    Mirrors RelativeMultiHeadAttention's math; returns ctx [B, T, H, Dh].
    key_padding_mask: optional [B, T] bool, True AT PADDING — masked keys
    get -1e9 before the softmax (the reference never wires this up,
    conformer.py:244-246; the conformer's `attend_to_padding: false` mode
    uses it)."""
    content = jnp.einsum("bqhd,bkhd->bhqk",
                         q + u_bias[None, None].astype(q.dtype), k)
    pos_score = jnp.einsum("bqhd,bkhd->bhqk",
                           q + v_bias[None, None].astype(q.dtype),
                           jnp.broadcast_to(pos_p, q.shape))
    pos_score = relative_shift(pos_score)
    score = (content + pos_score) * scale
    if key_padding_mask is not None:
        score = jnp.where(key_padding_mask[:, None, None, :], -1e9, score)
    probs = jax.nn.softmax(score.astype(F32), axis=-1)
    if dropout_p > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_p), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


# --------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------- #

def _wpad(T):
    return ((2 * T + 1) + 127) // 128 * 128


def _flip_mat(n, dtype):
    """[n, n] row-reversal permutation built from iotas."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (c == (n - 1) - r).astype(dtype)


def _flip_rows(x):
    """Reverse the row (sublane) order of x [R, C] exactly; returns f32.

    Mosaic has no lax.rev; a permutation matmul uses the MXU instead.
    Low-precision inputs flip exactly with a single matmul (one-hot rows
    reproduce each operand value bit-for-bit in the f32 accumulator); f32
    inputs use a bf16 hi+lo split, exact to ~2^-18 relative.
    """
    R = x.shape[0]
    if x.dtype == F32:
        P = _flip_mat(R, jnp.bfloat16)
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(F32)).astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(               # noqa
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=F32)
        return dot(P, hi) + dot(P, lo)
    P = _flip_mat(R, x.dtype)
    return jax.lax.dot_general(P, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _build_rel(qv_op, qv1_op, pos, T, q0, block_q):
    """rel [BQ, T] for global query rows q0..q0+BQ-1 (f32, in VMEM).

    qv_op/qv1_op are the already-biased (Q+v)/(Q_next+v) tiles in the
    compute dtype; matmuls run at the MXU's native rate for that dtype
    with f32 accumulation (f32 operands would cost a multi-pass matmul).
    """
    qv_a = jax.lax.dot_general(qv_op, pos, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32)    # [BQ, T]
    qv_n = jax.lax.dot_general(qv1_op, pos, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32)
    WPAD = _wpad(T)
    # Target: row r (global q = q0+r) reads rel[r, k] = W[a + k] with
    # a = T-1-q from the logical layout W = [qv_a | 0 | qv_n | pad].
    # Build it statically pre-rotated left by T —
    # W2 = [0 | qv_n | pad | qv_a] — so the per-row left-roll by a
    # becomes ONE strided right-roll by (T - a) = (q0+1) + r: amounts
    # ascend with r (stride +1) and stay in [1, T] ⊂ [0, WPAD) (the
    # hardware rotate does not reduce mod the lane count). Reads never
    # wrap: a + k <= 2T-2 < WPAD.
    W2 = jnp.concatenate(
        [jnp.zeros((block_q, 1), F32), qv_n,
         jnp.zeros((block_q, WPAD - 2 * T - 1), F32), qv_a], axis=1)
    W2 = pltpu.roll(W2, shift=q0 + 1, axis=1, stride=1, stride_axis=0)
    return W2[:, :T]


def _fwd_kernel(seed_ref, qp_ref, k_ref, v_ref, pos_ref, ub_ref, vb_ref,
                kmask_ref, o_ref, *, scale, p_drop, block_q, T, masked):
    n, i = pl.program_id(0), pl.program_id(1)
    q0 = i * block_q
    cdt = qp_ref.dtype
    # ref-level dynamic slice (value-level dynamic_slice has no Mosaic
    # lowering); read BQ+8 rows aligned, take the two offsets statically
    qtx = qp_ref[0, pl.ds(q0, block_q + 8)]
    qt = qtx[:block_q]
    qt1 = qtx[1:block_q + 1]
    k = k_ref[0]
    v = v_ref[0]
    pos = pos_ref[0]
    H = ub_ref.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
              == n % H).astype(F32)
    ub = jax.lax.dot_general(onehot, ub_ref[...].astype(F32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=F32)       # [1, d]
    vb = jax.lax.dot_general(onehot, vb_ref[...].astype(F32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=F32)
    # bias in f32, then back to the compute dtype: matmul operands stay
    # cdt (MXU native rate), accumulation stays f32 — same numerics as
    # the XLA reference path, which adds the bias in bf16 too
    qu = (qt.astype(F32) + ub).astype(cdt)
    qv = (qt.astype(F32) + vb).astype(cdt)
    qv1 = (qt1.astype(F32) + vb).astype(cdt)

    content = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=F32)   # [BQ, T]
    rel = _build_rel(qv, qv1, pos, T, q0, block_q)
    s = (content + rel) * scale
    if masked:
        s = jnp.where(kmask_ref[0] > 0, s, -1e9)    # [1, T] key validity
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    if p_drop > 0.0:
        # prng_seed takes at most 2 words: fold the program coords in
        # injectively (n·n_tiles + i) so every tile draws a distinct stream
        pltpu.prng_seed(seed_ref[0] + n * (T // block_q) + i, seed_ref[1])
        bits = pltpu.bitcast(pltpu.prng_random_bits((block_q, T)),
                             jnp.uint32)
        thresh = jnp.uint32(min(int(p_drop * 4294967296.0), 4294967295))
        probs = jnp.where(bits >= thresh, probs / (1.0 - p_drop), 0.0)
    o_ref[0] = jax.lax.dot_general(probs.astype(cdt), v,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=F32
                                   ).astype(o_ref.dtype)


# --------------------------------------------------------------------- #
# backward kernel (recompute; same dropout bits from the same seed)
# --------------------------------------------------------------------- #

def _bwd_kernel(seed_ref, qp_ref, k_ref, v_ref, pos_ref, ub_ref, vb_ref,
                kmask_ref, g_ref, dq_ref, dk_ref, dv_ref, dpos_ref,
                dub_ref, dvb_ref, halo_ref, *, scale, p_drop, block_q, T,
                masked):
    n, i = pl.program_id(0), pl.program_id(1)
    q0 = i * block_q
    cdt = qp_ref.dtype
    # ref-level dynamic slice (value-level dynamic_slice has no Mosaic
    # lowering); read BQ+8 rows aligned, take the two offsets statically
    qtx = qp_ref[0, pl.ds(q0, block_q + 8)]
    qt = qtx[:block_q]
    qt1 = qtx[1:block_q + 1]
    k = k_ref[0]
    v = v_ref[0]
    pos = pos_ref[0]
    H = ub_ref.shape[0]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)
              == n % H).astype(F32)
    ub = jax.lax.dot_general(onehot, ub_ref[...].astype(F32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=F32)       # [1, d]
    vb = jax.lax.dot_general(onehot, vb_ref[...].astype(F32),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=F32)
    g = g_ref[0]                                               # [BQ, d]
    qu = (qt.astype(F32) + ub).astype(cdt)
    qv = (qt.astype(F32) + vb).astype(cdt)
    qv1 = (qt1.astype(F32) + vb).astype(cdt)

    # ---- recompute forward ----
    content = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=F32)
    rel = _build_rel(qv, qv1, pos, T, q0, block_q)
    s = (content + rel) * scale
    if masked:
        # masked lanes softmax to exactly 0 (exp underflow), so dS is 0
        # there and no explicit masking is needed in the backward chain
        s = jnp.where(kmask_ref[0] > 0, s, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)             # pre-dropout
    if p_drop > 0.0:
        # prng_seed takes at most 2 words: fold the program coords in
        # injectively (n·n_tiles + i) so every tile draws a distinct stream
        pltpu.prng_seed(seed_ref[0] + n * (T // block_q) + i, seed_ref[1])
        bits = pltpu.bitcast(pltpu.prng_random_bits((block_q, T)),
                             jnp.uint32)
        thresh = jnp.uint32(min(int(p_drop * 4294967296.0), 4294967295))
        keep = (bits >= thresh).astype(F32) / (1.0 - p_drop)   # [BQ, T]
        probs_dropped = probs * keep
    else:
        keep = None
        probs_dropped = probs

    # ---- backward (matmul operands in cdt, f32 accumulation) ----
    dPd = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=F32)      # [BQ, T]
    dP = dPd * keep if keep is not None else dPd
    dS = probs * (dP - jnp.sum(dP * probs, axis=-1, keepdims=True))
    dSc = dS * scale                                           # d(content+rel)
    dSc_b = dSc.astype(cdt)

    dv_c = jax.lax.dot_general(probs_dropped.astype(cdt), g,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=F32)     # [T, d]
    dk_c = jax.lax.dot_general(dSc_b, qu, (((0,), (0,)), ((), ())),
                               preferred_element_type=F32)     # [T, d]
    dub_c = jax.lax.dot_general(
        jnp.sum(dSc, axis=0, keepdims=True).astype(cdt), k,
        (((1,), (0,)), ((), ())),
        preferred_element_type=F32)                            # [1, d]

    # scatter dRel back to dqv_a / dqv_n: the inverse of the forward roll
    # is a right-roll by a = T-1-q, whose amounts DESCEND in the row index
    # (stride must be non-negative, and the rotate does not wrap mod the
    # lane count) — so flip the rows of dSc first: flipped row r holds
    # global q = q0 + bq-1-r, amount a = (T-bq-q0) + r, ascending and in
    # [0, T-1]. All dqv_* below then carry FLIPPED rows; the row-summed
    # dvb term is flip-invariant, row-contractions flip the small [bq, d]
    # operand instead, and the two [bq, d] dq outputs get unflipped.
    WPAD = _wpad(T)
    dSc_f = _flip_rows(dSc_b)          # [BQ, T] f32, rows flipped
    dW = jnp.concatenate(
        [dSc_f, jnp.zeros((block_q, WPAD - T), F32)], axis=1)
    dW = pltpu.roll(dW, shift=T - block_q - q0, axis=1,
                    stride=1, stride_axis=0)
    # values are cdt-representable (rearranged dSc_b + zeros): exact cast
    dqv_a = dW[:, :T].astype(cdt)
    dqv_n = dW[:, T + 1: 2 * T + 1].astype(cdt)
    qv_f = (_flip_rows(qt) + vb).astype(cdt)
    qv1_f = (_flip_rows(qt1) + vb).astype(cdt)

    dpos_c = jax.lax.dot_general(dqv_a, qv_f, (((0,), (0,)), ((), ())),
                                 preferred_element_type=F32)
    dpos_c += jax.lax.dot_general(dqv_n, qv1_f,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=F32)  # [T, d]
    dvb_c = jax.lax.dot_general(
        jnp.sum(dW[:, :T] + dW[:, T + 1: 2 * T + 1], axis=0,
                keepdims=True).astype(cdt), pos,
        (((1,), (0,)), ((), ())), preferred_element_type=F32)  # [1, d]

    dq_c = jax.lax.dot_general(dSc_b, k, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)
    dq_c += _flip_rows(
        jax.lax.dot_general(dqv_a, pos, (((1,), (0,)), ((), ())),
                            preferred_element_type=F32))       # rows q0..
    dq_halo = _flip_rows(
        jax.lax.dot_general(dqv_n, pos, (((1,), (0,)), ((), ())),
                            preferred_element_type=F32))       # rows q0+1..

    @pl.when(i == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        dpos_ref[0] = jnp.zeros_like(dpos_ref[0])
        dub_ref[0] = jnp.zeros_like(dub_ref[0])
        dvb_ref[0] = jnp.zeros_like(dvb_ref[0])
        halo_ref[...] = jnp.zeros_like(halo_ref)

    dk_ref[0] += dk_c
    dv_ref[0] += dv_c
    dpos_ref[0] += dpos_c
    dub_ref[0, 0:1] += dub_c
    dvb_ref[0, 0:1] += dvb_c

    # dq rows q0..q0+BQ-1: own contrib + halo row q0+1.. shifted down one,
    # + the carried last-halo-row from the previous tile into row q0
    shifted = jnp.concatenate(
        [halo_ref[0:1], dq_halo[:block_q - 1]], axis=0)
    dq_ref[0, pl.ds(q0, block_q)] += dq_c + shifted
    halo_ref[...] = dq_halo[block_q - 1:block_q]   # carry to next tile


# --------------------------------------------------------------------- #
# custom-vjp wrapper
# --------------------------------------------------------------------- #

def _specs(N, T, d, H, block_q):
    return [
        pl.BlockSpec((1, T + 8, d), lambda n, i, *_: (n, 0, 0)),   # q_pad
        pl.BlockSpec((1, T, d), lambda n, i, *_: (n, 0, 0)),       # k
        pl.BlockSpec((1, T, d), lambda n, i, *_: (n, 0, 0)),       # v
        pl.BlockSpec((1, T, d), lambda n, i, *_: (n % H, 0, 0)),   # pos
        # biases ride whole ([H, d] is tiny) — (1, d) blocks break the
        # (8, 128) tiling rule; the kernel slices its head's row
        pl.BlockSpec((H, d), lambda n, i, *_: (0, 0)),             # u_bias
        pl.BlockSpec((H, d), lambda n, i, *_: (0, 0)),             # v_bias
        pl.BlockSpec((1, 1, T), lambda n, i, *_: (n, 0, 0)),       # kmask
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _fused(qp, k3, v3, pos3, ub, vb, seed, kmask3, scale, p_drop, block_q,
           masked):
    N, T, d = k3.shape
    H = pos3.shape[0]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, p_drop=p_drop,
                          block_q=block_q, T=T, masked=masked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, T // block_q),
            in_specs=_specs(N, T, d, H, block_q),
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda n, i, *_: (n, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((N, T, d), k3.dtype),
        interpret=_INTERPRET,
    )(seed, qp, k3, v3, pos3, ub, vb, kmask3)


def _fused_fwd(qp, k3, v3, pos3, ub, vb, seed, kmask3, scale, p_drop,
               block_q, masked):
    out = _fused(qp, k3, v3, pos3, ub, vb, seed, kmask3, scale, p_drop,
                 block_q, masked)
    return out, (qp, k3, v3, pos3, ub, vb, seed, kmask3)


def _fused_bwd(scale, p_drop, block_q, masked, res, g):
    qp, k3, v3, pos3, ub, vb, seed, kmask3 = res
    N, T, d = k3.shape
    H = pos3.shape[0]
    f32 = jnp.float32
    dq_pad, dk, dv, dpos, dub, dvb = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, p_drop=p_drop,
                          block_q=block_q, T=T, masked=masked),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, T // block_q),
            in_specs=_specs(N, T, d, H, block_q) + [
                pl.BlockSpec((1, block_q, d), lambda n, i, *_: (n, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, T + 8, d), lambda n, i, *_: (n, 0, 0)),
                pl.BlockSpec((1, T, d), lambda n, i, *_: (n, 0, 0)),
                pl.BlockSpec((1, T, d), lambda n, i, *_: (n, 0, 0)),
                pl.BlockSpec((1, T, d), lambda n, i, *_: (n, 0, 0)),
                # [N, 8, d] with a dead 8-row axis: (1, d) blocks violate
                # the (8, 128) tiling rule; row 0 carries the data
                pl.BlockSpec((1, 8, d), lambda n, i, *_: (n, 0, 0)),
                pl.BlockSpec((1, 8, d), lambda n, i, *_: (n, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((1, d), f32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, T + 8, d), f32),
            jax.ShapeDtypeStruct((N, T, d), f32),
            jax.ShapeDtypeStruct((N, T, d), f32),
            jax.ShapeDtypeStruct((N, T, d), f32),
            jax.ShapeDtypeStruct((N, 8, d), f32),
            jax.ShapeDtypeStruct((N, 8, d), f32),
        ],
        interpret=_INTERPRET,
    )(seed, qp, k3, v3, pos3, ub, vb, kmask3, g)

    B = N // H
    dqp = dq_pad.astype(qp.dtype)
    dk3 = dk.astype(k3.dtype)
    dv3 = dv.astype(v3.dtype)
    dpos3 = dpos.reshape(B, H, T, d).sum(0).astype(pos3.dtype)
    dub2 = dub[:, 0].reshape(B, H, d).sum(0).astype(ub.dtype)
    dvb2 = dvb[:, 0].reshape(B, H, d).sum(0).astype(vb.dtype)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    dkmask = np.zeros(kmask3.shape, jax.dtypes.float0)
    return dqp, dk3, dv3, dpos3, dub2, dvb2, dseed, dkmask


_fused.defvjp(_fused_fwd, _fused_bwd)


def supported(T, backend=None):
    backend = backend or jax.default_backend()
    return (backend not in ("cpu",) or _INTERPRET) and T % 128 == 0


def relpos_attention(q, k, v, pos_p, u_bias, v_bias, scale,
                     dropout_p=0.0, dropout_rng=None, block_q=None,
                     key_padding_mask=None):
    """Fused rel-pos attention.

    q/k/v: [B, T, H, Dh]; pos_p: [H, T, Dh] (batch-independent sinusoid
    projection); u_bias/v_bias: [H, Dh]. Returns ctx [B, T, H, Dh].
    key_padding_mask: optional [B, T] bool, True AT PADDING (the
    conformer's `attend_to_padding: false` mode).
    Falls back to the jnp reference off-TPU or for non-128-multiple T.
    """
    B, T, H, d = q.shape
    if not supported(T) or (dropout_p > 0.0 and _INTERPRET):
        # interpret mode has no prng_seed lowering on CPU: route dropout
        # through the jnp reference there (bit-identical masks between
        # fwd and bwd are verified on hardware)
        return relpos_attention_reference(
            q, k, v, pos_p[None].transpose(0, 2, 1, 3), u_bias, v_bias,
            scale, dropout_p, dropout_rng,
            key_padding_mask=key_padding_mask)
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, T, d)  # noqa
    qp = jnp.pad(fold(q), ((0, 0), (0, 8), (0, 0)))
    masked = key_padding_mask is not None
    if masked:
        kvalid = (~key_padding_mask).astype(jnp.int32)       # [B, T]
        kmask3 = jnp.broadcast_to(kvalid[:, None, None, :],
                                  (B, H, 1, T)).reshape(B * H, 1, T)
    else:
        kmask3 = jnp.ones((B * H, 1, T), jnp.int32)
    if dropout_p > 0.0:
        key = dropout_rng
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)
        seed = key.reshape(-1)[:2]
        if seed.shape[0] < 2:
            seed = jnp.concatenate([seed, jnp.zeros((1,), seed.dtype)])
        seed = jax.lax.bitcast_convert_type(
            seed.astype(jnp.uint32), jnp.int32)
    else:
        seed = jnp.zeros((2,), jnp.int32)
    if block_q is None:
        # one full-T tile is fastest when VMEM allows (measured 6.5 vs
        # 7.8 ms at T=896 with 128-row tiles): per-tile fixed costs and
        # halo handling vanish and the flip matmul becomes MXU-shaped
        block_q = T if T <= 1024 else 512
    bq = min(block_q, T)
    while T % bq:
        bq //= 2
    out = _fused(qp, fold(k), fold(v), pos_p, u_bias, v_bias, seed,
                 kmask3, float(scale), float(dropout_p), int(bq), masked)
    return out.reshape(B, H, T, d).transpose(0, 2, 1, 3)
