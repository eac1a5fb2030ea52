"""ForwardSum (alignment CTC) + binarization losses — batched, on device.

The reference loops over the batch calling torch CTCLoss per utterance
(model/loss.py:350-377). Here the whole batch goes through one vectorized
CTC forward pass, with the same construction: a blank column with
constant log-prob -1 is prepended to the attention log-probs, the target
sequence is 1..text_len, and each utterance's loss is normalized by its
target length (torch CTCLoss reduction="mean" semantics) before averaging.

Two implementations of the lattice recursion share exact semantics:

- An unrolled `lax.scan` (portable; CPU fallback and test reference). The
  alpha update is a [B, 2L+1] elementwise op, so at T_m~900 both the
  forward scan and its autodiff reverse pay per-iteration while-loop
  dispatch, ~ms per train step in-context even at unroll 8.
- A Pallas pair (TPU) behind `jax.custom_vjp`: the forward kernel streams
  the state log-emissions through VMEM in frame chunks on a sequential
  grid (alpha carry in persistent scratch, frame loop statically unrolled
  inside the kernel) and stores the full alpha lattice; the backward
  kernel walks the grid in reverse running the beta recursion and emits
  the CTC posterior gradient d(-logL)/d em[t,s] = -exp(alpha+beta-logL)
  directly. Labels are 1..L (all distinct), so the skip transition never
  needs the equal-consecutive-labels check, and the state layout
  [blank, l1, blank, ..., lL, blank] makes both recursions pure lane
  rotates. The interleave and log_softmax stay outside in XLA (they fuse,
  and their VJPs are elementwise).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("CTTS_PALLAS_INTERPRET", "") == "1"
BLANK_LOGPROB = -1.0
_NEG = -1e9
_UNROLL = 8
F32 = jnp.float32


def forward_sum_loss(attn_logprob, in_lens, out_lens):
    """attn_logprob: [B, T_m, T_s] (un-normalized log-attention energies).
    in_lens: [B] text lengths; out_lens: [B] mel lengths. Returns scalar."""
    B, T_m, T_s = attn_logprob.shape
    # Prepend the blank key (class 0), classes 1..T_s are text positions.
    logits = jnp.concatenate(
        [jnp.full((B, T_m, 1), BLANK_LOGPROB, attn_logprob.dtype),
         attn_logprob], axis=-1)
    # Invalidate key positions beyond each utterance's text length so the
    # log_softmax matches the reference's per-sample truncation.
    key_idx = jnp.arange(T_s + 1)[None, None, :]
    valid = key_idx <= in_lens[:, None, None]           # blank always valid
    logits = _log_softmax(jnp.where(valid, logits, _NEG))

    per_seq = _ctc_neg_log_likelihood(logits, in_lens, out_lens)
    # torch CTCLoss(reduction="mean"): divide by target length, then mean.
    return jnp.mean(per_seq / jnp.maximum(in_lens.astype(jnp.float32), 1.0))


def _interleave(logits):
    """[B, T_m, T_s+1] class log-probs -> [B, T_m, S] state log-emissions.

    The CTC lattice has S = 2*T_s+1 states: even s -> blank, odd s=2i-1 ->
    label i; built by interleaving (no gather; XLA take_along_axis is slow
    on TPU).
    """
    B, T_m, _ = logits.shape
    T_s = logits.shape[-1] - 1
    blank = logits[:, :, :1]
    lab = logits[:, :, 1:]
    inter = jnp.stack([jnp.broadcast_to(blank, lab.shape), lab], axis=-1)
    return jnp.concatenate([inter.reshape(B, T_m, 2 * T_s), blank], axis=-1)


def pallas_supported(backend=None):
    backend = backend or jax.default_backend()
    return backend not in ("cpu",) or _INTERPRET


def _ctc_neg_log_likelihood(logits, in_lens, out_lens):
    """-log p(labels 1..L | logits) under standard CTC, batched.

    logits: [B, T_m, T_s+1] log-probs (class 0 = blank, class i = label i).
    Frames past out_len freeze the alphas; the likelihood reads states 2L
    and 2L-1 per sequence. Dispatches to the Pallas kernels on TPU.
    """
    em = _interleave(logits)
    if pallas_supported():
        return _ctc_state_nll(em, in_lens, out_lens)
    return _ctc_nll_scan(em, in_lens, out_lens)


def _ctc_nll_scan(em, in_lens, out_lens):
    """lax.scan alpha recursion over the state emissions [B, T_m, S]."""
    B, T_m, S = em.shape
    state = jnp.arange(S)
    can_skip = (state % 2 == 1) & (state >= 3)

    alpha0 = jnp.full((B, S), _NEG, em.dtype)
    alpha0 = alpha0.at[:, 0].set(em[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(em[:, 0, 1])

    def advance(alpha, e_t):
        prev1 = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)),
                        constant_values=_NEG)
        prev2 = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)),
                        constant_values=_NEG)
        prev2 = jnp.where(can_skip[None], prev2, _NEG)
        m = jnp.maximum(alpha, jnp.maximum(prev1, prev2))
        tot = m + jnp.log(jnp.exp(alpha - m) + jnp.exp(prev1 - m)
                          + jnp.exp(prev2 - m))
        return tot + e_t

    pad_t = (-(T_m - 1)) % _UNROLL
    em_rest = jnp.pad(em[:, 1:], ((0, 0), (0, pad_t), (0, 0)),
                      constant_values=0.0)
    t_rest = jnp.pad(jnp.arange(1, T_m), (0, pad_t),
                     constant_values=T_m + 1)
    n_chunks = em_rest.shape[1] // _UNROLL
    em_rest = em_rest.reshape(B, n_chunks, _UNROLL, S).transpose(1, 2, 0, 3)
    t_rest = t_rest.reshape(n_chunks, _UNROLL)

    def step(alpha, xs):
        e_chunk, t_chunk = xs                            # [U, B, S], [U]
        for u in range(_UNROLL):
            live = (t_chunk[u] < out_lens)[:, None]      # [B, 1]
            alpha = jnp.where(live, advance(alpha, e_chunk[u]), alpha)
        return alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, (em_rest, t_rest), unroll=1)

    # read states 2L and 2L-1 (label-L and trailing blank)
    idx = jnp.stack([2 * in_lens, 2 * in_lens - 1], axis=1)  # [B, 2]
    finals = jnp.take_along_axis(alpha, idx, axis=1)
    return -jax.nn.logsumexp(finals, axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_ct(B, lanes, n_bufs=3, budget=6 << 20):
    """Frames per grid step so the pipelined VMEM buffers stay in budget."""
    ct = budget // (n_bufs * 2 * B * lanes * 4)
    return int(max(_UNROLL, min(128, ct // _UNROLL * _UNROLL)))


def _ctc_fwd_kernel(em_ref, olen_ref, aout_ref, a_scr, *, ct, unroll):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        a_scr[:, :] = jnp.full(a_scr.shape, _NEG, F32)

    olens = olen_ref[:, :1]                               # [B, 1] i32
    lane = jax.lax.broadcasted_iota(jnp.int32, a_scr.shape, 1)
    skip_ok = (lane % 2 == 1) & (lane >= 3)
    neg = jnp.float32(_NEG)

    def slab(k, _):
        rows = em_ref[:, pl.ds(k * unroll, unroll), :]    # [B, U, Sp]
        alpha = a_scr[:, :]
        outs = []
        for u in range(unroll):
            e = rows[:, u, :].astype(F32)
            p1 = pltpu.roll(alpha, shift=1, axis=1)
            p1 = jnp.where(lane == 0, neg, p1)
            p2 = pltpu.roll(alpha, shift=2, axis=1)
            p2 = jnp.where((lane < 2) | ~skip_ok, neg, p2)
            m = jnp.maximum(alpha, jnp.maximum(p1, p2))
            new = m + jnp.log(jnp.exp(alpha - m) + jnp.exp(p1 - m)
                              + jnp.exp(p2 - m)) + e
            if u == 0:
                # global frame 0: alpha0 = em[0] at states {0, 1}, -inf else
                isf = (t == 0) & (k == 0)
                new = jnp.where(isf, jnp.where(lane < 2, e, neg), new)
            g = t * ct + k * unroll + u
            alpha = jnp.where(g < olens, new, alpha)
            outs.append(alpha)
        a_scr[:, :] = alpha
        aout_ref[:, pl.ds(k * unroll, unroll), :] = jnp.stack(outs, axis=1)
        return 0

    jax.lax.fori_loop(0, ct // unroll, slab, 0)


def _ctc_bwd_kernel(em_ref, a_ref, olen_ref, fin_ref, zg_ref, dem_ref,
                    b_scr, en_scr, *, ct, unroll, nchunks):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        b_scr[:, :] = fin_ref[:, :]
        en_scr[:, :] = jnp.full(en_scr.shape, _NEG, F32)

    olens = olen_ref[:, :1]                               # [B, 1] i32
    z = zg_ref[:, :1]                                     # logL   [B, 1]
    gc = zg_ref[:, 1:2]                                   # cotangent [B, 1]
    base = (nchunks - 1 - t) * ct
    lane = jax.lax.broadcasted_iota(jnp.int32, b_scr.shape, 1)
    last = b_scr.shape[1] - 1
    neg = jnp.float32(_NEG)

    def slab(kk, _):
        k = ct // unroll - 1 - kk
        em_rows = em_ref[:, pl.ds(k * unroll, unroll), :]
        a_rows = a_ref[:, pl.ds(k * unroll, unroll), :]
        beta = b_scr[:, :]
        emn = en_scr[:, :]
        outs = []
        for uu in range(unroll):
            u = unroll - 1 - uu
            g = base + k * unroll + u
            # beta[g] from beta[g+1]: transitions s -> {s, s+1, s+2}; the
            # skip into s+2 is legal iff s is odd (s+2 is then an odd
            # label state >= 3). Dead next-frames copy beta down.
            q = emn + beta
            s1 = pltpu.roll(q, shift=last, axis=1)       # left by 1
            s1 = jnp.where(lane == last, neg, s1)
            s2 = pltpu.roll(q, shift=last - 1, axis=1)   # left by 2
            s2 = jnp.where((lane >= last - 1) | (lane % 2 == 0), neg, s2)
            m = jnp.maximum(q, jnp.maximum(s1, s2))
            bnew = m + jnp.log(jnp.exp(q - m) + jnp.exp(s1 - m)
                               + jnp.exp(s2 - m))
            beta = jnp.where((g + 1) < olens, bnew, beta)
            gamma = a_rows[:, u, :].astype(F32) + beta - z
            outs.append(jnp.where(g < olens, -jnp.exp(gamma) * gc, 0.0))
            emn = em_rows[:, u, :].astype(F32)
        b_scr[:, :] = beta
        en_scr[:, :] = emn
        dem_ref[:, pl.ds(k * unroll, unroll), :] = jnp.stack(
            outs[::-1], axis=1)
        return 0

    jax.lax.fori_loop(0, ct // unroll, slab, 0)


def _ctc_state_nll(em, in_lens, out_lens):
    """Per-seq CTC NLL over state log-emissions [B, T_m, S] (Pallas)."""
    B, T_m, S = em.shape
    sp = _round_up(S, 128)
    tmp = _round_up(T_m, _pick_ct(B, sp))
    # jnp.pad is outside the custom_vjp: its VJP (a slice) un-pads dem, so
    # the kernels only ever see aligned shapes and nothing in the bwd rule
    # needs the unpadded extents.
    emp = jnp.pad(em.astype(F32), ((0, 0), (0, tmp - T_m), (0, sp - S)),
                  constant_values=_NEG)
    return _ctc_state_nll_padded(emp, in_lens.astype(jnp.int32),
                                 out_lens.astype(jnp.int32))


@jax.custom_vjp
def _ctc_state_nll_padded(emp, in_lens, out_lens):
    return _ctc_nll_fwd_impl(emp, in_lens, out_lens)[0]


def _ctc_nll_fwd_impl(empp, in_lens, out_lens):
    B, tmp, sp = empp.shape
    ct = _pick_ct(B, sp)
    nchunks = tmp // ct
    olen = jnp.broadcast_to(out_lens[:, None], (B, 128)).astype(jnp.int32)

    alpha = pl.pallas_call(
        functools.partial(_ctc_fwd_kernel, ct=ct, unroll=_UNROLL),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((B, ct, sp), lambda t: (0, t, 0)),
            pl.BlockSpec((B, 128), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, ct, sp), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, tmp, sp), F32),
        scratch_shapes=[pltpu.VMEM((B, sp), F32)],
        interpret=_INTERPRET,
    )(empp, olen)

    # Frames past out_len freeze alpha, so the last row holds the finals.
    idx = jnp.stack([2 * in_lens, 2 * in_lens - 1], axis=1)   # [B, 2]
    finals = jnp.take_along_axis(alpha[:, -1, :], idx, axis=1)
    logl = jax.nn.logsumexp(finals, axis=-1)
    return -logl, (empp, alpha, logl)


def _ctc_nll_fwd(empp, in_lens, out_lens):
    nll, (empp, alpha, logl) = _ctc_nll_fwd_impl(empp, in_lens, out_lens)
    return nll, (empp, alpha, logl, in_lens, out_lens)


def _ctc_nll_bwd(res, gin):
    empp, alpha, logl, in_lens, out_lens = res
    B, tmp, sp = empp.shape
    ct = _pick_ct(B, sp)
    nchunks = tmp // ct
    lane = jnp.arange(sp)[None, :]
    i2 = (2 * in_lens)[:, None]
    fin = jnp.where((lane == i2) | (lane == i2 - 1), 0.0, _NEG).astype(F32)
    olen = jnp.broadcast_to(out_lens[:, None], (B, 128)).astype(jnp.int32)
    zg = jnp.concatenate(
        [logl[:, None], gin[:, None].astype(F32),
         jnp.zeros((B, 126), F32)], axis=1)

    dem = pl.pallas_call(
        functools.partial(_ctc_bwd_kernel, ct=ct, unroll=_UNROLL,
                          nchunks=nchunks),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((B, ct, sp), lambda t: (0, nchunks - 1 - t, 0)),
            pl.BlockSpec((B, ct, sp), lambda t: (0, nchunks - 1 - t, 0)),
            pl.BlockSpec((B, 128), lambda t: (0, 0)),
            pl.BlockSpec((B, sp), lambda t: (0, 0)),
            pl.BlockSpec((B, 128), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, ct, sp),
                               lambda t: (0, nchunks - 1 - t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, tmp, sp), F32),
        scratch_shapes=[pltpu.VMEM((B, sp), F32), pltpu.VMEM((B, sp), F32)],
        interpret=_INTERPRET,
    )(empp, alpha, olen, fin, zg)
    return (dem,
            np.zeros(in_lens.shape, jax.dtypes.float0),
            np.zeros(out_lens.shape, jax.dtypes.float0))


_ctc_state_nll_padded.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def _log_softmax(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=-1, keepdims=True))


def bin_loss(hard_attention, soft_attention, eps=1e-12):
    """-mean log soft-prob at hard-attention positions
    (model/loss.py:380-386)."""
    log_soft = jnp.log(jnp.clip(soft_attention, eps, None))
    num = jnp.sum(hard_attention * log_soft)
    return -num / jnp.maximum(jnp.sum(hard_attention), 1.0)
