"""Monotonic Alignment Search (Viterbi, width 1) — fully on device.

The reference binarizes aligner attention with a numba CPU kernel after a
device→host round-trip (model/modules.py:36-75, 863-872). Here the dynamic
program runs inside jit, so binarization stays on the TPU and inside the
compiled train step. Two implementations share exact semantics:

- `lax.scan` over mel frames (vmapped over the batch) — the portable path,
  and the CPU/test reference.
- A pair of Pallas kernels (TPU): the DP recurrence is an elementwise
  [B, T_s]-row update whose cost under XLA is pure while-loop pipeline
  serialization (~ms per step in-context even at unroll 8). Each kernel
  streams the [B, T_m, T_s] tensor through VMEM in frame chunks on a
  sequential grid, keeps the whole-batch carry row in persistent scratch,
  and statically unrolls the frame loop — one fused op instead of ~T_m/8
  dispatched while iterations. Kernel 1 runs the forward DP and emits the
  move bitmap; kernel 2 walks the grid in reverse and backtracks with a
  one-hot carry (the "which column" state is a vector, so stepping left is
  a lane rotate and reading move[i, j] is a masked row-sum — no dynamic
  lane indexing anywhere).

Semantics match `mas_width1` exactly, including tie-breaking (prefer the
diagonal move when log_p[i-1, j-1] >= log_p[i-1, j]) and the constraint that
the path starts at (0, 0) and ends at (mel_len-1, text_len-1).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("CTTS_PALLAS_INTERPRET", "") == "1"
_NEG = -1e30


def _mas_single(log_attn, mel_len, text_len, unroll=8):
    """log_attn: [T_m, T_s] log-probabilities. Returns hard [T_m, T_s] f32.

    The DP recurrence is inherently sequential over mel rows; `unroll` rows
    are processed per lax.scan step (statically unrolled) to amortize
    per-step dispatch on TPU.
    """
    T_m, T_s = log_attn.shape
    j_idx = jnp.arange(T_s)
    key_valid = j_idx < text_len                       # [T_s]
    log_attn = jnp.where(key_valid[None, :], log_attn, _NEG)

    # Forward DP. Row 0: only j == 0 reachable (mas_width1 line 42).
    row0 = jnp.where(j_idx == 0, log_attn[0], _NEG)

    rest = log_attn[1:]
    n_rest = T_m - 1
    pad = (-n_rest) % unroll
    if pad:
        rest = jnp.concatenate(
            [rest, jnp.full((pad, T_s), _NEG, rest.dtype)], axis=0)
    rest = rest.reshape(-1, unroll, T_s)

    def step(log_p, attn_rows):
        moves = []
        for u in range(unroll):
            shifted = jnp.concatenate([jnp.full((1,), _NEG), log_p[:-1]])
            move = shifted >= log_p                     # tie → diagonal move
            log_p = attn_rows[u] + jnp.where(move, shifted, log_p)
            moves.append(move)
        return log_p, jnp.stack(moves)

    _, moves = jax.lax.scan(step, row0, rest)           # [chunks, U, T_s]
    moves = moves.reshape(-1, T_s)[:n_rest]
    moves = jnp.concatenate([jnp.zeros((1, T_s), bool), moves], axis=0)

    # Backtrack from (mel_len-1, text_len-1) down to row 0.
    rev_moves = moves[::-1]
    rev_idx = jnp.arange(T_m - 1, -1, -1)
    pad_b = (-T_m) % unroll
    if pad_b:
        rev_moves = jnp.concatenate(
            [rev_moves, jnp.zeros((pad_b, T_s), bool)], axis=0)
        rev_idx = jnp.concatenate(
            [rev_idx, jnp.full((pad_b,), -1, rev_idx.dtype)])
    rev_moves = rev_moves.reshape(-1, unroll, T_s)
    rev_idx = rev_idx.reshape(-1, unroll)

    def back(curr_j, inp):
        mv, idx = inp
        rows = []
        for u in range(unroll):
            i = idx[u]
            active = (i >= 0) & (i < mel_len)
            rows.append(jnp.where(
                active, (j_idx == curr_j).astype(jnp.float32), 0.0))
            step_back = jnp.where(mv[u, curr_j], curr_j - 1, curr_j)
            curr_j = jnp.where(active & (i > 0), step_back, curr_j)
        return curr_j, jnp.stack(rows)

    start_j = jnp.maximum(text_len - 1, 0)
    _, rows = jax.lax.scan(back, start_j, (rev_moves, rev_idx))
    rows = rows.reshape(-1, T_s)[:T_m]
    return rows[::-1]


def b_mas_scan(attn_soft, in_lens, out_lens, eps=1e-12):
    """lax.scan MAS path (portable; the CPU fallback and test reference)."""
    log_attn = jnp.log(jnp.maximum(attn_soft.astype(jnp.float32), eps))
    hard = jax.vmap(_mas_single)(log_attn, out_lens, in_lens)
    return jax.lax.stop_gradient(hard)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

_UNROLL_K = 8    # frames per dynamic-slice slab (statically unrolled)
F32 = jnp.float32


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_ct(B, lanes, n_bufs=2, budget=6 << 20):
    """Frames per grid step so the pipelined VMEM buffers stay in budget."""
    ct = budget // (n_bufs * 2 * B * lanes * 4)
    return int(max(_UNROLL_K, min(128, ct // _UNROLL_K * _UNROLL_K)))


def _fwd_kernel(attn_ref, kmask_ref, moves_ref, logp_scr, *, ct, unroll, eps):
    """Forward DP over one [B, ct, Tsp] frame chunk; carry log_p persists in
    scratch across the sequential grid."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        logp_scr[:, :] = jnp.full(logp_scr.shape, _NEG, F32)

    kmask = kmask_ref[:, :] > 0.5                              # [B, Tsp]
    lane = jax.lax.broadcasted_iota(jnp.int32, kmask.shape, 1)
    neg = jnp.float32(_NEG)

    def slab(k, _):
        rows = attn_ref[:, pl.ds(k * unroll, unroll), :]       # [B, U, Tsp]
        log_p = logp_scr[:, :]
        mrows = []
        for u in range(unroll):
            lp_row = jnp.where(
                kmask, jnp.log(jnp.maximum(rows[:, u, :].astype(F32), eps)),
                neg)
            shifted = pltpu.roll(log_p, shift=1, axis=1)
            shifted = jnp.where(lane == 0, neg, shifted)
            move = shifted >= log_p                            # tie → diag
            newp = lp_row + jnp.where(move, shifted, log_p)
            movef = move.astype(F32)        # Mosaic can't select i1 vectors
            if u == 0:
                # global row 0 (mas_width1 line 42): only j == 0 reachable,
                # and the moves row is all-zero.
                isf = (t == 0) & (k == 0)
                newp = jnp.where(isf, jnp.where(lane == 0, lp_row, neg),
                                 newp)
                movef = jnp.where(isf, 0.0, movef)
            mrows.append(movef)
            log_p = newp
        logp_scr[:, :] = log_p
        moves_ref[:, pl.ds(k * unroll, unroll), :] = jnp.stack(
            mrows, axis=1).astype(moves_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ct // unroll, slab, 0)


def _bwd_kernel(moves_ref, olen_ref, hinit_ref, out_ref, h_scr,
                *, ct, unroll, nchunks):
    """Backtrack over the reversed grid with a one-hot column carry."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:, :] = hinit_ref[:, :]

    olens = olen_ref[:, :1]                                    # [B, 1] i32
    base = (nchunks - 1 - t) * ct
    lane = jax.lax.broadcasted_iota(jnp.int32, h_scr.shape, 1)
    last = h_scr.shape[1] - 1

    def slab(kk, _):
        k = ct // unroll - 1 - kk
        mrows = moves_ref[:, pl.ds(k * unroll, unroll), :]     # [B, U, Tsp]
        h = h_scr[:, :]
        outs = []
        for uu in range(unroll):
            u = unroll - 1 - uu
            g = base + k * unroll + u
            active = g < olens                                 # [B, 1]
            outs.append(jnp.where(active, h, 0.0))
            mv = jnp.sum(mrows[:, u, :].astype(F32) * h,
                         axis=1, keepdims=True) > 0.5
            step = active & (g > 0) & mv
            hl = pltpu.roll(h, shift=last, axis=1)   # left by 1
            hl = jnp.where(lane == last, 0.0, hl)
            h = jnp.where(step, hl, h)
        h_scr[:, :] = h
        out_ref[:, pl.ds(k * unroll, unroll), :] = jnp.stack(
            outs[::-1], axis=1)
        return 0

    jax.lax.fori_loop(0, ct // unroll, slab, 0)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("eps",))
def b_mas_pallas(attn_soft, in_lens, out_lens, eps=1e-12):
    """Pallas MAS (TPU). Same contract and bit-identical output as
    `b_mas_scan`; far less wall time in-context (the scan version's cost
    is per-iteration while-loop dispatch, not compute)."""
    # no gradient flows (contract matches b_mas_scan); stop it on the input
    # side too so autodiff never tries to JVP through the pallas_call
    attn_soft = jax.lax.stop_gradient(attn_soft)
    B, T_m, T_s = attn_soft.shape
    tsp = _round_up(T_s, 128)
    ct = _pick_ct(B, tsp)
    tmp = _round_up(T_m, ct)
    nchunks = tmp // ct
    attn = jnp.pad(attn_soft, ((0, 0), (0, tmp - T_m), (0, tsp - T_s)))
    in_lens = in_lens.astype(jnp.int32)
    out_lens = out_lens.astype(jnp.int32)
    kmask = (jnp.arange(tsp)[None, :] < in_lens[:, None]).astype(F32)
    olen = jnp.broadcast_to(out_lens[:, None], (B, 128))
    hinit = jax.nn.one_hot(jnp.maximum(in_lens - 1, 0), tsp, dtype=F32)

    moves = pl.pallas_call(
        functools.partial(_fwd_kernel, ct=ct, unroll=_UNROLL_K, eps=eps),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((B, ct, tsp), lambda t: (0, t, 0)),
            pl.BlockSpec((B, tsp), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, ct, tsp), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, tmp, tsp), F32),
        scratch_shapes=[pltpu.VMEM((B, tsp), F32)],
        interpret=_INTERPRET,
    )(attn, kmask)

    hard = pl.pallas_call(
        functools.partial(_bwd_kernel, ct=ct, unroll=_UNROLL_K,
                          nchunks=nchunks),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((B, ct, tsp), lambda t: (0, nchunks - 1 - t, 0)),
            pl.BlockSpec((B, 128), lambda t: (0, 0)),
            pl.BlockSpec((B, tsp), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, ct, tsp),
                               lambda t: (0, nchunks - 1 - t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, tmp, tsp), F32),
        scratch_shapes=[pltpu.VMEM((B, tsp), F32)],
        interpret=_INTERPRET,
    )(moves, olen, hinit)
    return jax.lax.stop_gradient(hard[:, :T_m, :T_s])


def pallas_supported(backend=None):
    backend = backend or jax.default_backend()
    return backend not in ("cpu",) or _INTERPRET


def b_mas(attn_soft, in_lens, out_lens, eps=1e-12):
    """Batched MAS over soft attention.

    attn_soft: [B, T_m, T_s] probabilities (softmax output).
    in_lens:  [B] text lengths.  out_lens: [B] mel lengths.
    Returns attn_hard [B, T_m, T_s] float32 {0, 1}; rows beyond mel_len and
    columns beyond text_len are zero. No gradients flow (stop_gradient).
    Dispatches to the Pallas kernels on TPU, lax.scan elsewhere.
    """
    if pallas_supported():
        return b_mas_pallas(attn_soft, in_lens, out_lens, eps=eps)
    return b_mas_scan(attn_soft, in_lens, out_lens, eps=eps)


def mas_width1_np(attn_map):
    """Numpy reference (same contract as model/modules.py:36-64), for tests."""
    opt = np.zeros_like(attn_map)
    attn_map = np.log(np.maximum(attn_map, 1e-300))
    attn_map[0, 1:] = -np.inf
    log_p = np.zeros_like(attn_map)
    log_p[0, :] = attn_map[0, :]
    prev_ind = np.zeros_like(attn_map, dtype=np.int64)
    for i in range(1, attn_map.shape[0]):
        for j in range(attn_map.shape[1]):
            prev_log = log_p[i - 1, j]
            prev_j = j
            if j - 1 >= 0 and log_p[i - 1, j - 1] >= log_p[i - 1, j]:
                prev_log = log_p[i - 1, j - 1]
                prev_j = j - 1
            log_p[i, j] = attn_map[i, j] + prev_log
            prev_ind[i, j] = prev_j
    curr_text_idx = attn_map.shape[1] - 1
    for i in range(attn_map.shape[0] - 1, -1, -1):
        opt[i, curr_text_idx] = 1
        curr_text_idx = prev_ind[i, curr_text_idx]
    opt[0, curr_text_idx] = 1
    return opt
