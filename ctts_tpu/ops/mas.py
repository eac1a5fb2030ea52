"""Monotonic Alignment Search (Viterbi, width 1) — fully on device.

The reference binarizes aligner attention with a numba CPU kernel after a
device→host round-trip (model/modules.py:36-75, 863-872). Here the dynamic
program runs inside jit as a `lax.scan` over mel frames (vmapped over the
batch), so binarization stays on the TPU and inside the compiled train step.

Semantics match `mas_width1` exactly, including tie-breaking (prefer the
diagonal move when log_p[i-1, j-1] >= log_p[i-1, j]) and the constraint that
the path starts at (0, 0) and ends at (mel_len-1, text_len-1).
"""

import jax
import jax.numpy as jnp
import numpy as np

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


def b_mas(attn_soft, in_lens, out_lens, eps=1e-12):
    """Batched MAS over soft attention.

    attn_soft: [B, T_m, T_s] probabilities (softmax output).
    in_lens:  [B] text lengths.  out_lens: [B] mel lengths.
    Returns attn_hard [B, T_m, T_s] float32 {0, 1}; rows beyond mel_len and
    columns beyond text_len are zero. No gradients flow (stop_gradient).
    """
    log_attn = jnp.log(jnp.maximum(attn_soft.astype(jnp.float32), eps))
    hard = jax.vmap(_mas_single)(log_attn, out_lens, in_lens)
    return jax.lax.stop_gradient(hard)


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
