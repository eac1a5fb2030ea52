"""ForwardSum (alignment CTC) + binarization losses — batched, on device.

The reference loops over the batch calling torch CTCLoss per utterance
(model/loss.py:350-377). Here the whole batch goes through one vectorized
CTC forward pass, with the same construction: a blank column with
constant log-prob -1 is prepended to the attention log-probs, the target
sequence is 1..text_len, and each utterance's loss is normalized by its
target length (torch CTCLoss reduction="mean" semantics) before averaging.

The CTC alpha recursion itself is written here rather than taken from
optax: optax.ctc_loss scans one mel frame per lax.scan step, and at
T_m=896 the two serial loops (fwd + autodiff reverse) cost ~5.3 ms/step
of the fs2 training step — pure loop-dispatch latency, the per-step
compute is a [B, 2L+1] elementwise update. Processing UNROLL frames per
scan step (same trick as ops/mas.py) amortizes it ~8x. Labels here are
1..L (all distinct), so the skip transition never needs the
equal-consecutive-labels check.
"""

import jax
import jax.numpy as jnp

BLANK_LOGPROB = -1.0
_NEG = -1e9
_UNROLL = 8


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


def _ctc_neg_log_likelihood(logits, in_lens, out_lens):
    """-log p(labels 1..L | logits) under standard CTC, batched.

    logits: [B, T_m, T_s+1] log-probs (class 0 = blank, class i = label i).
    The CTC lattice has S = 2*T_s+1 states: even s -> blank, odd s=2i-1 ->
    label i. All labels are distinct, so the skip transition
    (s-2 -> s, odd s >= 3) is always allowed. Frames past out_len freeze
    the alphas; the likelihood reads states 2L and 2L-1 per sequence.
    """
    B, T_m, _ = logits.shape
    T_s = logits.shape[-1] - 1
    S = 2 * T_s + 1
    state = jnp.arange(S)
    can_skip = (state % 2 == 1) & (state >= 3)

    # emission log-probs per state per frame: states are
    # [blank, l1, blank, l2, ..., blank, lT, blank] — build by
    # interleaving (no gather; XLA take_along_axis is slow on TPU)
    blank = logits[:, :, :1]
    lab = logits[:, :, 1:]
    inter = jnp.stack([jnp.broadcast_to(blank, lab.shape), lab], axis=-1)
    em = jnp.concatenate([inter.reshape(B, T_m, 2 * T_s),
                          blank], axis=-1)               # [B, T_m, S]

    alpha0 = jnp.full((B, S), _NEG, logits.dtype)
    alpha0 = alpha0.at[:, 0].set(logits[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(logits[:, 0, 1])

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
