"""ForwardSum (alignment CTC) + binarization losses — batched, on device.

The reference loops over the batch calling torch CTCLoss per utterance
(model/loss.py:350-377). Here the whole batch goes through one vectorized
CTC forward pass (optax), with the same construction: a blank column with
constant log-prob -1 is prepended to the attention log-probs, the target
sequence is 1..text_len, and each utterance's loss is normalized by its
target length (torch CTCLoss reduction="mean" semantics) before averaging.
"""

import jax.numpy as jnp
import optax

BLANK_LOGPROB = -1.0
_NEG = -1e9


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

    labels = jnp.broadcast_to(jnp.arange(1, T_s + 1)[None, :], (B, T_s))
    label_paddings = (labels > in_lens[:, None]).astype(jnp.float32)
    logit_paddings = (jnp.arange(T_m)[None, :] >= out_lens[:, None]).astype(jnp.float32)

    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                             blank_id=0)
    # torch CTCLoss(reduction="mean"): divide by target length, then mean.
    return jnp.mean(per_seq / jnp.maximum(in_lens.astype(jnp.float32), 1.0))


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
