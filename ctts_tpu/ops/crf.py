"""Linear-chain CRF (forward algorithm + Viterbi) for the `crf` duration
head.

The reference declares this head (model/modules.py:1293-1296 builds a
torchcrf.CRF over 32 duration classes) but its loss branch raises
NotImplementedError (model/loss.py:146-149, with the intended call in a
comment: `-self.model.dur_predictor.crf(dur_pred, dur_gt.clamp(0, 31),
mask=nonpadding, reduction="mean")`). This is the working TPU-native
completion with torchcrf's exact semantics: score(y) = start[y_0] +
sum_t(trans[y_{t-1}, y_t] + emit[t, y_t]) + end[y_last], NLL =
logZ - score, both as static-shape `lax.scan`s over the (short) phone
axis. Masks are True AT VALID here (torchcrf convention; the callers
invert the repo's padding masks).
"""

import jax
import jax.numpy as jnp


def crf_log_likelihood(emissions, tags, mask, start, end, trans):
    """emissions [B, T, K] f32, tags [B, T] int32 in [0, K), mask [B, T]
    bool (True at valid; position 0 must be valid). Returns [B] log p(y|x).
    """
    B, T, K = emissions.shape
    m = mask.astype(jnp.float32)
    oh = jax.nn.one_hot(tags, K, dtype=jnp.float32)        # [B, T, K]
    e = jnp.sum(emissions * oh, axis=-1)                   # [B, T]
    tr = jnp.einsum("btk,btl,kl->bt", oh[:, :-1], oh[:, 1:], trans)
    score = (start[tags[:, 0]] + e[:, 0]
             + jnp.sum((tr + e[:, 1:]) * m[:, 1:], axis=1))
    last = jnp.sum(mask, axis=1).astype(jnp.int32) - 1
    last_tag = jnp.take_along_axis(tags, last[:, None], axis=1)[:, 0]
    score = score + end[last_tag]

    def fwd(alpha, xs):
        e_t, m_t = xs                                      # [B, K], [B, 1]
        nxt = jax.nn.logsumexp(
            alpha[:, :, None] + trans[None] + e_t[:, None, :], axis=1)
        return jnp.where(m_t > 0, nxt, alpha), None

    alpha0 = start[None] + emissions[:, 0]
    alpha, _ = jax.lax.scan(
        fwd, alpha0,
        (emissions[:, 1:].transpose(1, 0, 2), m[:, 1:].T[..., None]))
    log_z = jax.nn.logsumexp(alpha + end[None], axis=-1)
    return score - log_z


def viterbi_decode(emissions, mask, start, end, trans):
    """Most-likely tag sequence. emissions [B, T, K], mask [B, T] bool
    (True at valid). Returns [B, T] int32 (entries at masked positions are
    the best tag of the last valid step carried forward; callers zero them
    with their own mask)."""
    B, T, K = emissions.shape
    m = mask.astype(jnp.float32)

    def fwd(alpha, xs):
        e_t, m_t = xs
        cand = alpha[:, :, None] + trans[None]             # [B, K, K]
        best_prev = jnp.argmax(cand, axis=1)               # [B, K]
        best = jnp.max(cand, axis=1) + e_t
        keep = m_t > 0
        alpha_n = jnp.where(keep, best, alpha)
        bp = jnp.where(keep, best_prev,
                       jnp.broadcast_to(jnp.arange(K)[None], (B, K)))
        return alpha_n, bp

    alpha0 = start[None] + emissions[:, 0]
    alpha, bps = jax.lax.scan(
        fwd, alpha0,
        (emissions[:, 1:].transpose(1, 0, 2), m[:, 1:].T[..., None]))
    y_last = jnp.argmax(alpha + end[None], axis=-1)        # [B]

    def back(y, bp):
        y_prev = jnp.take_along_axis(bp, y[:, None], axis=1)[:, 0]
        return y_prev, y

    y0, ys = jax.lax.scan(back, y_last, bps, reverse=True)
    return jnp.concatenate([y0[:, None], ys.T], axis=1).astype(jnp.int32)
