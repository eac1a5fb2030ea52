"""Fused windowed shared-QK local attention (Pallas, fwd + bwd) for the
reformer's local heads (reference model/transformers/reformer.py:643 via
the local-attention library).

Semantics exactly match models/reformer.py:local_attention: queries in
window w attend to keys of windows w and w-1 (window 0's look-back is
synthetic and fully masked), keys are the L2-normalized shared qk, the
self position is pinned to SELF_ATTN_VAL before the causal and validity
masks (order matters for padded-row content, which must stay bit-level
compatible with the fallback for deep-stack parity), and fully-masked
rows go uniform. XLA runs this as [B, W, win, 2*win] einsum/mask/softmax
chains through HBM (2.59 ms fwd+bwd per layer at B64/N896/d128); here one
program per batch row statically unrolls the window loop with everything
in VMEM (2.22 ms — the op is VPU/softmax-bound at these tile sizes, so
the fusion win is real but modest).

The backward recomputes each window's probabilities and accumulates dqk
(query-side, both key-window sides including the normalization chain)
and dv into whole-row f32 accumulators with static padded adds.
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INTERPRET = os.environ.get("CTTS_PALLAS_INTERPRET", "") == "1"
F32 = jnp.float32
NEG = -1e9
SELF_ATTN_VAL = -5e4


def _program_tiles(qk_ref, v_ref, vs_ref, vl_ref, w, win, N):
    """Load window w's q/k/v/mask tiles; w is a PYTHON int (the window
    loop is static), so every slice is static and window 0's synthetic
    look-back (zeros in the fallback) costs nothing."""
    q = qk_ref[0, w * win:(w + 1) * win]                   # [win, d]
    vcur = v_ref[0, w * win:(w + 1) * win]
    if w > 0:
        kprev = qk_ref[0, (w - 1) * win:w * win]
        vprev = v_ref[0, (w - 1) * win:w * win]
    else:
        kprev = jnp.zeros_like(q)
        vprev = jnp.zeros_like(vcur)
    k2 = jnp.concatenate([q, kprev], axis=0)               # [2win, d]
    v2 = jnp.concatenate([vcur, vprev], axis=0)
    # validity: sublane-oriented copy for queries, lane row for keys
    mq = vs_ref[0, w * win:(w + 1) * win][:, :1] > 0       # [win, 1]
    vrow = vl_ref[0]
    cur = vrow[:, w * win:(w + 1) * win]
    prev = (vrow[:, (w - 1) * win:w * win] if w > 0
            else jnp.zeros_like(cur))
    mkv = jnp.concatenate([cur, prev], axis=1) > 0         # [1, 2win]
    return q, k2, v2, mq, mkv


def _masked_dots(q, k2, mq, mkv, w, win, scale, cdt):
    """[win, 2win] f32 masked logits + the normalized-key tensors."""
    ssq = jnp.sum(k2.astype(F32) * k2.astype(F32), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(ssq + 1e-12)                         # [2win, 1]
    kn = (k2.astype(F32) * r).astype(cdt)
    dots = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32) * scale
    qt = w * win + jax.lax.broadcasted_iota(jnp.int32, (win, 2 * win), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (win, 2 * win), 1)
    kt = jnp.where(lane < win, w * win + lane,
                   (w - 1) * win + lane - win)
    kt = jnp.where((w == 0) & (lane >= win), -1, kt)       # synthetic
    dots = jnp.where(qt == kt, SELF_ATTN_VAL, dots)
    dots = jnp.where(qt < kt, NEG, dots)                   # causal
    valid = mq & mkv & (kt >= 0)
    dots = jnp.where(valid, dots, NEG)
    return dots, kn, r


def _softmax(dots):
    m = jnp.max(dots, axis=-1, keepdims=True)
    e = jnp.exp(dots - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(qk_ref, v_ref, vs_ref, vl_ref, o_ref, *, win, N, scale):
    cdt = qk_ref.dtype
    for w in range(N // win):                              # static loop
        q, k2, v2, mq, mkv = _program_tiles(qk_ref, v_ref, vs_ref,
                                            vl_ref, w, win, N)
        dots, _, _ = _masked_dots(q, k2, mq, mkv, w, win, scale, cdt)
        probs = _softmax(dots)
        o_ref[0, w * win:(w + 1) * win] = jax.lax.dot_general(
            probs.astype(cdt), v2, (((1,), (0,)), ((), ())),
            preferred_element_type=F32).astype(o_ref.dtype)


def _bwd_kernel(qk_ref, v_ref, vs_ref, vl_ref, g_ref,
                dqk_ref, dv_ref, *, win, N, scale):
    cdt = qk_ref.dtype
    dqk_acc = jnp.zeros((N, qk_ref.shape[-1]), F32)
    dv_acc = jnp.zeros((N, qk_ref.shape[-1]), F32)
    for w in range(N // win):                              # static loop
        q, k2, v2, mq, mkv = _program_tiles(qk_ref, v_ref, vs_ref,
                                            vl_ref, w, win, N)
        dots, kn, r = _masked_dots(q, k2, mq, mkv, w, win, scale, cdt)
        probs = _softmax(dots)                             # [win, 2win]
        g = g_ref[0, w * win:(w + 1) * win]                # [win, d] cdt
        probs_b = probs.astype(cdt)

        dv2 = jax.lax.dot_general(probs_b, g, (((0,), (0,)), ((), ())),
                                  preferred_element_type=F32)  # [2win, d]
        dP = jax.lax.dot_general(g, v2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=F32)   # [win, 2win]
        dS = probs * (dP - jnp.sum(dP * probs, axis=-1, keepdims=True))
        dSc = (dS * scale).astype(cdt)

        dq = jax.lax.dot_general(dSc, kn, (((1,), (0,)), ((), ())),
                                 preferred_element_type=F32)   # [win, d]
        dkn = jax.lax.dot_general(dSc, q, (((0,), (0,)), ((), ())),
                                  preferred_element_type=F32)  # [2win, d]
        # backward of kn = k2 * r(k2): dk2 = r*dkn - k2 * r^3 * <k2, dkn>
        k2f = k2.astype(F32)
        inner = jnp.sum(k2f * dkn, axis=-1, keepdims=True)
        dk2 = r * dkn - k2f * (r * r * r) * inner          # [2win, d]

        pads = ((w * win, N - (w + 1) * win), (0, 0))
        dqk_acc = dqk_acc + jnp.pad(dq + dk2[:win], pads)
        dv_acc = dv_acc + jnp.pad(dv2[:win], pads)
        if w > 0:
            pads_p = (((w - 1) * win, N - w * win), (0, 0))
            dqk_acc = dqk_acc + jnp.pad(dk2[win:], pads_p)
            dv_acc = dv_acc + jnp.pad(dv2[win:], pads_p)
    dqk_ref[0] = dqk_acc
    dv_ref[0] = dv_acc


def _specs(B, N, d):
    return [
        pl.BlockSpec((1, N, d), lambda b: (b, 0, 0)),      # qk
        pl.BlockSpec((1, N, d), lambda b: (b, 0, 0)),      # v
        pl.BlockSpec((1, N, 128), lambda b: (b, 0, 0)),    # valid sublane
        pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0)),      # valid lane
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(qk, v, vs, vl, win, scale):
    B, N, d = qk.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, win=win, N=N, scale=scale),
        grid=(B,),
        in_specs=_specs(B, N, d),
        out_specs=pl.BlockSpec((1, N, d), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, d), qk.dtype),
        interpret=_INTERPRET,
    )(qk, v, vs, vl)


def _fused_fwd(qk, v, vs, vl, win, scale):
    return _fused(qk, v, vs, vl, win, scale), (qk, v, vs, vl)


def _fused_bwd(win, scale, res, g):
    qk, v, vs, vl = res
    B, N, d = qk.shape
    dqk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, win=win, N=N, scale=scale),
        grid=(B,),
        in_specs=_specs(B, N, d) + [
            pl.BlockSpec((1, N, d), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, N, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, N, d), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, d), F32),
            jax.ShapeDtypeStruct((B, N, d), F32),
        ],
        interpret=_INTERPRET,
    )(qk, v, vs, vl, g)
    return (dqk.astype(qk.dtype), dv.astype(v.dtype),
            np.zeros(vs.shape, jax.dtypes.float0),
            np.zeros(vl.shape, jax.dtypes.float0))


_fused.defvjp(_fused_fwd, _fused_bwd)


def supported(N, win, d, backend=None):
    backend = backend or jax.default_backend()
    return ((backend not in ("cpu",) or _INTERPRET)
            and N % win == 0 and win % 128 == 0 and N % 128 == 0
            and d <= 256)


def local_window_attention(qk, v, valid, window, scale):
    """Fused path for models/reformer.py:local_attention (must only be
    called when `supported(...)`; the caller keeps the jnp fallback)."""
    B, N, d = qk.shape
    vs = jnp.broadcast_to(valid[..., None], (B, N, 128)).astype(jnp.int32)
    vl = valid[:, None, :].astype(jnp.int32)
    return _fused(qk, v, vs, vl, int(window), float(scale))
