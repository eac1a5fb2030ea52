"""Batched row gather/scatter as one-hot MXU matmuls (Pallas).

XLA lowers `jnp.take_along_axis` on TPU to a serial per-index loop: a
single [64, 3584] -> [64, 3584, 32] gather measures 2.84 ms (~100x the
HBM roofline) and dominates the reformer's LSH attention (reference
model/transformers/reformer.py:304-563), which sorts and un-sorts q/k/v by
hash bucket every layer. Gathering rows from [N, F] is `onehot @ values`,
and on TPU that is MXU work: these kernels build the one-hot COLUMN tile
[N, BM] directly in VMEM from an index-row broadcast against a sublane
iota (it never exists in HBM) and contract it with the values. Scatter-add
is the transposed contraction of the same tile, accumulated across source
tiles in f32.

Exactness: one-hot selection is exact in any dtype (each output lane sums
exactly one 1.0*value product in the f32 accumulator); scatter is exact
when `idx` is a permutation (e.g. undoing a sort) and accumulation-ordered
otherwise. `gather_rows`/`scatter_rows` are registered as each other's
VJPs, so both directions of a sort-domain round-trip stay on the MXU.

Off-TPU (and for shapes the kernels don't cover) both fall back to
`take_along_axis` / `.at[].add`, which are bit-identical for gather.
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


def _block_m(M):
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if M % bm == 0:
            return bm
    return None


def supported(N, M, F, backend=None, dtype=None):
    backend = backend or jax.default_backend()
    # F caps the VMEM working set (~16 MB/core): the scatter holds a
    # [N, BM] one-hot + [N, F] f32 accumulator + pipeline double-buffers.
    # F >= 8 keeps the contraction MXU-shaped: an [N, BM] x [N, 1] matmul
    # (e.g. the 2D coarse-pitch gather) pays full tile padding and loses
    # to take_along_axis, and narrow int gathers are untested on hardware
    # — the hardware harness (bench_kernels.py) exercises F=256 bf16.
    if dtype is not None and not jnp.issubdtype(jnp.dtype(dtype),
                                                jnp.floating):
        return False
    return ((backend not in ("cpu",) or _INTERPRET)
            and 8 <= F <= 256 and N % 8 == 0 and _block_m(M) is not None)


# --------------------------------------------------------------------- #
# kernels
# --------------------------------------------------------------------- #

def _onehot_cols(idx_ref, i, BM, N, dtype):
    """[N, BM] one-hot for source tile i: oh[n, m] = (idx[i*BM+m] == n).

    The idx row rides whole ([1, M] is tiny and a [1, BM] block breaks
    the (8, 128) tiling rule); the tile is cut out with one dynamic lane
    rotate + static slice. Broadcasting the lane-vector down sublanes and
    comparing against a sublane iota needs no transpose (Mosaic has no
    cheap lane->sublane transpose).
    """
    M = idx_ref.shape[-1]
    row = idx_ref[0]                                     # [1, M]
    if M > BM:
        # right-rotate by (M - i*BM) mod M; the rotate hardware does not
        # reduce amounts mod the lane count itself
        shift = jax.lax.rem(M - i * BM, M)
        row = pltpu.roll(row, shift=shift, axis=1)
    tile = row[:, :BM]                                   # [1, BM]
    sub = jax.lax.broadcasted_iota(jnp.int32, (N, BM), 0)
    return (jnp.broadcast_to(tile, (N, BM)) == sub).astype(dtype)


def _gather_kernel(idx_ref, val_ref, o_ref, *, N, BM):
    vals = val_ref[0]                                    # [N, F]
    oh = _onehot_cols(idx_ref, pl.program_id(1), BM, N, vals.dtype)
    o_ref[0] = jax.lax.dot_general(
        oh, vals, (((0,), (0,)), ((), ())),
        preferred_element_type=F32).astype(o_ref.dtype)  # [BM, F]


def _scatter_kernel(idx_ref, val_ref, o_ref, *, n_out, BM):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    vals = val_ref[0]                                    # [BM, F]
    oh = _onehot_cols(idx_ref, i, BM, n_out, vals.dtype)  # [n_out, BM]
    o_ref[0] += jax.lax.dot_general(
        oh, vals, (((1,), (0,)), ((), ())),
        preferred_element_type=F32)                      # [n_out, F]


def _gather_tpu(values, idx):
    G, N, F = values.shape
    M = idx.shape[1]
    BM = _block_m(M)
    return pl.pallas_call(
        functools.partial(_gather_kernel, N=N, BM=BM),
        grid=(G, M // BM),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, N, F), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BM, F), lambda g, i: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, M, F), values.dtype),
        interpret=_INTERPRET,
    )(idx[:, None], values)


def _scatter_tpu(values, idx, n_out):
    G, M, F = values.shape
    BM = _block_m(M)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, n_out=n_out, BM=BM),
        grid=(G, M // BM),
        in_specs=[
            pl.BlockSpec((1, 1, M), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, BM, F), lambda g, i: (g, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_out, F), lambda g, i: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, n_out, F), F32),
        interpret=_INTERPRET,
    )(idx[:, None], values)
    return out.astype(values.dtype)


# --------------------------------------------------------------------- #
# public API (custom-vjp pair)
# --------------------------------------------------------------------- #

@jax.custom_vjp
def gather_rows(values, idx):
    """values [G, N, F], idx [G, M] int32 in [0, N) -> [G, M, F]
    (out[g, m] = values[g, idx[g, m]])."""
    G, N, F = values.shape
    if supported(N, idx.shape[1], F):
        return _gather_tpu(values, idx)
    return jnp.take_along_axis(values, idx[..., None], axis=1)


def _gather_fwd(values, idx):
    return gather_rows(values, idx), (idx, values.shape[1])


def _gather_bwd(res, g):
    idx, N = res
    return scatter_rows(g, idx, N), np.zeros(idx.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def scatter_rows(values, idx, n_out):
    """values [G, M, F], idx [G, M] int32 in [0, n_out) -> [G, n_out, F]
    (out[g, idx[g, m]] += values[g, m]); exact when idx is a permutation."""
    G, M, F = values.shape
    if supported(n_out, M, F):
        return _scatter_tpu(values, idx, n_out)
    zero = jnp.zeros((G, n_out, F), values.dtype)
    return jax.vmap(lambda z, v, i: z.at[i].add(v))(zero, values, idx)


def _scatter_fwd(values, idx, n_out):
    return scatter_rows(values, idx, n_out), idx


def _scatter_bwd(n_out, res, g):
    idx = res
    return (gather_rows(g, idx),
            np.zeros(idx.shape, jax.dtypes.float0))


gather_rows.defvjp(_gather_fwd, _gather_bwd)
scatter_rows.defvjp(_scatter_fwd, _scatter_bwd)
