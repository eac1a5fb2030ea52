"""Fused HiFi-GAN ResBlock (Pallas): the whole 6-conv dilated residual chain
runs on one VMEM-resident tile.

A ResBlock1 (vocoder/hifigan.py) is, per dilation d ∈ (1, 3, 5):
    x = x + Conv_k1(lrelu(Conv_kd(lrelu(x))))
XLA executes each conv as its own HBM round-trip — 6 reads + 6 writes of a
[B, T, C] tensor with T up to 64k samples per second of audio. This kernel
tiles the time axis with a halo of the chain's full receptive field
(6·(k−1) samples per side) and keeps every intermediate in VMEM: one read,
one write. Each conv is k static-slice matmuls on the MXU; buffers shrink
statically as the halo is consumed, so all shapes are compile-time.

Weights fit VMEM for C ≤ 128 (k=11: ~4.3 MB); the generator keeps the wide
C=256 level on XLA.

MEASUREMENT (v5e, B=16): XLA's dilated-conv kernels already run near the
HBM roofline (C=128/T=16k: 4.7 ms vs 8.9 ms here; C=32/T=64k: 11.2 vs 22.2 —
the lane padding to 128 inflates narrow-channel matmuls). The fusion is
therefore OPT-IN via CTTS_FUSE_RESBLOCK=1; it remains exact (1e-7 vs the
reference math) and is kept as the starting point for an unfold-packed
variant ([L, k·C] @ [k·C, C]) that would cut the padding waste.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = os.environ.get("CTTS_PALLAS_INTERPRET", "") == "1"
LRELU = 0.1


def _chain_halo(kernel_size, dilations):
    p = (kernel_size - 1) // 2
    return sum(d * p + p for d in dilations)


def _lrelu(x):
    # compare-free leaky relu (bf16 compares are unsupported on this target):
    # max(x,0) + s*min(x,0) = ((1+s)/2)*x + ((1-s)/2)*|x|
    return ((1 + LRELU) / 2) * x + ((1 - LRELU) / 2) * jnp.abs(x)


def _conv_taps(buf, w, b, dilation, out_len):
    """buf: [L, C]; w: [k, C, C]; → [out_len, C] fp32 (valid region)."""
    k = w.shape[0]
    acc = jnp.zeros((out_len, w.shape[2]), jnp.float32)
    for j in range(k):
        acc = acc + jax.lax.dot_general(
            buf[j * dilation: j * dilation + out_len, :],
            w[j],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return acc + b.astype(jnp.float32)[None, :]


def _resblock_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, scratch,
                     sem, *, block_t, halo, kernel_size, dilations, seq_len):
    n = pl.program_id(0)
    i = pl.program_id(1)
    L0 = block_t + 2 * halo
    # DMA the haloed tile from (pre-padded) HBM
    cp = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * block_t, L0), :], scratch, sem)
    cp.start()
    cp.wait()

    p = (kernel_size - 1) // 2
    cdt = scratch.dtype                    # compute dtype (bf16 on the MXU)
    x = scratch[...]
    L = L0
    # absolute sequence index of buffer element 0 (tracks halo consumption);
    # the reference zero-pads EVERY conv at the sequence boundary, so
    # intermediates must be re-zeroed outside [0, seq_len)
    base = i * block_t - halo

    def mask_oob(buf, b0, length):
        idx = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 0) + b0
        ok = (idx >= 0) & (idx < seq_len)
        return jnp.where(ok, buf, 0.0)

    for di, d in enumerate(dilations):
        h1 = d * p
        Ln = L - 2 * h1
        h = mask_oob(_lrelu(x), base, L).astype(cdt)
        y = _conv_taps(h, w1_ref[di], b1_ref[di], d, Ln)
        y = mask_oob(_lrelu(y), base + h1, Ln).astype(cdt)
        y2 = _conv_taps(y, w2_ref[di], b2_ref[di], 1, Ln - 2 * p)
        # residual: trim x by this pair's total halo and add
        x = (x[h1 + p: h1 + p + (Ln - 2 * p), :].astype(jnp.float32)
             + y2).astype(cdt)
        base = base + h1 + p
        L = Ln - 2 * p
    o_ref[0] = x.astype(o_ref.dtype)


def fused_resblock1(x, w1, b1, w2, b2, kernel_size, dilations=(1, 3, 5),
                    block_t=1024):
    """x: [N, T, C]; w1/w2: [n_dil, k, C, C]; b1/b2: [n_dil, C].
    Equivalent to the HiFi-GAN ResBlock1 chain. T must divide block_t."""
    N, T, C = x.shape
    halo = _chain_halo(kernel_size, dilations)
    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    # lane tiling wants channel counts in multiples of 128; zero-pad
    # (padded channels stay exactly zero through the whole chain)
    Cp = -(-C // 128) * 128
    if Cp != C:
        pc = Cp - C
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pc)))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, pc), (0, pc)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, pc), (0, pc)))
        b1 = jnp.pad(b1, ((0, 0), (0, pc)))
        b2 = jnp.pad(b2, ((0, 0), (0, pc)))
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))
    L0 = bt + 2 * halo
    kernel = functools.partial(
        _resblock_kernel, block_t=bt, halo=halo, kernel_size=kernel_size,
        dilations=tuple(dilations), seq_len=T)
    return pl.pallas_call(
        kernel,
        grid=(N, T // bt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x (DMA'd)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),         # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),         # b2
        ],
        out_specs=pl.BlockSpec((1, bt, Cp), lambda n, i: (n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, Cp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((L0, Cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(xp, w1, b1, w2, b2)[:, :, :C]


def reference_resblock1(x, w1, b1, w2, b2, kernel_size, dilations=(1, 3, 5)):
    """jnp twin (identical math, XLA convs) for CPU and verification.
    Computes in x.dtype (bf16 rides the MXU) with fp32 accumulation."""
    cdt = x.dtype

    def conv(h, w, b, d):
        k = w.shape[0]
        pad = d * (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            h.astype(cdt), w.astype(cdt), window_strides=(1,),
            padding=[(pad, pad)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        return (y + b[None, None, :]).astype(cdt)

    for di, d in enumerate(dilations):
        h = jnp.where(x > 0, x, jnp.asarray(LRELU, cdt) * x)
        y = conv(h, w1[di], b1[di], d)
        y = jnp.where(y > 0, y, jnp.asarray(LRELU, cdt) * y)
        y2 = conv(y, w2[di], b2[di], 1)
        x = x + y2
    return x
