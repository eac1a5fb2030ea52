"""Settle the conformer backward row-flip claim with measurements
(VERDICT-r4 weak #7).

The rel-pos attention backward must scatter dS from absolute back to
relative positions: a per-row right-roll whose amounts DESCEND in the row
index. `pltpu.roll` only supports non-negative per-row stride, so the
descending roll is inexpressible directly ("recompute the shift instead
of inverting it" hits the same sign: whichever row order the backward
picks, one of {recomputed forward shift, inverse scatter} sees descending
amounts). The expressible inverses are:

  a) row-flip then ascending roll — a [BQ, BQ] permutation matmul
     (2·BQ²·T FLOPs/tile) — what ops/relpos_attention.py ships;
  b) lane-reversal then ascending roll — a [T, T] permutation matmul on
     the right (2·BQ·T² FLOPs/tile — T/BQ = 7x more at these shapes);
  c) a log2(T) roll+select ladder (no MXU, 10 serial VPU passes) —
     measured and rejected in round 3 (PROFILE.md).

This bench times each variant in isolation at the real backward's shapes
(BQ=128, T=896, grid = B·H x T/BQ = 128 x 7, bf16), against a no-scatter
baseline (load + ascending roll + store), and prints one JSON line with
ms per backward-equivalent invocation. Run on the real chip:
    python tools/bench_flip.py
"""

import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
B, H, T, BQ = 16, 8, 896, 128
WPAD = ((2 * T + 1) + 127) // 128 * 128


def _flip_mat(n, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (c == (n - 1) - r).astype(dtype)


def _revlane_mat(n, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == (n - 1) - c).astype(dtype)


def _scatter_tail(dW, o_ref):
    o_ref[0] = (dW[:, :T] + dW[:, T + 1: 2 * T + 1]).astype(jnp.bfloat16)


def _kernel(x_ref, o_ref, *, variant):
    i = pl.program_id(1)
    q0 = i * BQ
    x = x_ref[0]                                     # [BQ, T] bf16 (= dSc_b)
    if variant == "baseline":
        # no scatter: ascending roll only (the forward direction) — the
        # floor any inverse formulation pays anyway
        W = jnp.concatenate([x.astype(F32),
                             jnp.zeros((BQ, WPAD - T), F32)], axis=1)
        dW = pltpu.roll(W, shift=q0 + 1, axis=1, stride=1, stride_axis=0)
        _scatter_tail(dW, o_ref)
    elif variant == "row_flip":
        # ships in ops/relpos_attention.py: [BQ, BQ] permutation matmul,
        # then the roll amounts ascend in the flipped row index
        P = _flip_mat(BQ, jnp.bfloat16)
        xf = jax.lax.dot_general(P, x, (((1,), (0,)), ((), ())),
                                 preferred_element_type=F32)
        W = jnp.concatenate([xf, jnp.zeros((BQ, WPAD - T), F32)], axis=1)
        dW = pltpu.roll(W, shift=T - BQ - q0, axis=1, stride=1,
                        stride_axis=0)
        _scatter_tail(dW, o_ref)
    elif variant == "lane_rev":
        # reverse LANES on the right instead: roll(-a) = rev(roll(a, rev));
        # the permutation is [T, T] — T/BQ x the FLOPs of the row flip
        P = _revlane_mat(T, jnp.bfloat16)
        xr = jax.lax.dot_general(x, P, (((1,), (0,)), ((), ())),
                                 preferred_element_type=F32)
        W = jnp.concatenate([xr, jnp.zeros((BQ, WPAD - T), F32)], axis=1)
        dW = pltpu.roll(W, shift=q0 + 1, axis=1, stride=1, stride_axis=0)
        # un-reverse the full padded width (pay the same [*,*] perm again
        # in a real integration; charge only the forward one here — this
        # UNDERSTATES the variant's true cost and it still loses)
        _scatter_tail(dW, o_ref)
    elif variant == "ladder":
        # log2 roll+select ladder: per-row roll by a(r) = (T-1-q0) - r via
        # 10 conditional constant rolls (serial VPU passes, no MXU)
        W = jnp.concatenate([x.astype(F32),
                             jnp.zeros((BQ, WPAD - T), F32)], axis=1)
        amt = (T - 1 - q0) - jax.lax.broadcasted_iota(jnp.int32,
                                                      (BQ, 1), 0)
        amt = jnp.where(amt < 0, amt + WPAD, amt)
        for bit in range(11):                        # 2^11 = 2048 > WPAD
            step = 1 << bit
            rolled = pltpu.roll(W, shift=step, axis=1)
            W = jnp.where((amt & step) > 0, rolled, W)
        _scatter_tail(W, o_ref)


def _build(variant):
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant),
        grid=(B * H, T // BQ),
        in_specs=[pl.BlockSpec((1, BQ, T), lambda n, i: (n, i, 0))],
        out_specs=pl.BlockSpec((1, BQ, T), lambda n, i: (n, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, T, T), jnp.bfloat16),
    )


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B * H, T, T).astype(np.float32),
                    jnp.bfloat16)
    # TIMING TRAP: one eager op before timing
    _ = float(jnp.abs(x[0, 0]).max())

    results = {}
    for variant in ("baseline", "row_flip", "lane_rev", "ladder"):
        fn = jax.jit(functools.partial(_run, variant=variant))
        y = fn(x)
        jax.block_until_ready(y)
        dts = []
        for _r in range(5):
            t0 = time.perf_counter()
            for _i in range(20):
                y = fn(x)
            jax.block_until_ready(y)
            dts.append((time.perf_counter() - t0) / 20)
        results[variant] = round(float(np.median(dts)) * 1000, 3)
        print(f"{variant}: {results[variant]} ms", flush=True)

    out = {
        "metric": "relpos_bwd_scatter_ms",
        "shapes": f"B{B} H{H} T{T} BQ{BQ} bf16",
        "variants_ms": results,
        "scatter_tax_ms": {
            k: round(v - results["baseline"], 3)
            for k, v in results.items() if k != "baseline"},
    }
    with open(os.path.join(_REPO, "FLIP_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def _run(x, variant):
    return _build(variant)(x)


if __name__ == "__main__":
    main()
