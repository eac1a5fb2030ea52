"""Pallas-kernel regression harness: correctness vs the jnp fallbacks and
timing, ON REAL TPU HARDWARE (the pytest suite runs everything on CPU).

Covers the custom kernels:
  - fused padding-masked attention        (ops/attention.py)
  - fused rel-pos attention (conformer)   (ops/relpos_attention.py)
  - one-hot-matmul gather/scatter (LSH)   (ops/sort_gather.py)
  - fused local window attention          (ops/local_window_attention.py)
  - MAS/Viterbi binarization DP           (ops/mas.py)
  - ForwardSum CTC alpha/beta DP          (ops/forward_sum.py)

Prints one line per kernel: max fwd error vs fallback, grad rel-err, and
fused vs fallback wall time (fwd+bwd). Exits non-zero if any check fails.
Run: `python bench_kernels.py` (~2 min warm, longer on first compile).
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FAILS = []


def timeit(fn, *a, n=20):
    r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def report(name, err, gerr, t_fused, t_ref, err_tol, gerr_tol):
    ok = err <= err_tol and gerr <= gerr_tol
    if not ok:
        FAILS.append(name)
    print(f"{name:22s} fwd_err={err:.2e} (tol {err_tol:.0e})  "
          f"grad_rel={gerr:.2e} (tol {gerr_tol:.0e})  "
          f"fused={t_fused:.2f}ms  fallback={t_ref:.2f}ms  "
          f"[{'OK' if ok else 'FAIL'}]", flush=True)


def _gerr(ga, gb):
    out = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        out = max(out, float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9)))
    return out


def bench_fused_attention():
    from ctts_tpu.ops import attention as A
    rng = np.random.RandomState(0)
    N, T, d = 32, 1024, 128
    q = jnp.asarray(rng.randn(N, T, d) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(N, T, d) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(N, T, d) * 0.3, jnp.bfloat16)
    lengths = jnp.asarray(rng.randint(T // 2, T + 1, N), jnp.int32)
    scale = 1.0 / np.sqrt(d)

    fused = jax.jit(lambda *a: A._fused(*a, scale, 256))
    ref = jax.jit(lambda *a: A._reference_attention(*a, scale))
    err = float(jnp.abs(fused(q, k, v, lengths).astype(jnp.float32)
                        - ref(q, k, v, lengths).astype(jnp.float32)).max())
    lf = jax.jit(jax.grad(lambda q, k, v: (A._fused(
        q, k, v, lengths, scale, 256).astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2)))
    lr = jax.jit(jax.grad(lambda q, k, v: (A._reference_attention(
        q, k, v, lengths, scale).astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2)))
    gerr = _gerr(lf(q, k, v), lr(q, k, v))
    report("fused_attention", err, gerr, timeit(lf, q, k, v),
           timeit(lr, q, k, v), 5e-3, 5e-2)


def bench_relpos_attention():
    from ctts_tpu.ops import relpos_attention as RA
    rng = np.random.RandomState(0)
    B, T, H, d = 16, 896, 8, 32
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.3, jnp.bfloat16)  # noqa
    q, k, v = mk(B, T, H, d), mk(B, T, H, d), mk(B, T, H, d)
    pos, ub, vb = mk(H, T, d), mk(H, d), mk(H, d)
    scale = 1.0 / np.sqrt(H * d)

    err = float(jnp.abs(
        RA.relpos_attention(q, k, v, pos, ub, vb, scale
                            ).astype(jnp.float32)
        - RA.relpos_attention_reference(
            q, k, v, pos[None].transpose(0, 2, 1, 3), ub, vb, scale
        ).astype(jnp.float32)).max())
    lf = jax.jit(jax.grad(lambda a: (RA.relpos_attention(
        *a, scale).astype(jnp.float32) ** 2).sum()))
    lr = jax.jit(jax.grad(lambda a: (RA.relpos_attention_reference(
        a[0], a[1], a[2], a[3][None].transpose(0, 2, 1, 3), a[4], a[5],
        scale).astype(jnp.float32) ** 2).sum()))
    args = (q, k, v, pos, ub, vb)
    gerr = _gerr(lf(args), lr(args))
    report("relpos_attention", err, gerr, timeit(lf, args),
           timeit(lr, args), 5e-3, 5e-2)


def bench_sort_gather():
    from ctts_tpu.ops import sort_gather as SG
    rng = np.random.RandomState(0)
    G, N, M, F = 64, 896, 3584, 256
    vals = jnp.asarray(rng.randn(G, N, F) * 0.3, jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, N, (G, M)), jnp.int32)

    got = SG.gather_rows(vals, idx)
    ref = jnp.take_along_axis(vals, idx[..., None], axis=1)
    err = float((got != ref).sum())          # must be exact
    lf = jax.jit(jax.grad(lambda v: (SG.gather_rows(
        v, idx).astype(jnp.float32) ** 2).sum()))
    lr = jax.jit(jax.grad(lambda v: (jnp.take_along_axis(
        v, idx[..., None], axis=1).astype(jnp.float32) ** 2).sum()))
    gerr = _gerr(lf(vals), lr(vals))
    report("sort_gather", err, gerr, timeit(lf, vals),
           timeit(lr, vals), 0.5, 5e-2)


def bench_local_window():
    from ctts_tpu.ops import local_window_attention as LW
    from ctts_tpu.models import reformer as R
    rng = np.random.RandomState(0)
    B, N, d = 64, 896, 128
    qk = jnp.asarray(rng.randn(B, N, d) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, d) * 0.3, jnp.bfloat16)
    valid = jnp.asarray(rng.rand(B, N) > 0.1)

    fast = jax.jit(lambda a, b: R.local_attention(a, b, valid, 128))
    err_val = fast(qk, v)
    orig = LW.supported
    LW.supported = lambda *a, **k: False
    try:
        slow = jax.jit(lambda a, b: R.local_attention(a, b, valid, 128))
        ref_val = slow(qk, v)
        lr = jax.jit(jax.grad(lambda a, b: (R.local_attention(
            a, b, valid, 128).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1)))
        gr = lr(qk, v)
        t_ref = timeit(lr, qk, v)
    finally:
        LW.supported = orig
    err = float(jnp.abs(err_val.astype(jnp.float32)
                        - ref_val.astype(jnp.float32)).max())
    lf = jax.jit(jax.grad(lambda a, b: (R.local_attention(
        a, b, valid, 128).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)))
    gerr = _gerr(lf(qk, v), gr)
    report("local_window_attn", err, gerr, timeit(lf, qk, v), t_ref,
           5e-3, 5e-2)


def bench_lsh_chunk():
    """Fully fused LSH chunk attention (MEASURED AND REJECTED — opt-in
    via CTTS_FUSED_LSH=1, see ops/lsh_chunk_attention.supported) vs the
    default sort_gather fast path, full lsh_attention at reformer bench
    shapes (B·lsh_heads=64, N=896, d=32, 4 hashes). Kept in the bench so
    the rejection stays a measurement, not folklore."""
    import os
    from unittest import mock

    from ctts_tpu.models import reformer as R
    rng = np.random.RandomState(0)
    B, N, d = 64, 896, 32
    qk = jnp.asarray(rng.randn(B, N, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, N, d).astype(np.float32) * 0.3)
    valid = jnp.asarray(rng.rand(B, N) > 0.1)
    key = jax.random.PRNGKey(0)

    def loss(a, b):
        return (R.lsh_attention(a, b, valid, key) ** 2).sum()

    with mock.patch.dict(os.environ, {"CTTS_FUSED_LSH": "1"}):
        fwd = jax.jit(lambda a, b: R.lsh_attention(a, b, valid, key))
        lf = jax.jit(jax.grad(loss, argnums=(0, 1)))
        val_f, g_f = fwd(qk, v), lf(qk, v)
        t_f, t_ffwd = timeit(lf, qk, v), timeit(fwd, qk, v)
    with mock.patch.object(R.lsh_chunk_attention, "supported",
                           lambda *a, **k: False):
        slow = jax.jit(lambda a, b: R.lsh_attention(a, b, valid, key))
        lr = jax.jit(jax.grad(loss, argnums=(0, 1)))
        val_r, g_r = slow(qk, v), lr(qk, v)
        t_r, t_rfwd = timeit(lr, qk, v), timeit(slow, qk, v)
    err = float(jnp.abs(val_f - val_r).max())
    gerr = _gerr(g_f, g_r)
    report("lsh_chunk_attn", err, gerr, t_f, t_r, 5e-3, 5e-2)
    print(f"{'':22s} fwd only: fused={t_ffwd:.2f}ms  "
          f"fallback={t_rfwd:.2f}ms  (rejected: default off)", flush=True)


def bench_mas():
    from ctts_tpu.ops import mas as M
    rng = np.random.RandomState(0)
    B, T_m, T_s = 16, 896, 128
    attn = rng.rand(B, T_m, T_s).astype(np.float32) + 1e-3
    attn = jnp.asarray(attn / attn.sum(-1, keepdims=True))
    il = jnp.asarray(rng.randint(T_s // 2, T_s + 1, B), jnp.int32)
    ol = jnp.asarray(rng.randint(T_m // 2, T_m + 1, B), jnp.int32)

    fast = jax.jit(lambda a: M.b_mas_pallas(a, il, ol))
    slow = jax.jit(lambda a: M.b_mas_scan(a, il, ol))
    err = float(jnp.abs(fast(attn) - slow(attn)).max())   # must be exact
    report("mas_viterbi", err, 0.0, timeit(fast, attn),
           timeit(slow, attn), 0.5, 1.0)


def bench_forward_sum():
    from ctts_tpu.ops import forward_sum as FS
    rng = np.random.RandomState(0)
    B, T_m, T_s = 16, 896, 128
    attn = jnp.asarray(rng.randn(B, T_m, T_s).astype(np.float32))
    il = jnp.asarray(rng.randint(T_s // 2, T_s + 1, B), jnp.int32)
    ol = jnp.asarray(rng.randint(T_m // 2, T_m + 1, B), jnp.int32)

    def loss_with(pallas):
        orig = FS.pallas_supported
        FS.pallas_supported = lambda *a, **k: pallas
        try:
            val = jax.jit(lambda a: FS.forward_sum_loss(a, il, ol))
            grad = jax.jit(jax.grad(
                lambda a: FS.forward_sum_loss(a, il, ol)))
            return float(val(attn)), grad(attn), val, grad
        finally:
            FS.pallas_supported = orig

    v_f, g_f, valf, gradf = loss_with(True)
    v_r, g_r, valr, gradr = loss_with(False)
    err = abs(v_f - v_r)
    gerr = _gerr(g_f, g_r)
    report("forward_sum_ctc", err, gerr, timeit(gradf, attn),
           timeit(gradr, attn), 1e-4, 1e-2)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    bench_fused_attention()
    bench_relpos_attention()
    bench_sort_gather()
    bench_local_window()
    bench_lsh_chunk()
    bench_mas()
    bench_forward_sum()
    if FAILS:
        print("FAILED:", FAILS)
        sys.exit(1)
    print("all kernels OK")
