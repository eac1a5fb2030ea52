"""A/B microbench: subpixel-conv vs transposed-conv vocoder upsampling.

Times the full HiFi-GAN V1 (and optionally MelGAN) generator at serving
shapes on the real TPU with CTTS_SUBPIX=1 (kernel-2 dense conv +
depth-to-space) vs CTTS_SUBPIX=0 (lax.conv_transpose, the default), same
weights. The vocoder is ~85% of end-to-end serving time, so this isolates
the ConvTranspose share cheaply instead of recompiling the whole bench.

Measured 2026-08-18 on the real chip (full V1, bf16):
  B=128 T=896: subpix 529.2 ms vs convT 504.9 ms  (0.954x)
  B=16  T=896: subpix 148.6 ms vs convT 129.8 ms  (0.873x)
  B=1   T=90 (stream chunk): subpix 3.92 ms vs convT 4.06 ms (1.036x)
Hence the transposed conv is the default.

Usage: python tools/bench_vocoder.py [B] [T_mel]   (defaults 128, 896)
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time(fn, *args, iters=10, repeats=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / iters)
    return min(best) * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 896

    from ctts_tpu.vocoder.hifigan import HiFiGANGenerator, V1_CONFIG

    # TIMING TRAP (CLAUDE.md): run one eager op before any timing loop
    _ = float(jnp.abs(jnp.ones((8, 8))).max())

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(B, T, 80).astype(np.float32) * 2 - 5)
    gen = HiFiGANGenerator(dict(V1_CONFIG), dtype=jnp.bfloat16)
    var = gen.init(jax.random.PRNGKey(0), mel[:1, :16])

    results = {}
    for mode in ("1", "0"):
        os.environ["CTTS_SUBPIX"] = mode

        def run(v, m):
            return gen.apply(v, m)

        fn = jax.jit(run)
        ms = _time(fn, var, mel)
        results[mode] = ms
        audio_s = B * T * 256 / 22050
        print(f"hifigan CTTS_SUBPIX={mode}: {ms:8.2f} ms  "
              f"({audio_s / (ms / 1e3):7.1f}x real time)", flush=True)
    speedup = results["0"] / results["1"]
    print(f"subpixel speedup: {speedup:.3f}x", flush=True)


if __name__ == "__main__":
    main()
