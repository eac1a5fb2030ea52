"""Pack an orbax checkpoint into a git-committable bf16 npz artifact.

Why: the trained real-speech checkpoint (output/real_speech/LJdemo/ckpt,
produced by tools/real_speech_validation.py) is what bench.py drives its
headline figure with — but output/ is gitignored and the container
filesystem does not persist between sessions. This packs the variables
tree into one compressed npz (float leaves stored as bfloat16, exactly the
precision the bf16 compute path reads) under assets/, which IS committed,
so the benchmark's learned duration statistics survive resets.

Usage:
    python tools/pack_ckpt.py [ckpt_dir] [out.npz]
Defaults: output/real_speech/LJdemo/ckpt -> assets/ljdemo_ckpt.npz
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    from ctts_tpu.utils.checkpoint import (pack_params_npz,
                                           restore_checkpoint_raw)
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        _REPO, "output/real_speech/LJdemo/ckpt")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        _REPO, "assets/ljdemo_ckpt.npz")
    tree, step = restore_checkpoint_raw(os.path.abspath(ckpt))
    if tree is None:
        # (restore returns (None, 0) when empty; a step-0 checkpoint is
        # legitimate, so gate on the tree, not step falsiness)
        raise SystemExit(f"no checkpoint under {ckpt}")
    pack_params_npz(tree, out, step)
    mb = os.path.getsize(out) / 1e6
    print(f"packed step {step} from {ckpt} -> {out} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()
