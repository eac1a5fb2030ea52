"""Observability: TensorBoard scalars/figures/audio + plaintext logs.

Parity surface with the reference logger (utils/tools.py:150-185,
train.py:76-90): two writers (train/val), per-component loss scalars, LR,
mel/alignment figures, audio samples; plus a JSONL step log for machine
consumption (the reference has only txt).
"""

import json
import os
import time


class Logger:
    def __init__(self, log_path, split):
        self.dir = os.path.join(log_path, split)
        os.makedirs(self.dir, exist_ok=True)
        self.txt = open(os.path.join(self.dir, "log.txt"), "a")
        self.jsonl = open(os.path.join(self.dir, "log.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(self.dir)
        except Exception:
            self.tb = None

    def scalars(self, step, losses, lr=None):
        for k, v in losses.items():
            if self.tb:
                self.tb.add_scalar(f"Loss/{k}_loss", float(v), step)
        if lr is not None and self.tb:
            self.tb.add_scalar("Training/learning_rate", float(lr), step)
        rec = {"step": int(step), "t": time.time(),
               **{k: float(v) for k, v in losses.items()}}
        if lr is not None:
            rec["lr"] = float(lr)
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        msg = ", ".join(f"{k}: {float(v):.4f}" for k, v in losses.items())
        self.txt.write(f"Step {step}, {msg}\n")
        self.txt.flush()

    def figure(self, tag, fig, step):
        if self.tb:
            self.tb.add_figure(tag, fig, step)

    def audio(self, tag, wav, step, sampling_rate=22050):
        if self.tb:
            peak = max(abs(wav.max()), abs(wav.min()), 1e-5)
            self.tb.add_audio(tag, wav / peak, step,
                              sample_rate=sampling_rate)

    def close(self):
        self.txt.close()
        self.jsonl.close()
        if self.tb:
            self.tb.close()


def plot_mel(data, titles=None):
    """Stacked mel/feature plots (reference utils/tools.py:364-...)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(len(data), 1, squeeze=False,
                             figsize=(8, 2.2 * len(data)))
    titles = titles or [None] * len(data)
    for i, mel in enumerate(data):
        axes[i][0].imshow(mel, origin="lower", aspect="auto")
        axes[i][0].set_ylim(0, mel.shape[0])
        if titles[i] is not None:
            axes[i][0].set_title(titles[i], fontsize="medium")
        axes[i][0].tick_params(labelsize="x-small")
    plt.tight_layout()
    return fig


def plot_alignment(attn_maps, titles=None):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(1, len(attn_maps), squeeze=False,
                             figsize=(4 * len(attn_maps), 4))
    titles = titles or [None] * len(attn_maps)
    for i, a in enumerate(attn_maps):
        axes[0][i].imshow(a, origin="lower", aspect="auto")
        if titles[i] is not None:
            axes[0][i].set_title(titles[i], fontsize="medium")
    plt.tight_layout()
    return fig
