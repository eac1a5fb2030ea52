"""Validation CLI (reference surface: evaluate.py:15-109): run the val set,
report per-component weighted-mean losses, optionally synthesize one sample.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".cache", "jax"))


def evaluate(model, state, configs, logger=None, vocoder=None, step=None):
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.parallel.train_step import make_eval_step

    preprocess_config, model_config, train_config = configs
    learn_alignment = model_config["duration_modeling"]["learn_alignment"]
    mode = "train_unsup" if learn_alignment else "train_sup"
    tag = "unsup" if learn_alignment else "sup"
    dataset = Dataset(f"val_{tag}.txt", preprocess_config, model_config,
                      train_config, sort=False, drop_last=False)
    eval_step = make_eval_step(model, preprocess_config, model_config,
                               train_config, mode)

    sums, count = {}, 0
    sample = None
    for batch in dataset.batches(shuffle=False, group_size=1):
        n = len(batch["ids"])
        db = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
        db = jax.tree.map(lambda x: jnp.asarray(x) if x is not None else None,
                          db)
        comps, out = eval_step(state, db)
        if sample is None:
            sample = (batch, out)
        for k, v in comps.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n
        count += n
    means = {k: v / count for k, v in sums.items()}

    # one synthesized sample: the reference's full figure set — mel pair,
    # f0/energy contour overlays, soft/hard/prior attention — plus audio
    # (reference evaluate.py:71-107 via utils/tools.py:206-313)
    if logger is not None and sample is not None:
        from ctts_tpu.utils.figures import synth_sample_figures
        from ctts_tpu.utils.model import vocoder_infer
        import matplotlib.pyplot as plt
        batch, out = sample
        mel_len = int(np.asarray(out["mel_lens"])[0])
        pred = np.asarray(out["postnet_mel_predictions"])[0, :mel_len]
        gt = np.asarray(batch["mels"])[0, :mel_len]
        figs, fig_attn = synth_sample_figures(
            batch, out, preprocess_config, model_config, idx=0)
        if fig_attn is not None:
            figs["attn"] = fig_attn
        for name, fig in figs.items():
            logger.figure(f"Validation/step_{step}_{batch['ids'][0]}_{name}",
                          fig, step)
            plt.close(fig)
        if vocoder is not None and vocoder[0] != "griffin_lim":
            wavs = vocoder_infer(np.stack([pred, gt]), vocoder,
                                 preprocess_config,
                                 lengths=[mel_len, mel_len])
            logger.audio(f"Validation/step_{step}_synth",
                         wavs[0].astype(np.float32) / 32768.0, step)
            logger.audio(f"Validation/step_{step}_reconstructed",
                         wavs[1].astype(np.float32) / 32768.0, step)
    message = "Validation Step {}, ".format(step) + ", ".join(
        f"{k}: {v:.4f}" for k, v in means.items())
    if logger is not None:
        logger.scalars(step, means)
    return message, means


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_dir", type=str, default=None)
    args = parser.parse_args()

    from ctts_tpu.config import get_configs_of
    from ctts_tpu.utils.model import get_model

    configs = get_configs_of(args.dataset, args.config_dir)
    model, state, tx = get_model(args.restore_step, configs, train=True)
    message, _ = evaluate(model, state, configs, step=args.restore_step)
    print(message)


if __name__ == "__main__":
    main()
