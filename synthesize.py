"""Synthesis CLI (reference surface: synthesize.py:113-231).

Modes:
  --mode single --text "..." [--speaker_id N]
  --mode batch  --source path/to/metadata.txt
Control knobs: --pitch_control / --energy_control / --duration_control.

English G2P: lexicon lookup with g2p_en fallback when installed, else a
grapheme pass-through (letters are valid symbols). Mandarin uses pypinyin
when installed (synthesize.py:59-84).
"""

import argparse
import os
import re
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".cache", "jax"))

from ctts_tpu.config import get_configs_of
from ctts_tpu.text import text_to_sequence
from ctts_tpu.utils.logging import plot_mel
from ctts_tpu.utils.model import (get_model, get_vocoder, vocoder_infer,
                                  vocoder_stream)


def read_lexicon(lex_path):
    lexicon = {}
    if not os.path.exists(lex_path):
        return lexicon
    with open(lex_path) as f:
        for line in f:
            temp = re.split(r"\s+", line.strip("\n"))
            word, phones = temp[0], temp[1:]
            if word.lower() not in lexicon:
                lexicon[word.lower()] = phones
    return lexicon


def _g2p_fallback():
    try:
        from g2p_en import G2p
        return G2p()
    except Exception:
        return None


def preprocess_english(text, preprocess_config):
    """(reference synthesize.py:32-56)"""
    text = text.rstrip(punctuation_strip(text))
    lexicon = read_lexicon(preprocess_config["path"]["lexicon_path"])
    g2p = _g2p_fallback()
    phones = []
    words = [w for w in re.split(r"([,;.\-\?\!\s+])", text) if w]
    for w in words:
        if w.lower() in lexicon:
            phones += lexicon[w.lower()]
        elif g2p is not None:
            phones += [p for p in g2p(w) if p != " "]
        else:
            # grapheme pass-through: spell with letter symbols
            phones += ["__raw__" + w]
    if any(p.startswith("__raw__") for p in phones):
        # mixed sequence: build curly-brace spans only for real phones
        seq = []
        for p in phones:
            if p.startswith("__raw__"):
                seq += text_to_sequence(
                    p[len("__raw__"):],
                    preprocess_config["preprocessing"]["text"]["text_cleaners"])
            else:
                seq += text_to_sequence(
                    "{" + p + "}",
                    preprocess_config["preprocessing"]["text"]["text_cleaners"])
        print("Raw Text Sequence: {}".format(text))
        return np.array(seq)
    phones = "{" + " ".join(phones) + "}"
    phones = re.sub(r"\{[^\w\s]?\}", "{sp}", phones)
    print("Raw Text Sequence: {}".format(text))
    print("Phoneme Sequence: {}".format(phones))
    return np.array(text_to_sequence(
        phones, preprocess_config["preprocessing"]["text"]["text_cleaners"]))


def preprocess_mandarin(text, preprocess_config):
    """(reference synthesize.py:59-84)"""
    from pypinyin import pinyin, Style
    lexicon = read_lexicon(preprocess_config["path"]["lexicon_path"])
    if not lexicon:
        # rule-generated pinyin lexicon (exact superset of the reference's
        # lexicon/pinyin-lexicon-r.txt)
        from ctts_tpu.text.pinyin_lexicon import build_lexicon
        lexicon = build_lexicon()
    phones = []
    pinyins = [p[0] for p in pinyin(text, style=Style.TONE3,
                                    strict=False, neutral_tone_with_five=True)]
    for p in pinyins:
        if p in lexicon:
            phones += lexicon[p]
        else:
            phones.append("sp")
    phones = "{" + " ".join(phones) + "}"
    print("Raw Text Sequence: {}".format(text))
    print("Phoneme Sequence: {}".format(phones))
    return np.array(text_to_sequence(
        phones, preprocess_config["preprocessing"]["text"]["text_cleaners"]))


def punctuation_strip(text):
    import string
    return string.punctuation


def synthesize(model, variables, batch, configs, vocoder, controls,
               result_dir, max_mel_len=None, bucket=128, stream_chunk=0):
    preprocess_config, model_config, train_config = configs
    p, e, d = controls

    # jit (not eager apply): each mel_budget compiles once; eager dispatch
    # runs the graph op-by-op, ~100x slower through the TPU tunnel
    @partial(jax.jit, static_argnames=("mel_budget",))
    def _run(variables, speakers, texts, src_lens, spker_embeds, mel_budget):
        return model.apply(
            variables, speakers=speakers, texts=texts, src_lens=src_lens,
            mode="infer", max_mel_len=mel_budget, spker_embeds=spker_embeds,
            p_control=p, e_control=e, d_control=d, deterministic=True)

    def run(mel_budget):
        return _run(
            variables, jnp.asarray(batch["speakers"]),
            jnp.asarray(batch["texts"]), jnp.asarray(batch["src_lens"]),
            (jnp.asarray(batch["spker_embeds"])
             if batch.get("spker_embeds") is not None else None),
            mel_budget=mel_budget)

    if max_mel_len is None:
        # probe predicted durations with a tiny budget, then synthesize with
        # a right-sized static bucket (serving pattern; see bench.py)
        probe = run(bucket)
        total = int(np.asarray(
            jnp.sum(probe["duration_rounded"], axis=1)).max())
        cap = 2 * model_config["max_seq_len"]   # pos tables extend to 2×
        max_mel_len = min(cap, -(-max(total, 1) // bucket) * bucket)
    out = run(max_mel_len)

    mels = np.asarray(out["postnet_mel_predictions"])
    mel_lens = np.asarray(out["mel_lens"])
    if stream_chunk and vocoder[0] != "griffin_lim":
        # chunked streaming vocode: first audio is ready after ~one window
        # instead of after the full utterance (exact vs the full pass;
        # ctts_tpu/vocoder/streaming.py). The CLI writes files, so here the
        # win is reported as time-to-first-audio; a serving frontend would
        # flush each chunk to the client instead of collecting.
        import time
        hop = preprocess_config["preprocessing"]["stft"]["hop_length"]
        t0 = time.perf_counter()
        chunks = []
        for c in vocoder_stream(mels, vocoder, preprocess_config,
                                chunk=stream_chunk):
            if not chunks:
                print(f"time-to-first-audio: "
                      f"{(time.perf_counter() - t0) * 1e3:.0f} ms "
                      f"({stream_chunk * hop} samples/chunk)")
            chunks.append(c)
        full = np.concatenate(chunks, axis=1)
        wavs = [full[i, :int(n) * hop] for i, n in enumerate(mel_lens)]
    else:
        wavs = vocoder_infer(mels, vocoder, preprocess_config,
                             lengths=mel_lens)

    os.makedirs(result_dir, exist_ok=True)
    sr = preprocess_config["preprocessing"]["audio"]["sampling_rate"]
    for i, basename in enumerate(batch["ids"]):
        wavfile.write(os.path.join(result_dir, f"{basename}.wav"), sr,
                      wavs[i])
        fig = plot_mel([mels[i, :mel_lens[i]].T],
                       [f"Synthesized Spectrogram ({basename})"])
        fig.savefig(os.path.join(result_dir, f"{basename}.png"))
        import matplotlib.pyplot as plt
        plt.close(fig)
    print(f"wrote {len(batch['ids'])} wav/png pairs to {result_dir}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--packed_ckpt", type=str, default=None,
                        help="bf16 npz weights from tools/pack_ckpt.py "
                             "(e.g. assets/ljdemo_ckpt.npz) — synthesize "
                             "with trained weights, no orbax dir needed")
    parser.add_argument("--mode", type=str, choices=["batch", "single"],
                        required=True)
    parser.add_argument("--source", type=str, default=None,
                        help="metadata txt for batch mode")
    parser.add_argument("--text", type=str, default=None)
    parser.add_argument("--speaker_id", type=str, default="0",
                        help="speaker name (speakers.json key) for "
                             "multi-speaker models")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--config_dir", type=str, default=None)
    parser.add_argument("--vocoder_ckpt", type=str, default="ckpt")
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    parser.add_argument("--stream_chunk", type=int, default=0,
                        help="vocode in streaming chunks of N mel frames "
                             "(0 = full-utterance vocode); exact output, "
                             "reports time-to-first-audio")
    args = parser.parse_args()

    if args.mode == "batch":
        assert args.source is not None and args.text is None
    if args.mode == "single":
        assert args.source is None and args.text is not None

    configs = get_configs_of(args.dataset, args.config_dir)
    preprocess_config, model_config, train_config = configs

    model, variables = get_model(args.restore_step, configs, train=False,
                                 packed_ckpt=args.packed_ckpt)
    vocoder = get_vocoder(model_config, args.vocoder_ckpt)
    if vocoder[0] == "griffin_lim":
        print("NOTE: no vocoder weights found; using griffin-lim fallback")
    result_dir = train_config["path"]["result_path"]
    controls = (args.pitch_control, args.energy_control,
                args.duration_control)

    if args.mode == "single":
        import json
        ids = raw_texts = [args.text[:100]]
        language = preprocess_config["preprocessing"]["text"]["language"]
        if language == "en":
            seq = preprocess_english(args.text, preprocess_config)
        elif language == "zh":
            seq = preprocess_mandarin(args.text, preprocess_config)
        else:
            raise ValueError(language)
        # speaker info (reference synthesize.py:210-220): --speaker_id is a
        # speakers.json key; the external embedding is loaded by that name
        speaker_idx, spker_embed = 0, None
        if model_config["multi_speaker"]:
            pp = preprocess_config["path"]["preprocessed_path"]
            with open(os.path.join(pp, "speakers.json")) as f:
                speaker_map = json.load(f)
            speaker_idx = speaker_map[args.speaker_id]
            if preprocess_config["preprocessing"].get(
                    "speaker_embedder", "none") != "none":
                spker_embed = np.load(os.path.join(
                    pp, "spker_embed",
                    f"{args.speaker_id}-spker_embed.npy")).astype(np.float32)
        batch = {
            "ids": ids, "raw_texts": raw_texts,
            "speakers": np.array([speaker_idx], np.int32),
            "texts": seq[None].astype(np.int32),
            "src_lens": np.array([len(seq)], np.int32),
            "spker_embeds": spker_embed,
        }
        synthesize(model, variables, batch, configs, vocoder, controls,
                   result_dir, stream_chunk=args.stream_chunk)
    else:
        from ctts_tpu.data.dataset import TextDataset
        dataset = TextDataset(args.source, preprocess_config, model_config)
        for batch in dataset.batches(batch_size=8):
            synthesize(model, variables, batch, configs, vocoder, controls,
                       result_dir, stream_chunk=args.stream_chunk)


if __name__ == "__main__":
    main()
