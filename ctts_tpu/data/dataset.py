"""Training/inference datasets over the preprocessed .npy store.

Consumes the same on-disk layout the reference preprocessor writes
(dataset.py:51-148: per-utterance mel/pitch/f0/energy/duration/mel2ph or
attn_prior/cwt .npy + metadata txt + stats.json), so data preprocessed by
either framework is interchangeable.

TPU-specific design: batches are padded to SHAPE BUCKETS (next multiple of
``bucket_src``/``bucket_mel``) so jit sees a handful of shapes instead of
one per batch; sort-by-length grouped batching (reference dataset.py:229-248,
group_size) minimizes padding waste inside each bucket.
"""

import json
import os
import queue
import threading

import numpy as np

from ctts_tpu.preprocessing.pitch import norm_interp_f0
from ctts_tpu.text import text_to_sequence


def _round_up(x, m):
    return int(-(-x // m) * m)


def prefetch_iter(iterator, depth=2):
    """Run an iterator on a background thread with a bounded queue, so host
    batch assembly (and native .npy IO) overlaps device execution."""
    q = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:                  # propagate to consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def get_variance_level(preprocess_config, model_config, data_loading=True):
    """(reference utils/tools.py:30-44)"""
    learn_alignment = (model_config["duration_modeling"]["learn_alignment"]
                       if data_loading else False)
    feature = preprocess_config["preprocessing"]["energy"]["feature"]
    assert feature in ("frame_level", "phoneme_level")
    tag = ("phone" if (not learn_alignment and feature == "phoneme_level")
           else "frame")
    return tag, feature


class Dataset:
    def __init__(self, filename, preprocess_config, model_config,
                 train_config, sort=False, drop_last=False,
                 bucket_src=32, bucket_mel=128):
        self.preprocess_config = preprocess_config
        self.preprocessed_path = preprocess_config["path"]["preprocessed_path"]
        self.cleaners = preprocess_config["preprocessing"]["text"]["text_cleaners"]
        self.batch_size = train_config["optimizer"]["batch_size"]
        self.learn_alignment = model_config["duration_modeling"]["learn_alignment"]
        self.dataset_tag = "unsup" if self.learn_alignment else "sup"
        self.load_spker_embed = (
            model_config["multi_speaker"]
            and preprocess_config["preprocessing"].get(
                "speaker_embedder", "none") != "none")
        self.energy_level_tag, _ = get_variance_level(preprocess_config,
                                                      model_config)
        self.pitch_type = preprocess_config["preprocessing"]["pitch"]["pitch_type"]
        # train.on_device_prior: the jitted step computes the beta-binomial
        # prior from (mel_lens, src_lens) on device (ops/attn_prior.py), so
        # skip both the attn_prior .npy load and its 4.7 MB/batch transfer
        self.on_device_prior = bool(train_config.get("on_device_prior",
                                                     False))
        self.sort = sort
        self.drop_last = drop_last
        self.bucket_src = bucket_src
        self.bucket_mel = bucket_mel

        self.basename, self.speaker, self.text, self.raw_text = \
            self._process_meta(filename)
        with open(os.path.join(self.preprocessed_path, "speakers.json")) as f:
            self.speaker_map = json.load(f)

        # threaded C++ .npy reader when built (native/npy_loader.cc)
        self._native = None
        try:
            from ctts_tpu.data import native_loader
            if native_loader.available():
                self._native = native_loader.NativePrefetcher(8)
        except Exception:
            self._native = None

    def __len__(self):
        return len(self.text)

    def _load_many(self, paths):
        if self._native is not None:
            arrays = self._native.fetch(self._native.submit(paths))
            if all(a is not None for a in arrays):
                return arrays
        return [np.load(p) for p in paths]

    def _npy(self, kind, speaker, basename, tagged=True):
        tag = f"_{self.dataset_tag}" if tagged else ""
        return np.load(os.path.join(
            self.preprocessed_path, f"{kind}{tag}",
            f"{speaker}-{kind}-{basename}.npy"))

    def __getitem__(self, idx):
        basename = self.basename[idx]
        speaker = self.speaker[idx]
        tag = self.dataset_tag
        pp = self.preprocessed_path

        keys = ["mel", "pitch", "f0", "energy"]
        paths = [
            os.path.join(pp, f"mel_{tag}", f"{speaker}-mel-{basename}.npy"),
            os.path.join(pp, f"pitch_{tag}",
                         f"{speaker}-pitch-{basename}.npy"),
            os.path.join(pp, f"f0_{tag}", f"{speaker}-f0-{basename}.npy"),
            os.path.join(pp, f"energy_{tag}_{self.energy_level_tag}",
                         f"{speaker}-energy-{basename}.npy"),
        ]
        if self.learn_alignment:
            if not self.on_device_prior:
                keys.append("attn_prior")
                paths.append(os.path.join(
                    pp, "attn_prior",
                    f"{speaker}-attn_prior-{basename}.npy"))
        else:
            keys += ["duration", "mel2ph"]
            paths += [os.path.join(pp, "duration",
                                   f"{speaker}-duration-{basename}.npy"),
                      os.path.join(pp, "mel2ph",
                                   f"{speaker}-mel2ph-{basename}.npy")]
        if self.pitch_type == "cwt":
            keys += ["cwt_spec", "_f0cwt_ms"]
            paths += [os.path.join(pp, f"cwt_spec_{tag}",
                                   f"{speaker}-cwt_spec-{basename}.npy"),
                      os.path.join(
                          pp, f"f0cwt_mean_std_{tag}",
                          f"{speaker}-f0cwt_mean_std-{basename}.npy")]
        if self.load_spker_embed:
            keys.append("spker_embed")
            paths.append(os.path.join(pp, "spker_embed",
                                      f"{speaker}-spker_embed.npy"))

        arrays = dict(zip(keys, self._load_many(paths)))
        sample = {
            "id": basename,
            "speaker": self.speaker_map[speaker],
            "text": np.array(text_to_sequence(self.text[idx], self.cleaners)),
            "raw_text": self.raw_text[idx],
            **{k: v for k, v in arrays.items() if not k.startswith("_")},
        }
        sample["f0"], sample["uv"] = norm_interp_f0(
            arrays["f0"], self.preprocess_config["preprocessing"]["pitch"])
        if self.pitch_type == "cwt":
            ms = arrays["_f0cwt_ms"]
            sample["f0_mean"], sample["f0_std"] = float(ms[0]), float(ms[1])
        return sample

    def _process_meta(self, filename):
        names, speakers, texts, raws = [], [], [], []
        with open(os.path.join(self.preprocessed_path, filename),
                  encoding="utf-8") as f:
            for line in f:
                n, s, t, r = line.strip("\n").split("|")
                names.append(n)
                speakers.append(s)
                texts.append(t)
                raws.append(r)
        return names, speakers, texts, raws

    # ---- batching -------------------------------------------------- #

    def collate(self, samples):
        """Pack a list of samples into one padded, bucketed batch dict."""
        B = len(samples)
        T_s = _round_up(max(s["text"].shape[0] for s in samples),
                        self.bucket_src)
        T_m = _round_up(max(s["mel"].shape[0] for s in samples),
                        self.bucket_mel)
        n_mel = samples[0]["mel"].shape[1]

        def pad1(key, dtype=np.float32, T=None):
            T = T or T_m
            out = np.zeros((B, T), dtype)
            for b, s in enumerate(samples):
                v = s[key]
                out[b, :len(v)] = v
            return out

        texts = np.zeros((B, T_s), np.int32)
        mels = np.zeros((B, T_m, n_mel), np.float32)
        src_lens = np.zeros(B, np.int32)
        mel_lens = np.zeros(B, np.int32)
        for b, s in enumerate(samples):
            texts[b, :len(s["text"])] = s["text"]
            mels[b, :len(s["mel"])] = s["mel"]
            src_lens[b] = len(s["text"])
            mel_lens[b] = len(s["mel"])

        pitch_data = {
            "pitch": pad1("pitch", np.int32),
            "f0": pad1("f0"),
            "uv": pad1("uv"),
        }
        if self.pitch_type == "cwt":
            cwt = np.zeros((B, T_m, 10), np.float32)
            for b, s in enumerate(samples):
                cwt[b, :len(s["cwt_spec"])] = s["cwt_spec"]
            pitch_data["cwt_spec"] = cwt
            pitch_data["f0_mean"] = np.array(
                [s["f0_mean"] for s in samples], np.float32)
            pitch_data["f0_std"] = np.array(
                [s["f0_std"] for s in samples], np.float32)

        batch = {
            "ids": [s["id"] for s in samples],
            "raw_texts": [s["raw_text"] for s in samples],
            "speakers": np.array([s["speaker"] for s in samples], np.int32),
            "texts": texts,
            "src_lens": src_lens,
            "mels": mels,
            "mel_lens": mel_lens,
            "pitch_data": pitch_data,
            "energies": pad1(
                "energy",
                T=T_s if self.energy_level_tag == "phone" else T_m),
            "durations": None,
            "attn_priors": None,
            "spker_embeds": None,
        }
        if self.learn_alignment:
            # on_device_prior leaves attn_priors None: the jitted step
            # computes it from (mel_lens, src_lens) (ops/attn_prior.py)
            if not self.on_device_prior:
                priors = np.zeros((B, T_m, T_s), np.float32)
                for b, s in enumerate(samples):
                    p = s["attn_prior"]      # stored [T_s,T_m] or [T_m,T_s]
                    if p.shape[0] == len(s["text"]):
                        p = p.T
                    m, t = min(p.shape[0], T_m), min(p.shape[1], T_s)
                    priors[b, :m, :t] = p[:m, :t]
                batch["attn_priors"] = priors
        else:
            batch["durations"] = pad1("duration", np.int32, T=T_s)
            pitch_data["mel2ph"] = pad1("mel2ph", np.int32)
        if self.load_spker_embed:
            batch["spker_embeds"] = np.concatenate(
                [s["spker_embed"] for s in samples], axis=0).astype(np.float32)
        return batch

    def batches(self, group_size=4, shuffle=True, seed=0, epoch=0,
                num_shards=1, shard=0):
        """Yield padded batch dicts; sort-by-length inside groups of
        group_size·batch_size (reference train.py:45-49, dataset.py:229-248).
        num_shards/shard give per-host sharding (DistributedSampler
        equivalent)."""
        idx = np.arange(len(self))
        if shuffle:
            rng = np.random.RandomState(seed + epoch)
            rng.shuffle(idx)
        idx = idx[shard::num_shards]
        group = group_size * self.batch_size
        for g0 in range(0, len(idx), group):
            chunk = idx[g0: g0 + group]
            samples = [self[i] for i in chunk]
            order = np.argsort([-len(s["text"]) for s in samples])
            samples = [samples[i] for i in order]
            for b0 in range(0, len(samples), self.batch_size):
                sub = samples[b0: b0 + self.batch_size]
                if len(sub) < self.batch_size and (self.drop_last
                                                   or len(sub) == 0):
                    continue
                yield self.collate(sub)


class TextDataset:
    """Inference dataset: metadata txt → (id, speaker, phones, raw, embed)
    (reference dataset.py:251-310)."""

    def __init__(self, filepath, preprocess_config, model_config):
        self.cleaners = preprocess_config["preprocessing"]["text"]["text_cleaners"]
        self.preprocessed_path = preprocess_config["path"]["preprocessed_path"]
        self.load_spker_embed = (
            model_config["multi_speaker"]
            and preprocess_config["preprocessing"].get(
                "speaker_embedder", "none") != "none")
        self.basename, self.speaker, self.text, self.raw_text = \
            self._process_meta(filepath)
        with open(os.path.join(self.preprocessed_path, "speakers.json")) as f:
            self.speaker_map = json.load(f)

    def __len__(self):
        return len(self.text)

    def __getitem__(self, idx):
        speaker = self.speaker[idx]
        spker_embed = np.load(os.path.join(
            self.preprocessed_path, "spker_embed",
            f"{speaker}-spker_embed.npy")) if self.load_spker_embed else None
        return (self.basename[idx], self.speaker_map[speaker],
                np.array(text_to_sequence(self.text[idx], self.cleaners)),
                self.raw_text[idx], spker_embed)

    def _process_meta(self, filename):
        names, speakers, texts, raws = [], [], [], []
        with open(filename, encoding="utf-8") as f:
            for line in f:
                n, s, t, r = line.strip("\n").split("|")
                names.append(n)
                speakers.append(s)
                texts.append(t)
                raws.append(r)
        return names, speakers, texts, raws

    def batches(self, batch_size=8, bucket_src=32):
        for b0 in range(0, len(self), batch_size):
            items = [self[i] for i in range(b0, min(b0 + batch_size,
                                                    len(self)))]
            B = len(items)
            T_s = _round_up(max(len(it[2]) for it in items), bucket_src)
            texts = np.zeros((B, T_s), np.int32)
            src_lens = np.zeros(B, np.int32)
            for b, it in enumerate(items):
                texts[b, :len(it[2])] = it[2]
                src_lens[b] = len(it[2])
            spker = (np.concatenate([it[4] for it in items], axis=0)
                     if self.load_spker_embed else None)
            yield {
                "ids": [it[0] for it in items],
                "raw_texts": [it[3] for it in items],
                "speakers": np.array([it[1] for it in items], np.int32),
                "texts": texts,
                "src_lens": src_lens,
                "spker_embeds": spker,
            }
