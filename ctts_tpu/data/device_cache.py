"""Device-resident dataset cache: upload the corpus once, gather batches
on device by index.

The train loop's per-step host->device traffic is the padded batch
(~2-9 MB at batch 16 depending on transfer_dtype). When the preprocessed
corpus fits in HBM — LJSpeech's 13k utterances are ~2 GB of f16 mels
against 16 GB on a v5e chip — the TPU-native input pipeline is to ship
the WHOLE store once and reduce the per-step transfer to a [B] int32
index vector: the jitted step gathers its batch rows from the cache and
slices them to the bucket shape in-graph (one HBM->HBM DMA, ~microseconds).
The host stays free for logging/checkpointing.

MEASURED on the real chip (E2E_TRAIN_BENCH.json, tools/bench_train_e2e.py,
172 real utterances, 1000 steps at batch 16): the full train.py loop runs
at 29.2 +/- 0.4 ms/step vs a 27.3 ms weighted bare jitted step —
e2e_over_jitted 1.07, where the streaming loader on the same tunneled
~30 MB/s host link measured 10.4x in round 4. Enabled by
train.device_cache_mb in the shipped configs.

The reference has no analogue (its DataLoader re-collates and re-ships
every batch, reference dataset.py:229-248 + train.py:93-110).

Batch composition is EXACTLY Dataset.batches(): `index_batches` replays
the same shuffle/shard/sort-group/bucket logic from length tables
recorded at build time, and `gather_batch` reproduces collate()'s padded
arrays (tests/test_device_cache.py asserts bit-equality against the
streaming loader).
"""

import numpy as np
import jax
import jax.numpy as jnp


def _round_up(n, k):
    return ((n + k - 1) // k) * k


class DeviceCache:
    """Build from a Dataset, then iterate (idx, T_s, T_m) via
    index_batches and materialize batches in-graph via gather_batch."""

    def __init__(self, dataset, transfer_dtype="float16"):
        self.ds = dataset
        self.float_t = (np.float16 if transfer_dtype == "float16"
                        else np.float32)
        n = len(dataset)
        samples = [dataset[i] for i in range(n)]
        self.src_lens = np.array([len(s["text"]) for s in samples], np.int32)
        self.mel_lens = np.array([len(s["mel"]) for s in samples], np.int32)
        # global padding is bucket-rounded so every per-batch bucket shape
        # (also bucket-rounded) is a prefix slice of the cached rows
        S = _round_up(int(self.src_lens.max()), dataset.bucket_src)
        M = _round_up(int(self.mel_lens.max()), dataset.bucket_mel)
        n_mel = samples[0]["mel"].shape[1]
        ft = self.float_t

        def pad_to(key, T, dtype):
            out = np.zeros((n, T), dtype)
            for i, s in enumerate(samples):
                v = s[key]
                out[i, :len(v)] = v
            return out

        host = {
            "speakers": np.array([s["speaker"] for s in samples], np.int32),
            "texts": pad_to("text", S, np.int32),
            "src_lens": self.src_lens,
            "mel_lens": self.mel_lens,
        }
        mels = np.zeros((n, M, n_mel), ft)
        for i, s in enumerate(samples):
            mels[i, :len(s["mel"])] = s["mel"]
        host["mels"] = mels
        host["energies"] = pad_to(
            "energy", S if dataset.energy_level_tag == "phone" else M, ft)
        pitch = {
            "pitch": pad_to("pitch", M, np.int32),
            "f0": pad_to("f0", M, ft),
            "uv": pad_to("uv", M, ft),
        }
        if dataset.pitch_type == "cwt":
            cwt = np.zeros((n, M, 10), ft)
            for i, s in enumerate(samples):
                cwt[i, :len(s["cwt_spec"])] = s["cwt_spec"]
            pitch["cwt_spec"] = cwt
            pitch["f0_mean"] = np.array([s["f0_mean"] for s in samples], ft)
            pitch["f0_std"] = np.array([s["f0_std"] for s in samples], ft)
        if not dataset.learn_alignment:
            host["durations"] = pad_to("duration", S, np.int32)
            pitch["mel2ph"] = pad_to("mel2ph", M, np.int32)
        if dataset.learn_alignment and not dataset.on_device_prior:
            raise ValueError(
                "device_cache requires train.on_device_prior: caching "
                "[N, M, S] host priors would defeat the point — the jitted "
                "step computes them from lengths (ops/attn_prior.py)")
        if dataset.load_spker_embed:
            host["spker_embeds"] = np.concatenate(
                [s["spker_embed"] for s in samples], axis=0).astype(ft)
        host["pitch_data"] = pitch
        self.ids = [s["id"] for s in samples]
        self.raw_texts = [s["raw_text"] for s in samples]
        self.nbytes = sum(a.nbytes for a in jax.tree.leaves(host))
        self._host = host
        self.arrays = None                    # set by put()

    def put(self):
        """Upload the cache (replicated; the gather output is sharded by
        the caller's with_sharding_constraint / pjit propagation)."""
        self.arrays = jax.device_put(self._host)
        return self.arrays

    def index_batches(self, group_size=4, shuffle=True, seed=0, epoch=0,
                      num_shards=1, shard=0):
        """(idx[B] int32, T_s, T_m) stream replaying Dataset.batches()'s
        composition exactly (same shuffle, shard, sort-group, bucketing,
        drop_last) from the recorded length tables."""
        ds = self.ds
        idx = np.arange(len(ds))
        if shuffle:
            rng = np.random.RandomState(seed + epoch)
            rng.shuffle(idx)
        idx = idx[shard::num_shards]
        group = group_size * ds.batch_size
        for g0 in range(0, len(idx), group):
            chunk = idx[g0: g0 + group]
            order = np.argsort([-self.src_lens[i] for i in chunk])
            chunk = chunk[order]
            for b0 in range(0, len(chunk), ds.batch_size):
                sub = chunk[b0: b0 + ds.batch_size]
                if len(sub) < ds.batch_size and (ds.drop_last
                                                 or len(sub) == 0):
                    continue
                T_s = _round_up(int(self.src_lens[sub].max()),
                                ds.bucket_src)
                T_m = _round_up(int(self.mel_lens[sub].max()),
                                ds.bucket_mel)
                yield sub.astype(np.int32), T_s, T_m


def gather_batch(cache, idx, T_s, T_m, energy_on_src):
    """In-graph batch materialization: rows `idx` of the cache, sliced to
    the (T_s, T_m) bucket. Pure jnp — call inside the jitted step. Rows
    are zero beyond each utterance's own length, so slicing the globally
    padded rows reproduces collate()'s per-batch padding bit-for-bit.
    energy_on_src: True when the store's energies are phone-level
    (Dataset.energy_level_tag == "phone")."""
    def take(a):
        return jnp.take(a, idx, axis=0)

    pitch = {}
    for k, v in cache["pitch_data"].items():
        g = take(v)
        if k in ("pitch", "f0", "uv", "mel2ph"):
            g = g[:, :T_m]
        elif k == "cwt_spec":
            g = g[:, :T_m, :]
        pitch[k] = g
    batch = {
        "speakers": take(cache["speakers"]),
        "texts": take(cache["texts"])[:, :T_s],
        "src_lens": take(cache["src_lens"]),
        "mels": take(cache["mels"])[:, :T_m, :],
        "mel_lens": take(cache["mel_lens"]),
        "pitch_data": pitch,
        "energies": take(cache["energies"])[:, :T_s if energy_on_src
                                            else T_m],
        "durations": (take(cache["durations"])[:, :T_s]
                      if "durations" in cache else None),
        "attn_priors": None,
        "spker_embeds": (take(cache["spker_embeds"])
                         if "spker_embeds" in cache else None),
    }
    return batch
