"""Training CLI (reference surface: train.py --dataset D --restore_step N).

Single-controller JAX replaces the reference's mp.spawn/DDP/NCCL runtime
(train.py:27-58, 251-252): one process drives a ('data','model') mesh, XLA
inserts the gradient all-reduce, bf16 compute replaces AMP, and the whole
train step (model fwd/bwd + MAS + losses + optimizer) is ONE compiled
function per batch bucket.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        help="name of dataset (configs/<dataset>.yaml)")
    parser.add_argument("--restore_step", type=int, default=0)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="override total_step (smoke runs)")
    parser.add_argument("--config_dir", type=str, default=None)
    parser.add_argument("--profile_steps", type=str, default=None,
                        help="START:END step range to capture a jax.profiler"
                             " trace into log_path/profile")
    parser.add_argument("--vocoder_ckpt", type=str, default="ckpt")
    # multi-host launch (one process per host; reference mp.spawn/DDP
    # equivalent, ref train.py:30-35). Also settable via CTTS_COORDINATOR /
    # CTTS_NUM_PROCESSES / CTTS_PROCESS_ID env vars.
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 for multi-host runs")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    from ctts_tpu.parallel.mesh import init_distributed
    init_distributed(args.coordinator, args.num_processes, args.process_id)

    from ctts_tpu.config import get_configs_of
    from ctts_tpu.data.dataset import Dataset
    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.parallel.mesh import (make_mesh, shard_batch, shard_params,
                                        check_tp_coverage)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_eval_step, make_train_step,
                                              prep_batch)
    from ctts_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
    from ctts_tpu.utils.logging import Logger
    from ctts_tpu.utils.optimizer import build_optimizer
    from ctts_tpu.models.registry import block_hidden

    preprocess_config, model_config, train_config = get_configs_of(
        args.dataset, args.config_dir)
    model_config = prepare_model_config(preprocess_config, model_config)

    learn_alignment = model_config["duration_modeling"]["learn_alignment"]
    mode = "train_unsup" if learn_alignment else "train_sup"
    tag = "unsup" if learn_alignment else "sup"

    train_set = Dataset(f"train_{tag}.txt", preprocess_config, model_config,
                        train_config, sort=True, drop_last=True)
    val_set = Dataset(f"val_{tag}.txt", preprocess_config, model_config,
                      train_config, sort=False, drop_last=False)

    mesh_cfg = train_config.get("mesh", {"data": -1, "model": 1})
    mesh = make_mesh(mesh_cfg.get("data", -1), mesh_cfg.get("model", 1))

    model = CompTransTTS(preprocess_config, model_config, train_config)
    enc_h, _ = block_hidden(model_config)
    tx, schedule = build_optimizer(model_config, train_config, d_model=enc_h)

    # init from the first batch's shapes
    first = next(train_set.batches(shuffle=False))
    # fills the on-device beta-binomial prior when the loader skips it
    # (train.on_device_prior) — init needs real kwargs shapes
    first = prep_batch(first, preprocess_config, mode)
    init_kwargs = _model_kwargs(first, mode)
    variables = model.init({"params": jax.random.PRNGKey(
        train_config["seed"])}, **init_kwargs, step=jnp.zeros((), jnp.int32),
        deterministic=True)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"CompTransTTS: {n_params/1e6:.2f}M params | mesh {mesh.shape} | "
          f"block={model_config['block_type']} mode={mode} "
          f"prosody={model_config['prosody_modeling']['model_type']} "
          f"pitch={preprocess_config['preprocessing']['pitch']['pitch_type']}")

    with mesh:
        check_tp_coverage(variables, mesh, model_config["block_type"])
        variables = shard_params(variables, mesh)
        state = create_train_state(variables, tx)
        ckpt_dir = train_config["path"]["ckpt_path"]
        if args.restore_step:
            state, restored = restore_checkpoint(ckpt_dir, state,
                                                 args.restore_step)
            print(f"restored checkpoint at step {restored}")

        train_step = make_train_step(model, tx, preprocess_config,
                                     model_config, train_config, mode)
        eval_step = make_eval_step(model, preprocess_config, model_config,
                                   train_config, mode)

        # device-resident corpus cache (train.device_cache_mb): when the
        # preprocessed store fits the budget, upload it once and gather
        # batches on device by index — per-step H2D drops to a [B] int32
        # vector and the loop runs at bare-jitted-step speed regardless of
        # host-link bandwidth (ctts_tpu/data/device_cache.py)
        cache = None
        cache_budget = int(train_config.get("device_cache_mb", 0) or 0)
        if (cache_budget > 0 and jax.process_count() == 1
                and (not learn_alignment
                     or train_config.get("on_device_prior", False))):
            from ctts_tpu.data.device_cache import DeviceCache
            dc = DeviceCache(train_set,
                             train_config.get("transfer_dtype", "float32"))
            if dc.nbytes <= cache_budget * 2**20:
                dc.put()
                cache = dc
                from ctts_tpu.parallel.train_step import (
                    make_cached_train_step)
                cached_step = make_cached_train_step(
                    model, tx, preprocess_config, model_config,
                    train_config, mode,
                    energy_on_src=train_set.energy_level_tag == "phone",
                    mesh=mesh)
                print(f"device cache: {len(train_set)} utterances, "
                      f"{dc.nbytes / 2**20:.0f} MiB resident in HBM")
            else:
                print(f"device cache skipped: store "
                      f"{dc.nbytes / 2**20:.0f} MiB > budget "
                      f"{cache_budget} MiB — streaming loader")

        log_path = train_config["path"]["log_path"]
        train_logger = Logger(log_path, "train")
        val_logger = Logger(log_path, "val")
        profile_range = (tuple(map(int, args.profile_steps.split(":")))
                         if args.profile_steps else None)
        from ctts_tpu.utils.model import get_vocoder
        vocoder = get_vocoder(model_config, args.vocoder_ckpt)

        total_step = args.max_steps or train_config["step"]["total_step"]
        log_step = train_config["step"]["log_step"]
        val_step = train_config["step"]["val_step"]
        synth_step = train_config["step"]["synth_step"]
        save_step = train_config["step"]["save_step"]
        rng = jax.random.PRNGKey(train_config["seed"])

        # host-side step counter: state.step increments identically on
        # device, so the loop never reads it back (int(state.step) every
        # step was a blocking device->host sync that serialized dispatch —
        # the same bug class as CLAUDE.md TIMING TRAP #3). One sync here
        # covers the restore offset.
        step = int(state.step)
        epoch = 0
        t_last = time.time()
        done = False
        # train.transfer_dtype: float16 halves the host->device bytes of
        # every float32 batch field (the jitted step upcasts on device —
        # prep_batch in parallel/train_step.py); the cast runs on the
        # prefetch thread so it overlaps device execution
        transfer_dtype = train_config.get("transfer_dtype", "float32")
        compress = (_compress_f16 if transfer_dtype == "float16"
                    else (lambda b: b))
        while not done:
            from ctts_tpu.data.dataset import prefetch_iter
            # per-host sharding (DistributedSampler equivalent,
            # reference train.py:44)
            if cache is not None:
                batch_iter = cache.index_batches(
                    epoch=epoch, seed=train_config["seed"],
                    num_shards=jax.process_count(),
                    shard=jax.process_index())
            else:
                # double-buffered H2D: compress + device_put run on the
                # prefetch thread, so batch N+1's transfer overlaps step N's
                # device execution instead of blocking the dispatch loop
                # (the per-step blocking device_put was the dominant e2e
                # tax on slow host links — E2E_TRAIN_BENCH.json)
                def _stage(b):
                    b = compress(b)
                    return b, shard_batch(_device_batch(b), mesh)
                batch_iter = prefetch_iter(
                    map(_stage,
                        train_set.batches(epoch=epoch,
                                          seed=train_config["seed"],
                                          num_shards=jax.process_count(),
                                          shard=jax.process_index())))
            for batch in batch_iter:
                if cache is not None:
                    idx, T_s, T_m = batch
                    raw_batch, batch = None, None
                else:
                    raw_batch, batch = batch
                if profile_range and step + 1 == profile_range[0]:
                    jax.profiler.start_trace(
                        os.path.join(log_path, "profile"))
                if cache is not None:
                    state, metrics = cached_step(state, cache.arrays, idx,
                                                 rng, T_s, T_m)
                else:
                    state, metrics = train_step(state, batch, rng)
                step += 1
                if profile_range and step == profile_range[1]:
                    jax.block_until_ready(metrics["total"])
                    jax.profiler.stop_trace()

                if step % log_step == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    lr = float(schedule(jnp.asarray(step)))
                    dt = (time.time() - t_last) / log_step
                    t_last = time.time()
                    metrics["s_per_step"] = dt
                    train_logger.scalars(step, metrics, lr=lr)
                    print(f"step {step}: total={metrics['total']:.4f} "
                          f"mel={metrics['mel']:.4f} lr={lr:.2e} "
                          f"{dt*1000:.0f}ms/step")

                if step % synth_step == 0:
                    if cache is not None:
                        # materialize this index-batch through the normal
                        # host collate (rare: synth_step cadence only)
                        raw_batch = train_set.collate(
                            [train_set[int(i)] for i in idx])
                        batch = shard_batch(_device_batch(raw_batch), mesh)
                    _synth_preview(eval_step, state, batch, raw_batch,
                                   vocoder, preprocess_config, model_config,
                                   train_logger, step)
                if step % val_step == 0:
                    _validate(val_set, state, eval_step, mesh, val_logger,
                              step)
                if step % save_step == 0:
                    _save_ckpt(save_checkpoint, ckpt_dir, state, step)
                    print(f"saved checkpoint @ {step}")
                if step >= total_step:
                    done = True
                    break
            epoch += 1
        _save_ckpt(save_checkpoint, ckpt_dir, state, step)
        train_logger.close()
        val_logger.close()


def _save_ckpt(save_checkpoint, ckpt_dir, state, step):
    """Multihost-safe save: gather sharded leaves (per-leaf, so
    fully-addressable leaves keep their shape — utils/checkpoint.py
    gather_for_save), write from process 0 only."""
    from ctts_tpu.utils.checkpoint import gather_for_save
    state = gather_for_save(state)
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    save_checkpoint(ckpt_dir, state, step)


def _model_kwargs(batch, mode):
    return dict(
        speakers=jnp.asarray(batch["speakers"]),
        texts=jnp.asarray(batch["texts"]),
        src_lens=jnp.asarray(batch["src_lens"]),
        mode=mode,
        mels=jnp.asarray(batch["mels"]),
        mel_lens=jnp.asarray(batch["mel_lens"]),
        pitch_targets={k: jnp.asarray(v)
                       for k, v in batch["pitch_data"].items()},
        energy_targets=jnp.asarray(batch["energies"]),
        duration_targets=(jnp.asarray(batch["durations"])
                          if batch["durations"] is not None else None),
        attn_priors=(jnp.asarray(batch["attn_priors"])
                     if batch["attn_priors"] is not None else None),
        spker_embeds=(jnp.asarray(batch["spker_embeds"])
                      if batch["spker_embeds"] is not None else None),
    )


def _device_batch(batch):
    return {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}


def _compress_f16(batch):
    """Half-precision transfer cast (train.transfer_dtype: float16), run on
    the prefetch thread. The device upcasts back to f32 inside the jitted
    step (prep_batch); log-mel quantization at f16 is ~1e-3 absolute —
    far below training noise — and it halves the per-step H2D bytes."""
    out = dict(batch)
    for k, v in out.items():
        if k == "pitch_data" and isinstance(v, dict):
            out[k] = {pk: (pv.astype(np.float16)
                           if getattr(pv, "dtype", None) == np.float32
                           else pv) for pk, pv in v.items()}
        elif getattr(v, "dtype", None) == np.float32:
            out[k] = v.astype(np.float16)
    return out


def _synth_preview(eval_step, state, batch, raw_batch, vocoder,
                   preprocess_config, model_config, logger, step):
    """One training sample: the reference's full debugging surface —
    mel pair (+ liu2021 prosody alignment), f0 contour overlays (gt /
    cwt-reconstructed / predicted), energy contours, soft/hard/prior
    attention trio, reconstructed + synthesized audio (reference
    train.py:142-179 via utils/tools.py synth_one_sample:206-313)."""
    try:
        from ctts_tpu.utils.figures import synth_sample_figures
        from ctts_tpu.utils.model import vocoder_infer
        from ctts_tpu.parallel.train_step import prep_batch
        import matplotlib.pyplot as plt

        if batch.get("attn_priors") is None and batch.get("durations") is None:
            # on_device_prior mode: materialize the prior once so the
            # soft/hard/prior attention trio keeps its prior panel
            batch = prep_batch(batch, preprocess_config, "train_unsup")
        comps, out = eval_step(state, batch)
        i = 0
        mel_len = int(np.asarray(out["mel_lens"])[i])
        mel_pred = np.asarray(out["postnet_mel_predictions"])[i, :mel_len]
        figs, fig_attn = synth_sample_figures(
            batch, out, preprocess_config, model_config, idx=i)
        base = raw_batch["ids"][i]
        for name, fig in figs.items():
            logger.figure(f"Training/step_{step}_{base}_{name}", fig, step)
            plt.close(fig)
        if fig_attn is not None:
            logger.figure(f"Training/attn_{step}", fig_attn, step)
            plt.close(fig_attn)
        if vocoder[0] != "griffin_lim":
            wavs = vocoder_infer(mel_pred[None], vocoder, preprocess_config,
                                 lengths=[mel_len])
            logger.audio(f"Training/step_{step}_synthesized",
                         wavs[0].astype(np.float32) / 32768.0, step)
    except Exception as e:  # previews must never kill training
        print(f"  (synth preview skipped: {type(e).__name__}: {e})")


def _validate(val_set, state, eval_step, mesh, logger, step):
    from ctts_tpu.parallel.mesh import shard_batch
    sums, count = {}, 0
    for batch in val_set.batches(shuffle=False, group_size=1):
        n = len(batch["ids"])
        db = shard_batch(_device_batch(batch), mesh)
        comps, _ = eval_step(state, db)
        for k, v in comps.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n
        count += n
    if count:
        means = {k: v / count for k, v in sums.items()}
        logger.scalars(step, means)
        print(f"  val @ {step}: " + ", ".join(
            f"{k}={v:.4f}" for k, v in list(means.items())[:4]))


if __name__ == "__main__":
    main()
