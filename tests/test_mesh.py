"""Mesh parallelism correctness on the 8-virtual-device CPU backend:
tensor-parallel sharding must not change the math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import tiny_configs, synth_batch


def _train_once(mesh_shape, seed=0, block_type="transformer_fs2",
                prosody="none"):
    from ctts_tpu.models.comp_trans_tts import CompTransTTS
    from ctts_tpu.parallel.mesh import (make_mesh, shard_batch, shard_params,
                                        check_tp_coverage)
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    data, model_axis = mesh_shape
    mesh = make_mesh(data=data, model=model_axis)
    if prosody == "none":
        mode = "train_unsup"
        pre, mod, tr = tiny_configs(block_type=block_type)
        batch = synth_batch(B=8, T_s=12, T_m=32)
    else:
        # prosody models require supervised durations (ref model.yaml:11,19)
        mode = "train_sup"
        pre, mod, tr = tiny_configs(block_type=block_type,
                                    learn_alignment=False, prosody=prosody,
                                    pitch_type="frame",
                                    energy_feature="frame_level")
        tr["prosody"]["prosody_loss_enable_steps"] = 0   # gate open at step 1
        batch = synth_batch(B=8, T_s=12, T_m=32, pitch_type="frame",
                            sup=True)
    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode=mode,
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        pitch_targets=batch["pitch_data"], energy_targets=batch["energies"],
        duration_targets=batch["durations"],
        attn_priors=batch["attn_priors"] if mode == "train_unsup" else None,
        step=jnp.zeros((), jnp.int32), deterministic=True)
    model = CompTransTTS(pre, mod, tr)
    variables = model.init({"params": jax.random.PRNGKey(seed)}, **kwargs)
    tx, _ = build_optimizer(mod, tr)
    with mesh:
        if model_axis > 1:
            check_tp_coverage(variables, mesh, block_type)
        variables = shard_params(variables, mesh)
        state = create_train_state(variables, tx)
        db = shard_batch({k: v for k, v in batch.items()
                          if k not in ("ids", "raw_texts")}, mesh)
        step_fn = make_train_step(model, tx, pre, mod, tr, mode,
                                  donate=False)
        losses = []
        for _ in range(2):
            state, metrics = step_fn(state, db, jax.random.PRNGKey(1))
            losses.append(float(metrics["total"]))
    return losses


@pytest.mark.parametrize("block_type", [
    "transformer_fs2", "transformer", "fastformer", "lstransformer",
    "conformer", "reformer"])
def test_tensor_parallel_matches_data_parallel(block_type):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dp = _train_once((8, 1), block_type=block_type)
    tp = _train_once((4, 2), block_type=block_type)
    np.testing.assert_allclose(dp, tp, rtol=5e-4)


@pytest.mark.parametrize("prosody", ["du2021", "liu2021"])
def test_prosody_tensor_parallel_matches_data_parallel(prosody):
    """Prosody models (AR-GRU MDN / reference-encoder stacks, replicated
    params by design — TP shards only the big blocks) through the
    supervised train step with the prosody loss gate open: the mesh must
    not change the math, including the BatchNorm batch-pooled stats."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    dp = _train_once((8, 1), prosody=prosody)
    tp = _train_once((4, 2), prosody=prosody)
    np.testing.assert_allclose(dp, tp, rtol=5e-4)


def _infer_once(mesh_shape=None, block_type="transformer_fs2"):
    from ctts_tpu.models.comp_trans_tts import CompTransTTS
    from ctts_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

    pre, mod, tr = tiny_configs(block_type=block_type)
    model = CompTransTTS(pre, mod, tr)
    batch = synth_batch(B=8, T_s=12, T_m=32)
    kwargs = dict(speakers=batch["speakers"], texts=batch["texts"],
                  src_lens=batch["src_lens"], mode="infer", max_mel_len=32,
                  deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)

    def run(v, speakers, texts, src_lens):
        return model.apply(v, speakers=speakers, texts=texts,
                           src_lens=src_lens, mode="infer", max_mel_len=32,
                           deterministic=True)

    if mesh_shape is None:
        out = jax.jit(run)(variables, batch["speakers"], batch["texts"],
                           batch["src_lens"])
    else:
        mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
        with mesh:
            v = shard_params(variables, mesh)
            db = shard_batch({k: batch[k]
                              for k in ("speakers", "texts", "src_lens")},
                             mesh)
            out = jax.jit(run)(v, db["speakers"], db["texts"],
                               db["src_lens"])
    return (np.asarray(out["postnet_mel_predictions"]),
            np.asarray(out["mel_lens"]))


def test_sharded_inference_matches_single_device():
    """Batch inference sharded over the mesh (the serving scale-out path:
    shard_params + shard_batch + plain jit, XLA inserts the collectives)
    returns the single-device outputs for both dp8 and dp4xtp2."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mel0, lens0 = _infer_once(None)
    for shape in ((8, 1), (4, 2)):
        mel, lens = _infer_once(shape)
        np.testing.assert_array_equal(lens, lens0)
        np.testing.assert_allclose(mel, mel0, atol=5e-4)


def test_tp_coverage_guard_rejects_unruled_params():
    """model>1 with zero TP-rule hits must fail fast, not silently
    replicate."""
    from ctts_tpu.parallel.mesh import make_mesh, check_tp_coverage
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=len(jax.devices()) // 2, model=2)
    fake = {"params": {"some_layer": {"kernel": np.zeros((8, 8))}}}
    with pytest.raises(ValueError, match="tensor-parallel"):
        check_tp_coverage(fake, mesh, "nothing_matches")
    # and a dp-only mesh never raises
    dp_mesh = make_mesh(data=len(jax.devices()), model=1)
    assert check_tp_coverage(fake, dp_mesh) == 0


def test_param_sharding_rules_hit_ffn_and_attention():
    from ctts_tpu.parallel.mesh import param_spec
    
    class K:                      # fake DictKey
        def __init__(self, key):
            self.key = key

    leaf = np.zeros((9, 32, 128))
    spec = param_spec([K("encoder"), K("fft"), K("layers_0"), K("ffn"),
                       K("ffn_1"), K("Conv_0"), K("kernel")], leaf)
    assert spec == jax.sharding.PartitionSpec(None, None, "model")
    leaf_q = np.zeros((32, 2, 16))
    spec_q = param_spec([K("encoder"), K("fft"), K("layers_0"),
                         K("self_attn"), K("q"), K("kernel")], leaf_q)
    assert spec_q == jax.sharding.PartitionSpec(None, "model", None)
