"""Gradient accumulation (optax.MultiSteps wired by utils/optimizer.py,
reference grad_acc_step semantics, ref train.py:68,112,118).

k accumulated micro-steps must equal one optimizer step on the mean
gradient, params must stay frozen mid-accumulation, and the full
train_step must compose with an accumulating optimizer.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from helpers import tiny_configs, synth_batch


def _tree_allclose(a, b, rtol=1e-6, atol=1e-7):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)


def test_multisteps_equals_mean_grad_step():
    from ctts_tpu.utils.optimizer import build_optimizer
    _, mod, tr = tiny_configs()
    tr = copy.deepcopy(tr)
    k = 3
    tr["optimizer"]["grad_acc_step"] = k
    tx_acc, _ = build_optimizer(mod, tr)
    tr["optimizer"]["grad_acc_step"] = 1
    tx_one, _ = build_optimizer(mod, tr)

    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(4, 8), jnp.float32),
              "b": jnp.asarray(rng.randn(8), jnp.float32)}
    grads = [{"w": jnp.asarray(rng.randn(4, 8), jnp.float32),
              "b": jnp.asarray(rng.randn(8), jnp.float32)}
             for _ in range(k)]
    mean_grad = jax.tree.map(lambda *g: sum(g) / k, *grads)

    # accumulate k micro-steps
    p, s = params, tx_acc.init(params)
    for i, g in enumerate(grads):
        u, s = tx_acc.update(g, s, p)
        p_next = optax.apply_updates(p, u)
        if i < k - 1:       # mid-accumulation: the update must be a no-op
            _tree_allclose(p_next, p, rtol=0, atol=0)
        p = p_next

    # one step on the mean gradient
    s1 = tx_one.init(params)
    u1, _ = tx_one.update(mean_grad, s1, params)
    p_ref = optax.apply_updates(params, u1)
    _tree_allclose(p, p_ref, rtol=1e-5, atol=1e-6)


def test_train_step_composes_with_accumulation():
    """Full train_step with grad_acc_step=2: the first micro-step leaves
    params untouched, the second applies an update; two micro-steps with
    the SAME batch ≡ one step of the non-accumulating optimizer."""
    from ctts_tpu.models.comp_trans_tts import CompTransTTS
    from ctts_tpu.parallel.train_step import (create_train_state,
                                              make_train_step)
    from ctts_tpu.utils.optimizer import build_optimizer

    pre, mod, tr = tiny_configs()
    tr = copy.deepcopy(tr)

    def zero_dropout(node):
        if isinstance(node, dict):
            for key, v in node.items():
                if isinstance(v, dict):
                    zero_dropout(v)
                elif "dropout" in key and isinstance(v, float):
                    node[key] = 0.0
    zero_dropout(mod)
    model = CompTransTTS(pre, mod, tr)
    batch = synth_batch(B=2, T_s=11, T_m=40)
    kwargs = dict(
        speakers=batch["speakers"], texts=batch["texts"],
        src_lens=batch["src_lens"], mode="train_unsup",
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        pitch_targets=batch["pitch_data"], energy_targets=batch["energies"],
        duration_targets=None, attn_priors=batch["attn_priors"],
        step=jnp.zeros((), jnp.int32), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)

    db = {k: v for k, v in batch.items() if k not in ("ids", "raw_texts")}
    rng = jax.random.PRNGKey(7)

    def run(acc_k, n_steps):
        tr2 = copy.deepcopy(tr)
        tr2["optimizer"]["grad_acc_step"] = acc_k
        tx, _ = build_optimizer(mod, tr2)
        state = create_train_state(variables, tx)
        step_fn = make_train_step(model, tx, pre, mod, tr2, "train_unsup",
                                  donate=False)
        snaps = []
        for _ in range(n_steps):
            # dropout is zeroed above, so the rng value is irrelevant and
            # both micro-steps see identical gradients
            state, _ = step_fn(state, db, rng)
            snaps.append(state.params)
        return snaps

    acc = run(2, 2)
    one = run(1, 1)
    # micro-step 1 of 2: params frozen
    _tree_allclose(acc[0], variables["params"], rtol=0, atol=0)
    # after micro-step 2: same update as one plain step on the same grads.
    # atol covers 2·lr(step1): for a ~0 gradient element Adam's first-step
    # update is ±lr·sign(g) and fp noise in the accumulated mean can flip
    # the sign.
    _tree_allclose(acc[1], one[0], rtol=2e-4, atol=2.5e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
