"""Output parity vs the reference PyTorch zoo blocks with ported weights.

Extends the fs2/classic full-model parity (tests/test_parity_torch.py) to the
remaining four blocks:

- fastformer / conformer: FULL CompTransTTS forward parity via
  import_reference_checkpoint. The fastformer case runs without padding
  because the reference feeds an inverted mask into FastAttention
  (fastformer.py:299-301 expects 1-at-valid but receives True-at-padding);
  with equal lengths the mask is a uniform shift and both sides agree.
- reformer: encoder+decoder parity with deterministic LSH hash rotations
  injected on both sides (torch.randn monkeypatch / lsh_rot kwarg).
- lstransformer: LongShortAttention component parity with the INTENDED mask
  convention (the reference stack wires the padding mask into code expecting
  a validity mask, lstransformer.py:322-358 — a latent bug this framework
  fixes, so stack-level parity is impossible by construction). The stack
  wiring itself (PreNorm + residual + zero-fill + conv-gelu FFN) is shared
  with fastformer, which IS full-model tested.

The reference's third-party torch deps (rotary-embedding-torch,
local-attention) are reimplemented functionally in tests/ref_stubs.py.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from test_parity_torch import ref_env, _ref_configs  # noqa: F401


def _mae(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).mean())


def _batch(B=2, T_s=12, T_m=40, seed=0, padded=False):
    rng = np.random.RandomState(seed)
    src_lens = np.array([T_s, T_s - (3 if padded else 0)])
    mel_lens = np.array([T_m, T_m - (5 if padded else 0)])
    texts = np.zeros((B, T_s), np.int64)
    durations = np.zeros((B, T_s), np.int64)
    mel2ph = np.zeros((B, T_m), np.int64)
    for b in range(B):
        L, M = src_lens[b], mel_lens[b]
        texts[b, :L] = rng.randint(1, 300, size=L)
        durations[b, :L] = rng.multinomial(M - L, np.ones(L) / L) + 1
        m2p = np.repeat(np.arange(1, L + 1), durations[b, :L])
        mel2ph[b, :len(m2p)] = m2p
    mels = rng.randn(B, T_m, 80).astype(np.float32) - 4
    f0 = np.abs(rng.randn(B, T_m).astype(np.float32)) * 0.4 + 7.0
    uv = (rng.rand(B, T_m) < 0.2).astype(np.float32)
    energy = rng.rand(B, T_m).astype(np.float32) * 6 - 1
    for b, L in enumerate(mel_lens):
        mels[b, L:] = 0
        f0[b, L:] = 0
        uv[b, L:] = 0
        energy[b, L:] = 0
    return dict(texts=texts, src_lens=src_lens, mel_lens=mel_lens,
                durations=durations, mel2ph=mel2ph, mels=mels, f0=f0, uv=uv,
                energy=energy)


@pytest.mark.parametrize("block,padded", [("fastformer", False),
                                          ("conformer", True),
                                          ("lstransformer", True)])
def test_full_model_parity(ref_env, block, padded):
    # lstransformer: the reference wires the True-at-padding mask into
    # attention code expecting True-at-valid (lstransformer.py:322,334,358);
    # `replicate_mask_bug` flips our (default-correct) convention back so
    # ported-weight parity can be asserted on PADDED batches — pinning the
    # weight port and the whole surrounding stack against the reference.
    from model.CompTransTTS import CompTransTTS as RefModel

    pre, mod, tr = _ref_configs()
    mod["block_type"] = block
    torch.manual_seed(0)
    ref = RefModel(pre, mod, tr).eval()

    b = _batch(padded=padded)
    with torch.no_grad():
        pitch_data = {
            "pitch": None,
            "f0": torch.from_numpy(b["f0"]).clone(),
            "uv": torch.from_numpy(b["uv"]).clone(),
            "cwt_spec": None, "f0_mean": None, "f0_std": None,
            "mel2ph": torch.from_numpy(b["mel2ph"]),
        }
        out = ref(
            torch.zeros(2, dtype=torch.long),
            torch.from_numpy(b["texts"]),
            torch.from_numpy(b["src_lens"]), int(b["src_lens"].max()),
            torch.from_numpy(b["mels"]),
            torch.from_numpy(b["mel_lens"]), int(b["mel_lens"].max()),
            pitch_data,
            torch.from_numpy(b["energy"]),
            torch.from_numpy(b["durations"]),
            None, None, 1.0, 1.0, 1.0, 200000)
        ref_mel = out[0].numpy()
        ref_postnet = out[1].numpy()

    from ctts_tpu.models.comp_trans_tts import (CompTransTTS,
                                                prepare_model_config)
    from ctts_tpu.utils.torch_import import import_reference_checkpoint

    mod_j = copy.deepcopy(mod)
    mod_j["compute_dtype"] = "float32"
    if block == "lstransformer":
        mod_j["lstransformer"] = {"replicate_mask_bug": True}
    mod_j = prepare_model_config(pre, mod_j)
    model = CompTransTTS(pre, mod_j, tr)
    kwargs = dict(
        speakers=jnp.zeros(2, jnp.int32),
        texts=jnp.asarray(b["texts"], jnp.int32),
        src_lens=jnp.asarray(b["src_lens"], jnp.int32),
        mode="train_sup",
        mels=jnp.asarray(b["mels"]),
        mel_lens=jnp.asarray(b["mel_lens"], jnp.int32),
        pitch_targets={"f0": jnp.asarray(b["f0"]),
                       "uv": jnp.asarray(b["uv"]),
                       "mel2ph": jnp.asarray(b["mel2ph"], jnp.int32)},
        energy_targets=jnp.asarray(b["energy"]),
        duration_targets=jnp.asarray(b["durations"], jnp.int32),
        step=jnp.asarray(200000), deterministic=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs)
    ported = import_reference_checkpoint(ref.state_dict(), pre, mod_j)

    want = jax.tree_util.tree_structure(variables["params"])
    got = jax.tree_util.tree_structure(ported["params"])
    assert want == got, f"\nwant {want}\ngot {got}"
    assert (jax.tree_util.tree_structure(variables["batch_stats"])
            == jax.tree_util.tree_structure(ported["batch_stats"]))

    out_j, _ = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        mutable=["batch_stats"], **kwargs)

    mel_mae = _mae(out_j["mel_predictions"], ref_mel)
    post_mae = _mae(out_j["postnet_mel_predictions"], ref_postnet)
    assert mel_mae < 1e-3, mel_mae
    assert post_mae < 1e-3, post_mae


def test_reformer_encoder_decoder_parity(ref_env, monkeypatch):
    import model.transformers.reformer as rref
    from ctts_tpu.models import reformer as jref
    from ctts_tpu.utils.torch_import import import_block_params

    pre, mod, tr = _ref_configs()
    mod["block_type"] = "reformer"
    mod["reformer"] = dict(mod["reformer"])
    mod["reformer"]["depth"] = 2        # wiring identical, test-speed only
    torch.manual_seed(0)
    enc = rref.TextEncoder(mod).eval()
    dec = rref.Decoder(mod).eval()

    B, T = 2, 48                        # autopads to 128 on both sides
    rng = np.random.RandomState(0)
    tokens = rng.randint(1, 300, size=(B, T)).astype(np.int64)
    no_pad = np.zeros((B, T), bool)
    dec_in = rng.randn(B, T, 256).astype(np.float32)

    # identical LSH hash rotations on both sides
    d_head = (mod["transformer"]["encoder_hidden"]
              // mod["transformer"]["encoder_head"])
    rot = rng.randn(1, d_head, 4, 1).astype(np.float32)
    real_randn = torch.randn

    def fake_randn(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, torch.Size)):
            size = tuple(size[0])
        if tuple(size) == rot.shape:
            return torch.from_numpy(rot)
        return real_randn(*size, **kw)

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.no_grad():
        out_t, emb_t = enc(torch.from_numpy(tokens),
                           torch.from_numpy(no_pad))
        dec_t, _ = dec(torch.from_numpy(dec_in), torch.from_numpy(no_pad))

    mod_j = copy.deepcopy(mod)
    mod_j["compute_dtype"] = "float32"
    tok_j = jnp.asarray(tokens, jnp.int32)
    mask_j = jnp.asarray(no_pad)

    jenc = jref.TextEncoder(mod_j)
    variables = jenc.init(jax.random.PRNGKey(0), tok_j, mask_j,
                          deterministic=True, lsh_rot=rot)
    params, _ = import_block_params(
        {k: v.numpy() for k, v in enc.state_dict().items()}, mod_j,
        "encoder")
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(params))
    out_j, emb_j = jenc.apply({"params": params}, tok_j, mask_j,
                              deterministic=True, lsh_rot=rot)
    assert _mae(emb_j, emb_t.numpy()) < 1e-6
    assert _mae(out_j, out_t.numpy()) < 1e-3, _mae(out_j, out_t.numpy())

    jdec = jref.Decoder(mod_j)
    dvars = jdec.init(jax.random.PRNGKey(0), jnp.asarray(dec_in), mask_j,
                      deterministic=True, lsh_rot=rot)
    dparams, _ = import_block_params(
        {k: v.numpy() for k, v in dec.state_dict().items()}, mod_j,
        "decoder")
    assert (jax.tree_util.tree_structure(dvars["params"])
            == jax.tree_util.tree_structure(dparams))
    dec_j, _ = jdec.apply({"params": dparams}, jnp.asarray(dec_in), mask_j,
                          deterministic=True, lsh_rot=rot)
    assert _mae(dec_j, dec_t.numpy()) < 1e-3, _mae(dec_j, dec_t.numpy())


def test_lstransformer_attention_parity(ref_env):
    import model.transformers.lstransformer as lref
    from ctts_tpu.models.lstransformer import LongShortAttention

    torch.manual_seed(0)
    attn_t = lref.LongShortAttention(
        256, dim_head=128, heads=2, causal=True, window_size=128,
        segment_size=16, r=1, dropout=0.0).eval()

    B, n = 2, 100                       # pads to 128 internally
    rng = np.random.RandomState(1)
    x = rng.randn(B, n, 256).astype(np.float32)
    valid = np.ones((B, n), bool)
    valid[1, 80:] = False               # real padding, INTENDED convention
    with torch.no_grad():
        out_t = attn_t(torch.from_numpy(x),
                       mask=torch.from_numpy(valid)).numpy()

    sd = {k: v.numpy() for k, v in attn_t.state_dict().items()}

    def _ln(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}

    params = {
        "to_q": {"kernel": sd["to_q.weight"].T},
        "to_kv": {"kernel": sd["to_kv.weight"].T},
        "to_dynamic_proj": {"kernel": sd["to_dynamic_proj.weight"].T},
        "local_norm": _ln("local_norm"),
        "global_norm": _ln("global_norm"),
        "to_out": {"kernel": sd["to_out.weight"].T,
                   "bias": sd["to_out.bias"]},
    }
    m = LongShortAttention(dim=256, dim_head=128, heads=2, window_size=128,
                           segment_size=16, r=1, causal=True, dropout=0.0)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(~valid), deterministic=True)
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(params))
    out_j = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(~valid),
                    deterministic=True)
    assert _mae(out_j, out_t) < 1e-4, _mae(out_j, out_t)


def test_lstransformer_import_structure(ref_env):
    """The full-checkpoint import path for lstransformer produces a tree
    matching this framework's params (output parity is covered at the
    component level above)."""
    import model.transformers.lstransformer as lref
    from ctts_tpu.models import lstransformer as jls
    from ctts_tpu.utils.torch_import import import_block_params

    pre, mod, tr = _ref_configs()
    torch.manual_seed(0)
    enc = lref.TextEncoder(mod).eval()
    mod_j = copy.deepcopy(mod)
    mod_j["compute_dtype"] = "float32"
    mod_j["block_type"] = "lstransformer"
    jenc = jls.TextEncoder(mod_j)
    tokens = jnp.asarray(np.random.RandomState(0).randint(
        1, 300, size=(2, 16)), jnp.int32)
    variables = jenc.init(jax.random.PRNGKey(0), tokens,
                          jnp.zeros((2, 16), bool), deterministic=True)
    params, _ = import_block_params(
        {k: v.numpy() for k, v in enc.state_dict().items()}, mod_j,
        "encoder")
    assert (jax.tree_util.tree_structure(variables["params"])
            == jax.tree_util.tree_structure(params))
