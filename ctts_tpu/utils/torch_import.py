"""Import reference PyTorch CompTransTTS checkpoints into flax params.

Maps the reference state_dict (model/CompTransTTS.py + model/modules.py +
model/transformers/transformer_fs2.py) onto this framework's parameter tree
so published checkpoints (README.md:70, 900k steps) can be served directly.
Currently covers the flagship configuration: block_type=transformer_fs2 with
any pitch_type, frame/phoneme energy, supervised or unsupervised duration,
single- or multi-speaker.
"""

import numpy as np


def _t(w):
    return np.asarray(w, np.float32)


def _conv(w):                       # torch [out, in, k] → flax [k, in, out]
    return _t(w).transpose(2, 1, 0)


def _dense(w):                      # torch [out, in] → flax [in, out]
    return _t(w).T


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _fs2_layer(sd, p, hidden, heads):
    """One EncSALayer (transformer_fs2.py:154-200)."""
    dh = hidden // heads
    in_proj = _t(sd[f"{p}.op.self_attn.in_proj_weight"])     # [3H, H]
    q, k, v = np.split(in_proj, 3, axis=0)
    out_w = _t(sd[f"{p}.op.self_attn.out_proj.weight"])      # [H, H]
    return {
        "layer_norm1": {"LayerNorm_0": _ln(sd, f"{p}.op.layer_norm1")},
        "layer_norm2": {"LayerNorm_0": _ln(sd, f"{p}.op.layer_norm2")},
        "self_attn": {
            "q": {"kernel": q.T.reshape(hidden, heads, dh)},
            "k": {"kernel": k.T.reshape(hidden, heads, dh)},
            "v": {"kernel": v.T.reshape(hidden, heads, dh)},
            "out": {"kernel": out_w.T.reshape(heads, dh, hidden)},
        },
        "ffn": {
            "ffn_1": {"Conv_0": {
                "kernel": _conv(sd[f"{p}.op.ffn.ffn_1.weight"]),
                "bias": _t(sd[f"{p}.op.ffn.ffn_1.bias"])}},
            "ffn_2": {"kernel": _dense(sd[f"{p}.op.ffn.ffn_2.weight"]),
                      "bias": _t(sd[f"{p}.op.ffn.ffn_2.bias"])},
        },
    }


def _fs2_stack(sd, prefix, n_layers, hidden, heads, out=None):
    out = out or {}
    for i in range(n_layers):
        out[f"layers_{i}"] = _fs2_layer(sd, f"{prefix}.layers.{i}", hidden,
                                        heads)
    out["layer_norm"] = {"LayerNorm_0": _ln(sd, f"{prefix}.layer_norm")}
    return out


def _conv_stack(sd, prefix, n_layers):
    """Reference predictor conv stack: Sequential(pad, conv, relu, LN, drop)
    (modules.py:1278-1288). Flax twin: _ConvStack(conv_{i} + LayerNorm_i)."""
    out = {}
    for i in range(n_layers):
        out[f"conv_{i}"] = {"Conv_0": {
            "kernel": _conv(sd[f"{prefix}.{i}.1.weight"]),
            "bias": _t(sd[f"{prefix}.{i}.1.bias"])}}
        out[f"LayerNorm_{i}"] = {"LayerNorm_0": {
            "scale": _t(sd[f"{prefix}.{i}.3.weight"]),
            "bias": _t(sd[f"{prefix}.{i}.3.bias"])}}
    return out


def _pitch_predictor(sd, prefix, n_layers):
    return {
        "conv": _conv_stack(sd, f"{prefix}.conv", n_layers),
        "linear": {"kernel": _dense(sd[f"{prefix}.linear.weight"]),
                   "bias": _t(sd[f"{prefix}.linear.bias"])},
        "pos_embed_alpha": _t(sd[f"{prefix}.pos_embed_alpha"]),
    }


def _gelu_ff(sd, p):
    """Conv-gelu-conv FFN shared by fastformer/lstransformer
    (fastformer.py:348-376, lstransformer.py:397-425)."""
    return {"w_1": {"Conv_0": {"kernel": _conv(sd[f"{p}.w_1.weight"]),
                               "bias": _t(sd[f"{p}.w_1.bias"])}},
            "w_2": {"Conv_0": {"kernel": _conv(sd[f"{p}.w_2.weight"]),
                               "bias": _t(sd[f"{p}.w_2.bias"])}}}


def _fastformer_stack(sd, prefix, n_layers):
    """FFTBlock of PreNorm(FastAttention)+PreNorm(FFN) layers with the
    q/k attention-logit projections weight-tied across layers
    (fastformer.py:140-183)."""
    def lin(p):
        return {"kernel": _dense(sd[f"{p}.weight"]),
                "bias": _t(sd[f"{p}.bias"])}

    p0 = f"{prefix}.layers.0.0.fn"
    out = {"to_q_attn_logits": lin(f"{p0}.to_q_attn_logits"),
           "to_k_attn_logits": lin(f"{p0}.to_k_attn_logits")}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        out[f"norm_attn_{i}"] = _ln(sd, f"{p}.0.norm")
        out[f"attn_{i}"] = {"query": lin(f"{p}.0.fn.query"),
                            "key": lin(f"{p}.0.fn.key"),
                            "transform": lin(f"{p}.0.fn.transform")}
        out[f"norm_ff_{i}"] = _ln(sd, f"{p}.1.norm")
        out[f"ff_{i}"] = _gelu_ff(sd, f"{p}.1.fn")
    return out


def _lstransformer_stack(sd, prefix, n_layers):
    """FFTBlock of PreNorm(LongShortAttention)+PreNorm(FFN)
    (lstransformer.py:175-204, 218-394)."""
    out = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        a = f"{p}.0.fn"
        out[f"norm_attn_{i}"] = _ln(sd, f"{p}.0.norm")
        out[f"attn_{i}"] = {
            "to_q": {"kernel": _dense(sd[f"{a}.to_q.weight"])},
            "to_kv": {"kernel": _dense(sd[f"{a}.to_kv.weight"])},
            "to_dynamic_proj": {"kernel": _dense(
                sd[f"{a}.to_dynamic_proj.weight"])},
            "local_norm": _ln(sd, f"{a}.local_norm"),
            "global_norm": _ln(sd, f"{a}.global_norm"),
            "to_out": {"kernel": _dense(sd[f"{a}.to_out.weight"]),
                       "bias": _t(sd[f"{a}.to_out.bias"])},
        }
        out[f"norm_ff_{i}"] = _ln(sd, f"{p}.1.norm")
        out[f"ff_{i}"] = _gelu_ff(sd, f"{p}.1.fn")
    return out


def _conformer_layer(sd, p, hidden, heads):
    """One ConformerBlock (conformer.py:162-246). Returns (params, stats)."""
    dh = hidden // heads

    def ff(q):
        return {
            "LayerNorm_0": _ln(sd, f"{q}.0"),
            "Dense_0": {"kernel": _dense(sd[f"{q}.1.linear.weight"]),
                        "bias": _t(sd[f"{q}.1.linear.bias"])},
            "Dense_1": {"kernel": _dense(sd[f"{q}.4.linear.weight"]),
                        "bias": _t(sd[f"{q}.4.linear.bias"])},
        }

    def headed(name, shape):
        return {"kernel": _dense(sd[name]).reshape(shape)}

    a = f"{p}.sequential.1.module"
    c = f"{p}.sequential.2.module.sequential"
    params = {
        "ff1": ff(f"{p}.sequential.0.module.sequential"),
        "attn_norm": _ln(sd, f"{a}.layer_norm"),
        "attn": {
            "query_proj": headed(f"{a}.attention.query_proj.linear.weight",
                                 (hidden, heads, dh)),
            "key_proj": headed(f"{a}.attention.key_proj.linear.weight",
                               (hidden, heads, dh)),
            "value_proj": headed(f"{a}.attention.value_proj.linear.weight",
                                 (hidden, heads, dh)),
            "pos_proj": headed(f"{a}.attention.pos_proj.linear.weight",
                               (hidden, heads, dh)),
            "u_bias": _t(sd[f"{a}.attention.u_bias"]),
            "v_bias": _t(sd[f"{a}.attention.v_bias"]),
            "out_proj": headed(f"{a}.attention.out_proj.linear.weight",
                               (heads, dh, hidden)),
        },
        "conv": {
            "LayerNorm_0": _ln(sd, f"{c}.0"),
            "pw1": {"kernel": _t(sd[f"{c}.2.conv.weight"])[:, :, 0].T,
                    "bias": _t(sd[f"{c}.2.conv.bias"])},
            "dw": {"kernel": _conv(sd[f"{c}.4.conv.weight"])},
            "bn": {"scale": _t(sd[f"{c}.5.weight"]),
                   "bias": _t(sd[f"{c}.5.bias"])},
            "pw2": {"kernel": _t(sd[f"{c}.7.conv.weight"])[:, :, 0].T,
                    "bias": _t(sd[f"{c}.7.conv.bias"])},
        },
        "ff2": ff(f"{p}.sequential.3.module.sequential"),
        "final_norm": _ln(sd, f"{p}.sequential.4"),
    }
    stats = {"conv": {"bn": {"mean": _t(sd[f"{c}.5.running_mean"]),
                             "var": _t(sd[f"{c}.5.running_var"])}}}
    return params, stats


def _conformer_stack(sd, prefix, n_layers, hidden, heads):
    params, stats = {}, {}
    for i in range(n_layers):
        p, s = _conformer_layer(sd, f"{prefix}.{i}", hidden, heads)
        params[f"layer_stack_{i}"] = p
        stats[f"layer_stack_{i}"] = s
    return params, stats


def _reformer_stack(sd, prefix, depth):
    """Weight-tied Reformer: one attn + one ff shared across depth, one
    pair of PreNorm LayerNorms per depth (reformer.py:931-977). Reads the
    plain (irreversible) registration of the same modules."""
    p0 = f"{prefix}.layers.irrev_blocks.0"
    out = {
        "attn": {
            "toqk": {"kernel": _dense(sd[f"{p0}.f.fn.toqk.weight"])},
            "tov": {"kernel": _dense(sd[f"{p0}.f.fn.tov.weight"])},
            "to_out": {"kernel": _dense(sd[f"{p0}.f.fn.to_out.weight"]),
                       "bias": _t(sd[f"{p0}.f.fn.to_out.bias"])},
        },
        "ff": {
            "w1": {"kernel": _dense(sd[f"{p0}.g.fn.fn.w1.weight"]),
                   "bias": _t(sd[f"{p0}.g.fn.fn.w1.bias"])},
            "w2": {"kernel": _dense(sd[f"{p0}.g.fn.fn.w2.weight"]),
                   "bias": _t(sd[f"{p0}.g.fn.fn.w2.bias"])},
        },
    }
    for i in range(depth):
        pi = f"{prefix}.layers.irrev_blocks.{i}"
        out[f"norm_f_{i}"] = _ln(sd, f"{pi}.f.norm")
        out[f"norm_g_{i}"] = _ln(sd, f"{pi}.g.norm")
    return out


def import_block_params(sd, model_config, side, prefix=""):
    """Map one reference TextEncoder/Decoder state_dict slice onto this
    framework's encoder/decoder param tree. `side` is "encoder"/"decoder";
    `prefix` is ""/"encoder."/"decoder." depending on whether `sd` is a
    block-level or full-model state_dict. Returns (params, batch_stats)."""
    block = model_config["block_type"]
    stats = {}
    if block in ("fastformer", "lstransformer"):
        cfg = model_config["transformer"]
        stack_fn = (_fastformer_stack if block == "fastformer"
                    else _lstransformer_stack)
        params = {"layer_stack": stack_fn(sd, f"{prefix}layer_stack",
                                          cfg[f"{side}_layer"])}
    elif block == "conformer":
        cfg = model_config["conformer"]
        sp, ss = _conformer_stack(sd, f"{prefix}layer_stack",
                                  cfg[f"{side}_layer"],
                                  cfg[f"{side}_hidden"], cfg[f"{side}_head"])
        params = {"stack": sp}
        stats = {"stack": ss}
    elif block == "reformer":
        params = {"stack": {"reformer": _reformer_stack(
            sd, f"{prefix}layer_stack.net",
            model_config["reformer"]["depth"])}}
    else:
        raise ValueError(block)
    if side == "encoder":
        params["src_word_emb"] = {"embedding": _t(
            sd[f"{prefix}src_word_emb.weight"])}
    return params, stats


def _classic_layer(sd, p, hidden, heads):
    """One classic FFTBlock (transformer.py:157-288)."""
    dh = hidden // heads

    def qkv(name):
        w = _t(sd[f"{p}.slf_attn.{name}.linear.weight"])     # [H, H]
        return {"kernel": w.T.reshape(hidden, heads, dh)}

    return {
        "slf_attn": {
            "w_qs": qkv("w_qs"), "w_ks": qkv("w_ks"), "w_vs": qkv("w_vs"),
            "fc": {"kernel": _t(
                sd[f"{p}.slf_attn.fc.linear.weight"]).T.reshape(
                    heads, dh, hidden)},
            "LayerNorm_0": _ln(sd, f"{p}.slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": {"Conv_0": {
                "kernel": _conv(sd[f"{p}.pos_ffn.w_1.weight"]),
                "bias": _t(sd[f"{p}.pos_ffn.w_1.bias"])}},
            "w_2": {"Conv_0": {
                "kernel": _conv(sd[f"{p}.pos_ffn.w_2.weight"]),
                "bias": _t(sd[f"{p}.pos_ffn.w_2.bias"])}},
            "LayerNorm_0": _ln(sd, f"{p}.pos_ffn.layer_norm"),
        },
    }


def import_reference_checkpoint(state_dict, preprocess_config, model_config):
    """torch state_dict → {"params": ..., "batch_stats": ...}."""
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in state_dict.items()}
    block = model_config["block_type"]
    cfg = model_config.get(block)
    if not cfg or "encoder_hidden" not in cfg:
        # lstransformer reads the "transformer" hyperparameters (ref
        # lstransformer.py:59-69); its own section (if present) only holds
        # behavior flags like replicate_mask_bug
        cfg = model_config["transformer"]
    vp = model_config["variance_predictor"]
    enc_h = cfg["encoder_hidden"]

    params = {}
    stats = {}

    if block in ("fastformer", "lstransformer", "conformer", "reformer"):
        for side in ("encoder", "decoder"):
            p, s = import_block_params(sd, model_config, side,
                                       prefix=f"{side}.")
            params[side] = p
            if s:
                stats[side] = s
    elif block == "transformer_fs2":
        params["encoder"] = {
            "embed_tokens": {"embedding": _t(
                sd["encoder.embed_tokens.weight"])},
            "fft": _fs2_stack(sd, "encoder", cfg["encoder_layer"], enc_h,
                              cfg["encoder_head"]),
        }
        dec = _fs2_stack(sd, "decoder", cfg["decoder_layer"],
                         cfg["decoder_hidden"], cfg["decoder_head"])
        dec["pos_embed_alpha"] = _t(sd["decoder.pos_embed_alpha"])
        params["decoder"] = {"fft": dec}
    else:  # classic transformer
        params["encoder"] = {
            "src_word_emb": {"embedding": _t(
                sd["encoder.src_word_emb.weight"])},
            **{f"layer_stack_{i}": _classic_layer(
                sd, f"encoder.layer_stack.{i}", enc_h,
                cfg["encoder_head"]) for i in range(cfg["encoder_layer"])},
        }
        params["decoder"] = {
            f"layer_stack_{i}": _classic_layer(
                sd, f"decoder.layer_stack.{i}", cfg["decoder_hidden"],
                cfg["decoder_head"]) for i in range(cfg["decoder_layer"])}

    # ---- mel linear & postnet ----
    params["mel_linear"] = {"kernel": _dense(sd["mel_linear.weight"]),
                            "bias": _t(sd["mel_linear.bias"])}
    pn, pn_stats = {}, {}
    for i in range(5):
        pn[f"conv_{i}"] = {"Conv_0": {
            "kernel": _conv(sd[f"postnet.convolutions.{i}.0.conv.weight"]),
            "bias": _t(sd[f"postnet.convolutions.{i}.0.conv.bias"])}}
        bnp = f"postnet.convolutions.{i}.1"
        pn[f"bn_{i}"] = {"scale": _t(sd[f"{bnp}.weight"]),
                         "bias": _t(sd[f"{bnp}.bias"])}
        pn_stats[f"bn_{i}"] = {"mean": _t(sd[f"{bnp}.running_mean"]),
                               "var": _t(sd[f"{bnp}.running_var"])}
    params["postnet"] = pn
    stats["postnet"] = pn_stats

    # ---- variance adaptor ----
    va = {}
    va["duration_predictor"] = {
        "conv": _conv_stack(sd, "variance_adaptor.duration_predictor.conv",
                            vp["dur_predictor_layers"]),
        "linear": {
            "kernel": _dense(
                sd["variance_adaptor.duration_predictor.linear.weight"]),
            "bias": _t(sd["variance_adaptor.duration_predictor.linear.bias"])},
    }
    if model_config["variance_embedding"]["use_pitch_embed"]:
        pitch_type = preprocess_config["preprocessing"]["pitch"]["pitch_type"]
        va["pitch_embed"] = {"embedding": _t(
            sd["variance_adaptor.pitch_embed.weight"])}
        if pitch_type == "cwt":
            va["cwt_in_proj"] = {
                "kernel": _dense(sd["variance_adaptor.cwt_predictor.0.weight"]),
                "bias": _t(sd["variance_adaptor.cwt_predictor.0.bias"])}
            va["cwt_predictor"] = _pitch_predictor(
                sd, "variance_adaptor.cwt_predictor.1",
                vp["predictor_layers"])
            va["cwt_stats_layers"] = {
                "Dense_0": {
                    "kernel": _dense(
                        sd["variance_adaptor.cwt_stats_layers.0.weight"]),
                    "bias": _t(sd["variance_adaptor.cwt_stats_layers.0.bias"])},
                "Dense_1": {
                    "kernel": _dense(
                        sd["variance_adaptor.cwt_stats_layers.2.weight"]),
                    "bias": _t(sd["variance_adaptor.cwt_stats_layers.2.bias"])},
                "Dense_2": {
                    "kernel": _dense(
                        sd["variance_adaptor.cwt_stats_layers.4.weight"]),
                    "bias": _t(sd["variance_adaptor.cwt_stats_layers.4.bias"])},
            }
        else:
            va["pitch_predictor"] = _pitch_predictor(
                sd, "variance_adaptor.pitch_predictor",
                vp["predictor_layers"])
    if model_config["variance_embedding"]["use_energy_embed"]:
        va["energy_predictor"] = _pitch_predictor(
            sd, "variance_adaptor.energy_predictor", vp["predictor_layers"])
        va["energy_embedding"] = {"embedding": _t(
            sd["variance_adaptor.energy_embedding.weight"])}
    if model_config["duration_modeling"]["learn_alignment"]:
        al = {}
        for j, idx in enumerate([0, 2]):
            al[f"key_proj_{j}"] = {"Conv_0": {
                "kernel": _conv(
                    sd[f"variance_adaptor.aligner.key_proj.{idx}.conv.weight"]),
                "bias": _t(
                    sd[f"variance_adaptor.aligner.key_proj.{idx}.conv.bias"])}}
        for j, idx in enumerate([0, 2, 4]):
            al[f"query_proj_{j}"] = {"Conv_0": {
                "kernel": _conv(
                    sd[f"variance_adaptor.aligner.query_proj.{idx}.conv.weight"]),
                "bias": _t(
                    sd[f"variance_adaptor.aligner.query_proj.{idx}.conv.bias"])}}
        if model_config["multi_speaker"]:
            al["key_spk_proj"] = {"kernel": _dense(
                sd["variance_adaptor.aligner.key_spk_proj.linear.weight"])}
            al["query_spk_proj"] = {"kernel": _dense(
                sd["variance_adaptor.aligner.query_spk_proj.linear.weight"])}
        va["aligner"] = al

    # ---- prosody modeling (ref modules.py:830-861) ----
    prosody_type = model_config["prosody_modeling"]["model_type"]
    if prosody_type == "du2021":
        p, s = import_du_extractor(sd, "variance_adaptor.prosody_extractor.")
        va["prosody_extractor"] = p
        stats.setdefault("variance_adaptor", {})["prosody_extractor"] = s
        va["prosody_predictor"] = import_du_predictor(
            sd, "variance_adaptor.prosody_predictor.")
        va["prosody_linear"] = {"kernel": _dense(
            sd["variance_adaptor.prosody_linear.linear.weight"])}
    elif prosody_type == "liu2021":
        p, s = import_liu_prosody(sd, "variance_adaptor.")
        va["liu_prosody"] = p
        stats.setdefault("variance_adaptor", {})["liu_prosody"] = s
    params["variance_adaptor"] = va

    if model_config["multi_speaker"] and "speaker_emb.weight" in sd:
        w = sd["speaker_emb.weight"]
        if w.ndim == 2 and "speaker_emb.bias" not in sd:
            params["speaker_emb"] = {"embedding": _t(w)}
        else:
            params["speaker_emb"] = {"kernel": _dense(w),
                                     "bias": _t(sd["speaker_emb.bias"])}

    return {"params": params, "batch_stats": stats}


# ---- prosody modules (ref model/modules.py:151-723) --------------------- #

def _conv2d(w):            # torch [out, in, kh, kw] → flax [kh, kw, in, out]
    return _t(w).transpose(2, 3, 1, 0)


def _gru(sd, prefix, suffix="_l0"):
    """torch nn.GRU / nn.GRUCell weights → _GRUCellT params (prosody.py).

    Both share the (r|z|n)-stacked layout; _GRUCellT keeps torch's
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)) semantics exactly.
    """
    return {"wi": _dense(sd[f"{prefix}.weight_ih{suffix}"]),
            "wh": _dense(sd[f"{prefix}.weight_hh{suffix}"]),
            "bi": _t(sd[f"{prefix}.bias_ih{suffix}"]),
            "bh": _t(sd[f"{prefix}.bias_hh{suffix}"])}


def _bn(sd, prefix):
    return ({"scale": _t(sd[f"{prefix}.weight"]),
             "bias": _t(sd[f"{prefix}.bias"])},
            {"mean": _t(sd[f"{prefix}.running_mean"]),
             "var": _t(sd[f"{prefix}.running_var"])})


def import_du_extractor(sd, prefix=""):
    """ref ProsodyExtractor (modules.py:151-201) → DuProsodyExtractor.
    Returns (params, batch_stats)."""
    p, s = {}, {}
    for i in (0, 1):
        cp = f"{prefix}conv_stack.{i}.conv_layer"
        scale_bias, mean_var = _bn(sd, f"{cp}.1")
        p[f"conv_{i}"] = {
            "Conv_0": {"kernel": _conv2d(sd[f"{cp}.0.conv.weight"])},
            "BatchNorm_0": scale_bias}
        s[f"conv_{i}"] = {"BatchNorm_0": mean_var}
    p["gru_fwd"] = {"cell": {"gru": _gru(sd, f"{prefix}gru")}}
    p["gru_bwd"] = {"cell": {"gru": _gru(sd, f"{prefix}gru", "_l0_reverse")}}
    return p, s


def import_du_predictor(sd, prefix=""):
    """ref ProsodyPredictor (modules.py:235-329) → DuProsodyPredictor."""
    p = {}
    for i in (0, 1):
        cp = f"{prefix}conv_stack.{i}.conv_layer"
        p[f"conv_{i}"] = {
            "ConvNorm_0": {"Conv_0": {
                "kernel": _conv(sd[f"{cp}.0.conv.weight"]),
                "bias": _t(sd[f"{cp}.0.conv.bias"])}},
            "LayerNorm_0": _ln(sd, f"{cp}.1")}
    p["gru_cell"] = {"gru": _gru(sd, f"{prefix}gru_cell", "")}
    p["gmm_mdn"] = {
        "w": {"kernel": _dense(sd[f"{prefix}gmm_mdn.w.0.weight"]),
              "bias": _t(sd[f"{prefix}gmm_mdn.w.0.bias"])},
        "sigma": {"kernel": _dense(sd[f"{prefix}gmm_mdn.sigma.weight"]),
                  "bias": _t(sd[f"{prefix}gmm_mdn.sigma.bias"])},
        "mu": {"kernel": _dense(sd[f"{prefix}gmm_mdn.mu.weight"]),
               "bias": _t(sd[f"{prefix}gmm_mdn.mu.bias"])},
    }
    return p


def import_ref_encoder(sd, prefix, n_filters):
    """ref ReferenceEncoder (modules.py:332-397) → ReferenceEncoder.
    Returns (params, batch_stats). conv 0 is the CoordConv2d (its USED
    kernel lives at convs.0.conv.*; the Conv2d-inherited convs.0.weight
    is dead weight in the reference)."""
    p, s = {}, {}
    p["conv_0"] = {"Conv_0": {
        "kernel": _conv2d(sd[f"{prefix}convs.0.conv.weight"]),
        "bias": _t(sd[f"{prefix}convs.0.conv.bias"])}}
    for i in range(1, n_filters):
        p[f"conv_{i}"] = {"kernel": _conv2d(sd[f"{prefix}convs.{i}.weight"]),
                          "bias": _t(sd[f"{prefix}convs.{i}.bias"])}
    for i in range(n_filters):
        scale_bias, mean_var = _bn(sd, f"{prefix}bns.{i}")
        p[f"bn_{i}"] = scale_bias
        s[f"bn_{i}"] = mean_var
    p["gru"] = {"fwd": {"cell": {"gru": _gru(sd, f"{prefix}gru")}}}
    return p, s


def _bi_gru(sd, prefix):
    return {"fwd": {"cell": {"gru": _gru(sd, prefix)}},
            "bwd": {"cell": {"gru": _gru(sd, prefix, "_l0_reverse")}}}


def _linear(sd, prefix, bias=True):
    out = {"kernel": _dense(sd[f"{prefix}.weight"])}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def import_utterance_encoder(sd, prefix, n_filters):
    """ref UtteranceLevelProsodyEncoder (modules.py:537-569)."""
    enc_p, enc_s = import_ref_encoder(sd, f"{prefix}encoder.", n_filters)
    p = {
        "encoder": enc_p,
        "encoder_prj": _linear(sd, f"{prefix}encoder_prj"),
        "stl": {
            "embed": _t(sd[f"{prefix}stl.embed"]),
            "attention": {
                "W_query": {"kernel": _dense(
                    sd[f"{prefix}stl.attention.W_query.weight"])},
                "W_key": {"kernel": _dense(
                    sd[f"{prefix}stl.attention.W_key.weight"])},
                "W_value": {"kernel": _dense(
                    sd[f"{prefix}stl.attention.W_value.weight"])},
            },
        },
        "encoder_bottleneck": _linear(sd, f"{prefix}encoder_bottleneck"),
    }
    return p, {"encoder": enc_s}


def import_phoneme_encoder(sd, prefix, n_filters):
    """ref PhonemeLevelProsodyEncoder (modules.py:400-450)."""
    enc_p, enc_s = import_ref_encoder(sd, f"{prefix}encoder.", n_filters)
    p = {
        "encoder": enc_p,
        "encoder_prj": _linear(sd, f"{prefix}encoder_prj"),
        "q_lin": {"kernel": _dense(sd[f"{prefix}linears.0.linear.weight"])},
        "k_lin": {"kernel": _dense(sd[f"{prefix}linears.1.linear.weight"])},
        "encoder_bottleneck": _linear(sd, f"{prefix}encoder_bottleneck"),
    }
    return p, {"encoder": enc_s}


def import_parallel_predictor(sd, prefix=""):
    """ref ParallelProsodyPredictor (modules.py:572-648)."""
    return {
        "conv1d_1": {"Conv_0": _linear(sd, f"{prefix}conv_layer.conv1d_1.conv")
                     | {"kernel": _conv(
                         sd[f"{prefix}conv_layer.conv1d_1.conv.weight"])}},
        "conv1d_2": {"Conv_0": _linear(sd, f"{prefix}conv_layer.conv1d_2.conv")
                     | {"kernel": _conv(
                         sd[f"{prefix}conv_layer.conv1d_2.conv.weight"])}},
        "LayerNorm_0": _ln(sd, f"{prefix}conv_layer.layer_norm_1"),
        "LayerNorm_1": _ln(sd, f"{prefix}conv_layer.layer_norm_2"),
        "gru": _bi_gru(sd, f"{prefix}gru"),
        "predictor_bottleneck": _linear(sd, f"{prefix}predictor_bottleneck"),
    }


def import_liu_prosody(sd, prefix, n_filters=6):
    """The four liu2021 modules + projections, wired as LiuProsody
    (ref modules.py:845-861 hangs them directly on the VarianceAdaptor).
    Returns (params, batch_stats)."""
    up_p, up_s = import_utterance_encoder(
        sd, f"{prefix}utterance_prosody_encoder.", n_filters)
    pp_p, pp_s = import_phoneme_encoder(
        sd, f"{prefix}phoneme_prosody_encoder.", n_filters)
    p = {
        "utterance_prosody_encoder": up_p,
        "phoneme_prosody_encoder": pp_p,
        "utterance_prosody_predictor": import_parallel_predictor(
            sd, f"{prefix}utterance_prosody_predictor."),
        "phoneme_prosody_predictor": import_parallel_predictor(
            sd, f"{prefix}phoneme_prosody_predictor."),
        "utterance_prosody_prj": _linear(sd, f"{prefix}utterance_prosody_prj"),
        "phoneme_prosody_prj": _linear(sd, f"{prefix}phoneme_prosody_prj"),
    }
    s = {"utterance_prosody_encoder": up_s,
         "phoneme_prosody_encoder": pp_s}
    return p, s
