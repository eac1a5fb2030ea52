"""Stub out the reference repo's unavailable dependencies so its PyTorch
model code can be imported for parity testing. Only import-time surface is
stubbed; any runtime use raises."""

import sys
import types


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def _unavailable(*a, **k):
    raise RuntimeError("stubbed dependency invoked at runtime")


def install():
    # numba: pass-through jit, builtin-range prange
    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f
    _stub("numba", jit=jit, prange=range)

    _stub("librosa", load=_unavailable,
          filters=_stub("librosa.filters", mel=_unavailable),
          util=_stub("librosa.util", pad_center=_unavailable,
                     tiny=lambda x: 1e-30))
    sys.modules.setdefault("librosa.filters", sys.modules["librosa"].filters)
    sys.modules.setdefault("librosa.util", sys.modules["librosa"].util)

    _stub("parselmouth", Sound=_unavailable)
    _stub("pyworld", dio=_unavailable, stonemask=_unavailable)
    _stub("pyloudnorm", Meter=_unavailable)
    wavelet = types.SimpleNamespace(MexicanHat=_unavailable, cwt=_unavailable)
    _stub("pycwt", wavelet=wavelet)

    def unidecode(text):
        import unicodedata
        return unicodedata.normalize("NFKD", text).encode(
            "ascii", "ignore").decode("ascii")
    _stub("unidecode", unidecode=unidecode)

    class _Engine:
        def number_to_words(self, *a, **k):
            return "number"
    _stub("inflect", engine=lambda: _Engine())

    _install_functional_torch_stubs()

    # DeepSpeaker pulls in TF/keras; stub the whole package
    _stub("deepspeaker", embedding=_stub("deepspeaker.embedding",
                                         build_model=_unavailable,
                                         predict_embedding=_unavailable))
    sys.modules.setdefault("deepspeaker.embedding",
                           sys.modules["deepspeaker"].embedding)


def _install_functional_torch_stubs():
    """FUNCTIONAL stand-ins for the third-party torch libs the reference's
    lstransformer/reformer import. These reimplement the documented
    lucidrains semantics (rotary-embedding-torch, local-attention) so the
    reference blocks can run for output-parity testing; product_key_memory
    is import-only (PKM is never instantiated: pkm_layers defaults empty,
    reformer.py:957-963)."""
    import torch
    import torch.nn.functional as F

    TOKEN_SELF_ATTN_VALUE = -5e4

    # ---- rotary_embedding_torch (used at lstransformer.py:248,292-294) ----
    class RotaryEmbedding(torch.nn.Module):
        def __init__(self, dim):
            super().__init__()
            inv_freq = 1.0 / (10000 ** (torch.arange(0, dim, 2).float()
                                        / dim))
            self.register_buffer("inv_freq", inv_freq)

        def forward(self, t, cache_key=None):
            t = t.type_as(self.inv_freq)
            freqs = torch.einsum("i,j->ij", t, self.inv_freq)
            return torch.repeat_interleave(freqs, 2, dim=-1)

    def _rotate_half(x):
        shape = x.shape
        x = x.reshape(*shape[:-1], shape[-1] // 2, 2)
        x1, x2 = x[..., 0], x[..., 1]
        return torch.stack((-x2, x1), dim=-1).reshape(shape)

    def apply_rotary_emb(freqs, t):
        return (t * freqs.cos()) + (_rotate_half(t) * freqs.sin())

    _stub("rotary_embedding_torch", RotaryEmbedding=RotaryEmbedding,
          apply_rotary_emb=apply_rotary_emb)

    # ---- local_attention (used at reformer.py:643,707) ----
    def _look_around(x, backward=1, forward=0, pad_value=-1, dim=2):
        t = x.shape[1]
        dims = (len(x.shape) - dim) * (0, 0)
        padded = F.pad(x, (*dims, backward, forward), value=pad_value)
        return torch.cat([padded[:, i: i + t] for i in
                          range(backward + forward + 1)], dim=dim)

    class LocalAttention(torch.nn.Module):
        def __init__(self, window_size, causal=False, look_backward=1,
                     look_forward=None, dropout=0.0, shared_qk=False,
                     **kwargs):
            super().__init__()
            self.window_size = window_size
            self.causal = causal
            self.look_backward = look_backward
            self.look_forward = ((0 if causal else 1)
                                 if look_forward is None else look_forward)
            self.shared_qk = shared_qk
            self.dropout = torch.nn.Dropout(dropout)

        def forward(self, q, k, v, input_mask=None):
            b, t, e = q.shape
            w = self.window_size
            assert t % w == 0, (t, w)
            windows = t // w
            if self.shared_qk:
                k = F.normalize(k, 2, dim=-1).type_as(q)
            ticker = torch.arange(t, device=q.device)[None]
            b_t = ticker.reshape(1, windows, w)
            bq, bk, bv = (x.reshape(b, windows, w, -1) for x in (q, k, v))
            kw = dict(backward=self.look_backward,
                      forward=self.look_forward)
            bk = _look_around(bk, pad_value=0.0, **kw)
            bv = _look_around(bv, pad_value=0.0, **kw)
            bq_t = b_t
            bq_k = _look_around(b_t, pad_value=-1, **kw)
            dots = torch.einsum("bhie,bhje->bhij", bq, bk) * (e ** -0.5)
            mask_value = -torch.finfo(dots.dtype).max
            if self.shared_qk:
                mask = bq_t[:, :, :, None] == bq_k[:, :, None, :]
                dots.masked_fill_(mask, TOKEN_SELF_ATTN_VALUE)
            if self.causal:
                mask = bq_t[:, :, :, None] < bq_k[:, :, None, :]
                dots.masked_fill_(mask, mask_value)
            dots.masked_fill_(bq_k[:, :, None, :] == -1, mask_value)
            if input_mask is not None:
                h = b // input_mask.shape[0]
                mq = input_mask.reshape(-1, windows, w)
                mk = _look_around(mq, pad_value=False, **kw)
                mask = mq[:, :, :, None] & mk[:, :, None, :]
                mask = mask.repeat_interleave(h, dim=0)
                dots.masked_fill_(~mask, mask_value)
            attn = dots.softmax(dim=-1)
            attn = self.dropout(attn)
            out = torch.einsum("bhij,bhje->bhie", attn, bv)
            return out.reshape(b, t, e)

    _stub("local_attention", LocalAttention=LocalAttention)
    _stub("product_key_memory", PKM=_unavailable)
