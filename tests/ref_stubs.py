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

    _stub("rotary_embedding_torch", RotaryEmbedding=_unavailable,
          apply_rotary_emb=_unavailable)
    _stub("local_attention", LocalAttention=_unavailable)

    # DeepSpeaker pulls in TF/keras; stub the whole package
    _stub("deepspeaker", embedding=_stub("deepspeaker.embedding",
                                         build_model=_unavailable,
                                         predict_embedding=_unavailable))
    sys.modules.setdefault("deepspeaker.embedding",
                           sys.modules["deepspeaker"].embedding)
