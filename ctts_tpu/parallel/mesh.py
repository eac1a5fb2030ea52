"""Device mesh + sharding rules (data parallel × tensor parallel).

The reference's distribution is single-node DDP over NCCL
(train.py:27-58, 251-252). TPU-native equivalent: one jit-compiled train
step over a ('data', 'model') `jax.sharding.Mesh`; the batch is sharded over
'data' (gradient all-reduce is inserted by XLA and rides ICI), and the FFT
blocks' attention heads / FFN channels shard over 'model'
(Megatron-style tensor parallelism). Multi-host runs only need
`jax.distributed.initialize()` before mesh construction.
"""

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data=-1, model=1, devices=None):
    """Build a ('data', 'model') mesh. data=-1 → all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if model <= 0:
        model = 1
    if data == -1:
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh):
    """Leading-axis sharding over 'data' for every array leaf."""
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())
    return spec


def shard_batch(batch, mesh):
    spec = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, spec(x)) if x is not None else None,
        batch)


# --- parameter partition rules (tensor parallel over 'model') ----------- #
# Matched against '/'-joined parameter paths. First hit wins; default is
# full replication.
_TP_RULES = [
    # fs2 conv-FFN: conv kernel [k, C, 4C] → shard out-channels; the
    # following dense [4C, C] → shard in-dim (all-reduce after).
    (re.compile(r".*ffn.*ffn_1.*kernel"), P(None, None, "model")),
    (re.compile(r".*ffn.*ffn_2.*kernel"), P("model", None)),
    # classic transformer position-wise FFN convs
    (re.compile(r".*pos_ffn/w_1.*kernel"), P(None, None, "model")),
    (re.compile(r".*pos_ffn/w_2.*kernel"), P(None, "model", None)),
    # attention: DenseGeneral q/k/v kernels [C, H, Dh] → shard heads;
    # out projection [H, Dh, C] → shard heads (reduce after).
    (re.compile(r".*(self_attn|slf_attn)/(q|k|v|w_qs|w_ks|w_vs)/kernel"),
     P(None, "model", None)),
    (re.compile(r".*(self_attn|slf_attn)/(out|fc)/kernel"),
     P("model", None, None)),
]


def param_spec(path, leaf):
    path_str = "/".join(str(k.key) if hasattr(k, "key") else str(k)
                        for k in path)
    for rule, spec in _TP_RULES:
        if rule.match(path_str):
            if len(spec) == leaf.ndim:
                return spec
    return P()


def shard_params(variables, mesh):
    """Place params/batch_stats on the mesh per the TP rules."""
    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(path, leaf)))
    return jax.tree_util.tree_map_with_path(place, variables)


def param_shardings(variables, mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)),
        variables)
