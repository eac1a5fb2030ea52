"""Device mesh + sharding rules (data parallel × tensor parallel).

The reference's distribution is single-node DDP over NCCL
(train.py:27-58, 251-252). TPU-native equivalent: one jit-compiled train
step over a ('data', 'model') `jax.sharding.Mesh`; the batch is sharded over
'data' (gradient all-reduce is inserted by XLA and rides ICI), and the FFT
blocks' attention heads / FFN channels shard over 'model'
(Megatron-style tensor parallelism). Multi-host runs only need
`jax.distributed.initialize()` before mesh construction.
"""

import os
import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host wiring (replaces the reference's mp.spawn + dist.init_
    process_group NCCL setup, ref train.py:30-35). MUST run before the jax
    backend initializes. Flags fall back to CTTS_COORDINATOR /
    CTTS_NUM_PROCESSES / CTTS_PROCESS_ID env vars so launchers can export
    once per host. Returns True when distributed mode was initialized.

    On TPU pods, arguments may all be omitted (jax autodetects from the
    TPU metadata); on CPU test rigs set
    jax.config.update("jax_cpu_collectives_implementation", "gloo") first.
    """
    coordinator = coordinator or os.environ.get("CTTS_COORDINATOR")
    if not coordinator:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get("CTTS_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("CTTS_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


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
    """Place a (host-local) batch on the mesh's 'data' axis.

    Single-process: a plain device_put. Multi-process: each host holds
    1/process_count of the global batch (per-host dataset sharding,
    DistributedSampler equivalent) and the global array is assembled from
    the local shards without any host↔host data movement.
    """
    spec = batch_sharding(mesh)
    multi = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        if multi and hasattr(x, "ndim"):
            return jax.make_array_from_process_local_data(
                spec(x), np.asarray(x))
        return jax.device_put(x, spec(x))

    return jax.tree.map(put, batch)


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
    # fastformer/lstransformer conv-gelu FFN (Conv1d kernels [k, C, 4C]):
    # expand → shard out-channels; contract → shard in-channels.
    (re.compile(r".*ff_\d+/w_1/Conv_0/kernel"), P(None, None, "model")),
    (re.compile(r".*ff_\d+/w_2/Conv_0/kernel"), P(None, "model", None)),
    # fastformer additive attention (ref fastformer.py:256-345): q/k
    # projections [C, C] shard the hidden (== flat head) axis; `transform`
    # consumes head-sharded activations → shard its in-dim (reduce after).
    # The tied to_{q,k}_attn_logits [C, nh] contract over the sharded
    # hidden axis → shard in-dim.
    (re.compile(r".*attn_\d+/(query|key)/kernel"), P(None, "model")),
    (re.compile(r".*attn_\d+/transform/kernel"), P("model", None)),
    (re.compile(r".*to_(q|k)_attn_logits/kernel"), P("model", None)),
    # lstransformer long-short attention (ref lstransformer.py:218-394):
    # to_q/to_kv [C, h*dh] shard the head axis; to_out [h*dh, C] reduces.
    (re.compile(r".*attn_\d+/(to_q|to_kv)/kernel"), P(None, "model")),
    (re.compile(r".*attn_\d+/to_out/kernel"), P("model", None)),
    # conformer (ref conformer.py:162-246): macaron FFNs shard the 4×
    # expansion; rel-pos attention shards heads incl. the u/v biases.
    (re.compile(r".*(ff1|ff2)/Dense_0/kernel"), P(None, "model")),
    (re.compile(r".*(ff1|ff2)/Dense_1/kernel"), P("model", None)),
    (re.compile(r".*attn/(query_proj|key_proj|value_proj|pos_proj)/kernel"),
     P(None, "model", None)),
    (re.compile(r".*attn/out_proj/kernel"), P("model", None, None)),
    (re.compile(r".*attn/(u_bias|v_bias)$"), P("model", None)),
    # reformer (ref reformer.py:304-563): depth-tied LSH attention + FF.
    (re.compile(r".*reformer/attn/(toqk|tov)/kernel"), P(None, "model")),
    (re.compile(r".*reformer/attn/to_out/kernel"), P("model", None)),
    (re.compile(r".*reformer/ff/w1/kernel"), P(None, "model")),
    (re.compile(r".*reformer/ff/w2/kernel"), P("model", None)),
]


def param_spec(path, leaf, mesh=None, dropped=None):
    path_str = "/".join(str(k.key) if hasattr(k, "key") else str(k)
                        for k in path)
    for rule, spec in _TP_RULES:
        if rule.match(path_str):
            if len(spec) != leaf.ndim:
                continue
            if mesh is not None and not _divisible(leaf, spec, mesh):
                # matched rule downgraded to replication: record it so
                # check_tp_coverage can report lost parallelism instead of
                # silently passing on one surviving sharded param
                if dropped is not None:
                    dropped.append((path_str, tuple(leaf.shape), spec))
                continue
            return spec
    return P()


def _divisible(leaf, spec, mesh):
    for dim, axis in zip(leaf.shape, spec):
        if axis is not None and dim % mesh.shape[axis] != 0:
            return False
    return True


def check_tp_coverage(variables, mesh, block_type=None):
    """Fail fast if the 'model' axis is >1 but no parameter is sharded over
    it — otherwise every chip on that axis holds a full replica and burns
    for zero speedup. Called by train.py / the dryrun entry whenever a
    model axis is requested."""
    if mesh.shape.get("model", 1) <= 1:
        return 0
    hits = 0
    dropped = []
    def count(path, leaf):
        nonlocal hits
        spec = param_spec(path, leaf, mesh, dropped=dropped)
        if any(a == "model" or (isinstance(a, tuple) and "model" in a)
               for a in spec):
            hits += 1
        return leaf
    jax.tree_util.tree_map_with_path(count, variables)
    if hits == 0:
        raise ValueError(
            f"mesh model axis = {mesh.shape['model']} but no parameter of "
            f"block_type={block_type!r} matches a tensor-parallel rule "
            "(parallel/mesh.py _TP_RULES) — the model axis would silently "
            "replicate. Use model=1 or add TP rules for this block.")
    if dropped:
        import warnings
        ex = "; ".join(f"{p} {s}" for p, s, _ in dropped[:4])
        warnings.warn(
            f"{len(dropped)} parameter(s) matched a TP rule but were "
            f"replicated because a sharded dim is not divisible by the "
            f"model axis ({mesh.shape['model']}): {ex}"
            + (" ..." if len(dropped) > 4 else "")
            + f" — {hits} parameter(s) remain sharded. Pick head/channel "
            "counts divisible by the model axis to keep full tensor "
            "parallelism.", stacklevel=2)
    return hits


def shard_params(variables, mesh):
    """Place params/batch_stats on the mesh per the TP rules."""
    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(path, leaf, mesh)))
    return jax.tree_util.tree_map_with_path(place, variables)


def param_shardings(variables, mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf, mesh)),
        variables)
