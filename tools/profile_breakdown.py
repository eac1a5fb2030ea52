"""Aggregate a jax.profiler xplane trace into a per-step time breakdown.

Substantiates the MFU/floor claims in README's perf table with measured
device time per category (attention fwd/bwd, conv+FFN matmuls, the MAS/CTC
dynamic programs, optimizer, ...) instead of assertions.

Usage:
    BENCH_PROFILE=/tmp/prof BENCH_BLOCK=conformer python bench_train.py
    python tools/profile_breakdown.py /tmp/prof/conformer [n_steps]

Parses the XLA Ops line of the TPU plane (every HLO's device duration +
its JAX scope via the tf_op stat) with the xplane proto shipped inside
tensorflow; prints a markdown table of ms/step by category. n_steps
defaults to the number of Steps-line events in the trace.
"""

import glob
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


# category -> predicate over (hlo_name, hlo_category, jax_scope)
def categorize(name, cat, scope):
    s = scope or ""
    grad = "transpose(jvp" in s
    if "/attn/" in s or "attention" in s.lower() or name.startswith("%attn"):
        return "attention bwd" if grad else "attention fwd"
    if cat == "convolution" or "convolution" in (cat or "") \
            or "/conv" in s or "/ff" in s or "Dense" in s:
        return "conv+matmul bwd" if grad else "conv+matmul fwd"
    if cat == "while" or "while" in name:
        return "scan/DP (while)"
    if "mas" in s or "forward_sum" in s or "ctc" in s:
        return "scan/DP (while)"
    if "adam" in s or "scale_by" in s or "optimizer" in s:
        return "optimizer"
    if cat in ("all-reduce", "all-gather", "collective"):
        return "collectives"
    if cat in ("copy", "memcpy") or name.startswith(("%copy", "%slice",
                                                     "%bitcast")):
        return "copies/layout"
    return "other (fusions, embeds, losses)"


def load_plane(profile_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    pbs = sorted(glob.glob(os.path.join(
        profile_dir, "plugins/profile/*/*.xplane.pb")))
    if not pbs:
        raise SystemExit(f"no xplane.pb under {profile_dir}")
    xs = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for p in xs.planes:
        if p.name.startswith("/device:TPU"):
            return p
    raise SystemExit("no TPU plane in trace")


def breakdown(profile_dir, n_steps=None):
    plane = load_plane(profile_dir)
    sm = {k: v.name for k, v in plane.stat_metadata.items()}
    meta = {}
    for mid, m in plane.event_metadata.items():
        cat = scope = None
        for st in m.stats:
            n = sm.get(st.metadata_id)
            if n == "hlo_category":
                cat = st.str_value or st.ref_value
            elif n == "tf_op":
                scope = st.str_value
        meta[mid] = (m.name.split(" = ")[0], cat, scope)

    lines = {ln.name: ln for ln in plane.lines}
    if n_steps is None:
        # one "Step" per jit call including tiny helper jits (rng seeding,
        # dtype converts) — count executions of the DOMINANT module instead
        mods = defaultdict(lambda: [0, 0.0])
        for ev in lines["XLA Modules"].events:
            rec = mods[ev.metadata_id]
            rec[0] += 1
            rec[1] += ev.duration_ps
        n_steps = max(mods.values(), key=lambda r: r[1])[0]
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    for ev in lines["XLA Ops"].events:
        name, cat, scope = meta[ev.metadata_id]
        ms = ev.duration_ps / 1e9
        by_cat[categorize(name, cat, scope)] += ms
        key = re.sub(r"[_.]\d+$", "", name)
        by_op[(key, categorize(name, cat, scope))] += ms

    total = sum(by_cat.values())
    print(f"trace: {profile_dir}  steps: {n_steps}  "
          f"device total: {total / n_steps:.2f} ms/step\n")
    print("| category | ms/step | % |")
    print("|---|---|---|")
    for c, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"| {c} | {ms / n_steps:.2f} | {100 * ms / total:.1f}% |")
    print("\ntop ops:")
    for (op, c), ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {ms / n_steps:6.2f} ms/step  {c:26s} {op}")
    return {c: ms / n_steps for c, ms in by_cat.items()}


if __name__ == "__main__":
    d = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else None
    breakdown(d, n)
