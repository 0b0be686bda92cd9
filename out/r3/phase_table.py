"""Join a jax.profiler trace with the compiled HLO's op metadata to produce a
per-phase cost table for the canonical train step.

Usage: python out/r3/phase_table.py <trace.json.gz> <hlo.txt> [n_steps]
"""
import gzip
import json
import re
import sys
from collections import defaultdict

trace_path, hlo_path = sys.argv[1], sys.argv[2]
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

# --- op -> op_name metadata from HLO text ---
op_meta = {}
pat = re.compile(r"%([\w.\-]+) = .*?op_name=\"([^\"]+)\"")
for line in open(hlo_path):
    m = pat.search(line)
    if m and m.group(1) not in op_meta:
        op_meta[m.group(1)] = m.group(2)

# --- aggregate trace ---
with gzip.open(trace_path, "rt") as f:
    data = json.load(f)
events = data["traceEvents"]
thread_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")


def phase_of(meta: str) -> str:
    """Map a jax op_name path to a coarse phase."""
    if "basis_fn" in meta and "fiber_basis_fn" not in meta:
        d = "bwd" if "transpose" in meta else "fwd"
        return f"basis_mlp_{d}"
    if "fiber_basis_fn" in meta:
        return "fiber_basis_mlp"
    if "/conv/pallas_call" in meta or "conv/add_any" in meta:
        d = "bwd" if "transpose" in meta else "fwd"
        return f"conv_pallas_{d}"
    if re.search(r"layer_\d+/(conv)/", meta):
        d = "bwd" if "transpose" in meta else "fwd"
        return f"conv_xla_{d}"  # fiber einsum & friends
    if re.search(r"layer_\d+/(linear_1|linear_2|norm)", meta):
        d = "bwd" if "transpose" in meta else "fwd"
        return f"convnext_mlp_{d}"
    if "readout" in meta:
        return "readouts"
    if "x_embedder" in meta:
        return "embedder"
    if "PonitaFiberBundle" in meta:
        d = "bwd" if "transpose" in meta else "fwd"
        return f"backbone_misc_{d}"
    if "radius_graph" in meta or "pbc" in meta or "top_k" in meta or "neighbor" in meta:
        return "graph_build"
    if "adamw" in meta or "optim" in meta or "ema" in meta or "add_decayed" in meta or "scale_by" in meta:
        return "optimizer"
    return "other"


agg = defaultdict(float)
byop = defaultdict(float)
unknown = defaultdict(float)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    tname = thread_names.get((e.get("pid"), e.get("tid")), "")
    if "XLA Ops" not in tname:
        continue
    name = e["name"]
    dur = e.get("dur", 0) / 1000.0
    total += dur
    meta = op_meta.get(name, "")
    ph = phase_of(meta) if meta else "unmapped"
    agg[ph] += dur
    byop[(ph, name, meta[:90])] += dur
    if not meta:
        unknown[name] += dur

print(f"total device time: {total/n_steps:.2f} ms/step\n")
for ph, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
    print(f"{ms/n_steps:7.2f} ms  {ph}")

print("\n-- top ops per phase --")
for ph in sorted(agg, key=lambda p: -agg[p]):
    rows = sorted(((v, k) for k, v in byop.items() if k[0] == ph), reverse=True)[:6]
    print(f"\n[{ph}] {agg[ph]/n_steps:.2f} ms/step")
    for v, (_, name, meta) in rows:
        print(f"  {v/n_steps:7.3f} ms  {name:<32s} {meta}")

if unknown:
    rows = sorted(unknown.items(), key=lambda kv: -kv[1])[:10]
    print("\n-- unmapped ops --")
    for name, v in rows:
        print(f"  {v/n_steps:7.3f} ms  {name}")
