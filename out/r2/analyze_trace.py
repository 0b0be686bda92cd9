"""Aggregate TPU op durations from a jax.profiler chrome trace."""
import gzip
import json
import sys
from collections import defaultdict

path = sys.argv[1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
# find the TPU op lanes: pick pids whose process name mentions TPU/XLA
proc_names = {}
thread_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        proc_names[e["pid"]] = e["args"].get("name", "")
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

agg = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    tname = thread_names.get((e.get("pid"), e.get("tid")), "")
    pname = proc_names.get(e.get("pid"), "")
    # XLA op lane on device
    if "XLA Ops" not in tname and "Steps" not in tname:
        continue
    if "XLA Ops" in tname:
        name = e["name"]
        dur = e.get("dur", 0) / 1000.0  # ms
        agg[name] += dur
        cnt[name] += 1
        total += dur

rows = sorted(agg.items(), key=lambda kv: -kv[1])
print(f"total XLA-op time: {total:.2f} ms over trace ({total/5:.2f} ms/step if 5 steps)")
for name, ms in rows[:40]:
    print(f"{ms:8.3f} ms  x{cnt[name]:<5d} {name[:110]}")
