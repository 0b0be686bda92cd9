"""Assemble the strided-quality ladder table (VERDICT r3 item 2) from the
out/r4/q_* quality.json artifacts into a markdown table + a JSON summary.

Usage: python out/r4/ladder_table.py
"""

import json
import os

ROWS = [
    ("T=1000 (full chain)", "out/r4/q_full"),
    ("S=100", "out/r4/q_s100"),
    ("S=50", "out/r4/q_s50"),
    ("S=25", "out/r4/q_s25"),
    ("angles-on full chain", "out/r4/q_ang_on"),
]

KEYS = [
    ("w1_lengths", "W1 len (A)"),
    ("w1_angles_deg", "W1 ang (deg)"),
    ("gen_length_mean", "len mean"),
    ("length_in_range_frac", "in-range"),
    ("min_dist_violation_rate", "min-dist viol"),
    ("type_geometry_mi", "MI"),
    ("uniqueness_frac", "unique"),
    ("novelty_frac", "novel"),
]


def main():
    table = []
    for label, d in ROWS:
        path = os.path.join(d, "quality.json")
        if not os.path.exists(path):
            print(f"-- missing {path}")
            continue
        rep = json.load(open(path))
        table.append((label, rep))

    avail = [k for k, _ in KEYS if any(k in rep for _, rep in table)]
    hdr = "| config | " + " | ".join(h for k, h in KEYS if k in avail) + " |"
    print(hdr)
    print("|" + "---|" * (len(avail) + 1))
    for label, rep in table:
        cells = []
        for k, _h in KEYS:
            if k not in avail:
                continue
            v = rep.get(k)
            cells.append(f"{v:.3f}" if isinstance(v, (int, float)) else "--")
        print(f"| {label} | " + " | ".join(cells) + " |")

    summary = {label: {k: rep.get(k) for k, _ in KEYS} for label, rep in table}
    out = "out/r4/ladder_summary.json"
    json.dump(summary, open(out, "w"), indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
