"""Assemble a strided-quality ladder table from quality.json artifacts into a
markdown table + a JSON summary.

Usage:
    python out/r4/ladder_table.py                      # committed r4 artifacts
    python out/r4/ladder_table.py LABEL=DIR [...]      # e.g. a fresh run:
    python out/r4/ladder_table.py full=out/ladder_s0 S100=out/ladder_s100 \
        S50=out/ladder_s50 S25=out/ladder_s25 --out out/ladder_summary.json

The Makefile `quality-ladder` target regenerates samples into out/ladder_s*
and passes those directories here, so the printed table reflects the run just
performed (not the committed evidence).
"""

import json
import os
import sys

DEFAULT_ROWS = [
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
    ("gen_mean_num_atoms", "gen atoms"),
    ("ref_mean_num_atoms", "ref atoms"),
]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out_path = "out/r4/ladder_summary.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    # rsplit: labels may themselves contain '=' (e.g. "S=100=out/ladder_s100")
    rows = [tuple(a.rsplit("=", 1)) for a in argv if "=" in a] or DEFAULT_ROWS

    table = []
    for label, d in rows:
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
    json.dump(summary, open(out_path, "w"), indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
