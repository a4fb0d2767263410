"""Round-over-round per-query latency delta table.

Usage: python tools/bench_delta.py OLD.json NEW.json [flag_ratio]

Each input is either a raw bench.py JSON line or a driver artifact
wrapping it under "parsed".  Prints a markdown table (old sec, new sec,
ratio) sorted by ratio descending, flagging queries slower than
`flag_ratio` (default 2.0 — the VERDICT threshold "anything >2x at
equal materialization"), with new queries getting a first-history row.
Single sf0.1 timings on this host swing with hypervisor steal (see
BENCH/BASELINE.md), so flags are leads for a re-measure, not verdicts.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key (unparsed artifact?)")
    return d


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flag_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old["queries"], new["queries"]

    rows = []
    for name, nsec in nq.items():
        osec = oq.get(name)
        ratio = (nsec / osec) if osec else None
        rows.append((name, osec, nsec, ratio))
    rows.sort(key=lambda r: (r[3] is not None, r[3] or 0), reverse=True)

    print("| query | old s | new s | ratio |")
    print("|---|---|---|---|")
    flagged = []
    for name, osec, nsec, ratio in rows:
        if ratio is None:
            print(f"| {name} | new | {nsec} | — |")
            continue
        mark = ""
        if ratio >= flag_ratio:
            mark = " **FLAG**"
            flagged.append(name)
        print(f"| {name} | {osec} | {nsec} | {ratio:.2f}{mark} |")
    gone = sorted(set(oq) - set(nq))
    shared = [r for r in rows if r[3] is not None]
    tot_o = sum(r[1] for r in shared)
    tot_n = sum(r[2] for r in shared)
    print(f"\nshared {len(shared)} queries: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({tot_n / tot_o:.2f}x); {len(rows) - len(shared)} new, "
          f"{len(gone)} removed{': ' + ', '.join(gone) if gone else ''}")
    if flagged:
        print(f"flagged >= {flag_ratio}x: {', '.join(flagged)}")


if __name__ == "__main__":
    main()
