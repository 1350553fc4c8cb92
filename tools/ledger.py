"""Driver-window ledger maintenance (COVERAGE.md).

Two chores every round, previously done by hand:

  append   fold CORRECTNESS_r{N}.json into COVERAGE.md's per-name
           ledger table (adds `rN`, `rN(rows)`, or `rN(fail)` tags;
           inserts rows for first-time names; keeps the table sorted)
  stale    print the K ledger names with the oldest latest-clean
           driver round, excluding an optional current-window file —
           the seed list for the next freshness-rotation window

Usage:
  python tools/ledger.py append --round 13
  python tools/ledger.py stale --top 49 [--exclude-window]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COVERAGE = os.path.join(REPO, "COVERAGE.md")
HEADER = "| Query | Driver-verified in |"


def _read_table() -> tuple[list[str], int, int, dict[str, str]]:
    lines = open(COVERAGE).read().split("\n")
    hdr = next(i for i, l in enumerate(lines) if l.strip() == HEADER)
    start = hdr + 2  # skip the |---|---| separator
    end = start
    while end < len(lines) and lines[end].startswith("| `"):
        end += 1
    entries = {}
    for l in lines[start:end]:
        m = re.match(r"\| `([^`]+)` \| (.+) \|$", l)
        entries[m.group(1)] = m.group(2)
    return lines, start, end, entries


def cmd_append(round_no: int) -> int:
    path = os.path.join(REPO, f"CORRECTNESS_r{round_no:02d}.json")
    if not os.path.exists(path):
        path = os.path.join(REPO, f"CORRECTNESS_r{round_no}.json")
    results = json.load(open(path))
    lines, start, end, entries = _read_table()
    for name, res in results.items():
        if res.get("err") == "no_oracle":
            tag = f"r{round_no}(rows)"
        elif res.get("hash_match"):
            tag = f"r{round_no}"
        else:
            tag = f"r{round_no}(fail)"
        prior = entries.get(name, "")
        if re.search(rf"\br{round_no}(\(rows\)|\(fail\))?\b", prior):
            continue  # already folded in
        entries[name] = f"{prior}, {tag}" if prior else tag
    table = [f"| `{n}` | {v} |" for n, v in sorted(entries.items())]
    out = lines[:start] + table + lines[end:]
    open(COVERAGE, "w").write("\n".join(out))
    print(f"ledger: {len(entries)} names after folding r{round_no} "
          f"({len(results)} window entries)")
    return 0


def cmd_stale(top: int, exclude_window: bool) -> int:
    _, _, _, entries = _read_table()
    skip: set[str] = set()
    if exclude_window:
        sys.path.insert(0, REPO)
        import __spark_entry__ as e  # noqa: PLC0415

        skip = set(e._WINDOW)
    latest = {}
    for name, tags in entries.items():
        clean = [int(m.group(1))
                 for m in re.finditer(r"r(\d+)\b(?!\(fail\))", tags)]
        latest[name] = max(clean) if clean else 0
    stale = sorted((r, n) for n, r in latest.items() if n not in skip)
    for r, n in stale[:top]:
        print(f"r{r:<3d} {n}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("append")
    a.add_argument("--round", type=int, required=True)
    s = sub.add_parser("stale")
    s.add_argument("--top", type=int, default=49)
    s.add_argument("--exclude-window", action="store_true")
    args = ap.parse_args()
    if args.cmd == "append":
        return cmd_append(args.round)
    return cmd_stale(args.top, args.exclude_window)


if __name__ == "__main__":
    sys.exit(main())
