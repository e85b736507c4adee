#!/usr/bin/env python
"""Generate the driver-attestation ledger: for every registered gate query,
the round of its LAST driver attestation (from CORRECTNESS_r*.json) and its
position in the current `_PRIORITY` rotation.

The driver checks a bounded window (~50 queries) per round, so attestation
freshness is a managed resource; this ledger makes the freshness debt
visible in-repo instead of being reconstructed by each judge (VERDICT r5
next-round #8). Output replaces the `## Attestation ledger` section of
COVERAGE.md (appends it if absent).

Usage: python tools/attestation_ledger.py [--check|--suggest]
  --check    exit 1 if COVERAGE.md is out of date instead of rewriting it.
  --suggest  print the recommended next-round `_PRIORITY` body (never-
             attested names first, then oldest-attested first, stable by
             current order) ready to paste into querylib/__init__.py.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARKER = "## Attestation ledger"


def gather() -> tuple[list[str], dict[str, tuple[int, bool]]]:
    """Returns (priority-ordered names, {name: (last_round, passed)})."""
    sys.path.insert(0, REPO)
    from databricks_import_pyspark_scripts_spark.querylib import all_queries

    names = list(all_queries())
    hist: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok = bool(row.get("rows_match")) and row.get("err") is None and (
                row.get("hash_match") is not False)
            hist[name] = (rnd, ok)
    return names, hist


def render(names: list[str], hist: dict[str, tuple[int, bool]]) -> str:
    from collections import Counter

    counts = Counter(hist[n][0] if n in hist else 0 for n in names)
    summary = ", ".join(
        f"{'never' if rnd == 0 else f'r{rnd}'}: {c}"
        for rnd, c in sorted(counts.items()))
    lines = [
        MARKER,
        "",
        "Round of each gate query's last driver attestation "
        "(`CORRECTNESS_r*.json`), in current `_PRIORITY` order — the driver "
        "window (~50/round) attests from the top. Regenerate with "
        "`python tools/attestation_ledger.py`.",
        "",
        f"Freshness summary — {summary} (of {len(names)} registered).",
        "",
        "| # | query | last attested | result |",
        "|---|---|---|---|",
    ]
    for i, n in enumerate(names):
        if n in hist:
            rnd, ok = hist[n]
            lines.append(f"| {i} | {n} | r{rnd} | "
                         f"{'pass' if ok else 'FAIL'} |")
        else:
            lines.append(f"| {i} | {n} | never | — |")
    return "\n".join(lines) + "\n"


def main() -> int:
    names, hist = gather()
    if "--suggest" in sys.argv:
        order = sorted(range(len(names)),
                       key=lambda i: (hist.get(names[i], (0,))[0], i))
        try:
            for i in order:
                print(f'    "{names[i]}",')
        except BrokenPipeError:  # piped through head — not an error
            pass
        return 0
    section = render(names, hist)
    cov_path = os.path.join(REPO, "COVERAGE.md")
    with open(cov_path) as f:
        cov = f.read()
    if MARKER in cov:
        head = cov.split(MARKER)[0]
        new = head + section
    else:
        new = cov.rstrip("\n") + "\n\n" + section
    if "--check" in sys.argv:
        if new != cov:
            print("COVERAGE.md attestation ledger is stale — regenerate")
            return 1
        print("ledger up to date")
        return 0
    with open(cov_path, "w") as f:
        f.write(new)
    print(f"wrote ledger: {len(names)} queries, "
          f"{sum(1 for n in names if n not in hist)} never attested")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
