#!/usr/bin/env python
"""Regenerate COVERAGE.md's driver-window audit table from the live
registry + the CORRECTNESS_r*.json history (r9 verdict item 6: rotation
priority must be auditable — the green-count column is derived
MECHANICALLY here, never hand-edited; run this after any DRIVER_WINDOW
rotation or query registration and commit the result).

Columns: query | window (in (rN)/out) | greens (driver hash-green
rounds, e.g. "2 (r6,r8)" — 0 = never driver-checked) | check
(oracle/rows-only). tests/test_registry_window.py re-derives the same
counts and pins the table against both the registry and the history.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CURRENT_ROUND = 12  # bump when rotating the window for a new round


def green_rounds() -> dict[str, list[int]]:
    """Driver-green rounds per query, from COMPLETED rounds only
    (< CURRENT_ROUND). The live round's artifact lands post-close —
    counting it would make the committed table red the moment the driver
    writes CORRECTNESS_r{CURRENT_ROUND}.json (r10 ADVICE); the next
    rotation's CURRENT_ROUND bump + regen folds it in deliberately."""
    out: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        if rnd >= CURRENT_ROUND:
            continue
        for name, v in json.load(open(f)).items():
            if v.get("hash_match"):
                out.setdefault(name, []).append(rnd)
    return out


def main() -> None:
    from chatdata_spark.registry import DRIVER_WINDOW, _REGISTRY, _load_all

    _load_all()
    greens = green_rounds()
    lines = ["| query | window | greens | check |", "|---|---|---|---|"]
    for name in list(DRIVER_WINDOW) + [n for n in _REGISTRY if n not in DRIVER_WINDOW]:
        qd = _REGISTRY[name]
        window = f"in (r{CURRENT_ROUND})" if name in DRIVER_WINDOW else "out"
        g = greens.get(name, [])
        gcol = f"{len(g)} ({','.join(f'r{r}' for r in g)})" if g else "0"
        check = "oracle" if qd.oracle is not None else "rows-only"
        lines.append(f"| `{name}` | {window} | {gcol} | {check} |")
    table = "\n".join(lines)

    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path).read()
    # replace the first markdown table that starts with the audit header
    pat = re.compile(
        r"\| query \| window \|[^\n]*\n\|[-| ]+\|\n(?:\|[^\n]*\n)+", re.M
    )
    new, n = pat.subn(table + "\n", text, count=1)
    assert n == 1, "audit table not found in COVERAGE.md"
    open(path, "w").write(new)
    never = [n_ for n_ in _REGISTRY if n_ not in greens]
    print(f"wrote {len(_REGISTRY)} rows; never-green: {len(never)} {never}")


if __name__ == "__main__":
    main()
