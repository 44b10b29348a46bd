#!/usr/bin/env python
"""Capture `explain("formatted")` output for named registry queries into
text files — the optimization-round evidence artifact (plans/r11/).

Usage:
    python tools/capture_plans.py <outdir> <suffix> <name>[,<name>...]

Writes <outdir>/<name>_<suffix>.txt for each query. For iterative
operators the capture is the FINAL plan (their per-round work runs at
plan-build time over localCheckpoint'd frames; the file records the
shape of the lineage that remains, which is what changes when rounds are
restructured)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from chatdata_spark.registry import queries  # noqa: E402
from chatdata_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    qs = queries()
    for name in names:
        df = qs[name](spark, DEFAULT_SF_DIR)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
