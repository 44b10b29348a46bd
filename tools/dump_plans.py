"""Dump .explain('formatted') for named queries into plans/<dir>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <tag> name1 name2 ...
Run with cwd anywhere; repo_root is inserted on sys.path (worktree-friendly).
"""
import os
import sys

repo, out_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, repo)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from chatdata_spark.session import get_spark  # noqa: E402
from chatdata_spark import registry  # noqa: E402

spark = get_spark(app_name="dump_plans")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
os.makedirs(out_dir, exist_ok=True)
for name in names:
    fn = registry.queries().get(name)
    if fn is None:
        print(f"{name}: NOT FOUND", file=sys.stderr)
        continue
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path}", file=sys.stderr)
