"""r11 audit: queries whose physical plan evaluates the SAME Python UDF
call in more than one DISTINCT ArrowEvalPython/BatchEvalPython node —
the InferFiltersFromGenerate + predicate-pushdown duplication (a filter
on a Generate over a UDF-output column gets pushed below the spread
exchange, carrying a second copy of the UDF with it, evaluated on the
1-partition scan side; found live in decontaminate, r11).

A cached (persisted) subtree reprints its plan under every
InMemoryTableScan, so the same eval NODE can appear several times in
the formatted string — a real duplicate is same call args with a
DIFFERENT output column id (pythonUDF*#N)."""
import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from chatdata_spark.session import get_spark  # noqa: E402
from chatdata_spark import registry  # noqa: E402

spark = get_spark(app_name="audit_dup_udf")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

names = sys.argv[1:] or list(registry.queries().keys())
qmap = registry.queries()
flagged = 0
for name in names:
    fn = qmap.get(name)
    if fn is None:
        continue
    try:
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: ERROR {type(exc).__name__}", flush=True)
        continue
    nodes = re.findall(
        r"EvalPython\nInput.*?\nArguments: \[(.*?)\], \[(pythonUDF\d+#\d+)\]", plan
    )
    byargs: dict = {}
    for args, out in nodes:
        byargs.setdefault(args, set()).add(out)
    real = {a: o for a, o in byargs.items() if len(o) > 1}
    if real:
        flagged += 1
        print(f"{name}: REALDUP", flush=True)
        for a, o in real.items():
            print(f"   {a[:120]} -> {sorted(o)}", flush=True)
    else:
        print(f"{name}: ok", flush=True)
print(f"-- flagged: {flagged}", flush=True)
