"""r11 audit: find queries whose heavy per-row work (ArrowEvalPython,
Generate, regexp/HOF-laden Project/Filter) executes in the 1-partition
scan stage, i.e. BELOW the first Exchange above the parquet scan.

For each query: reconstruct the physical plan tree bottom-up along the
scan's spine and report the nodes between Scan and the first Exchange.
Heuristic on the formatted explain: walk numbered nodes; the plan tree
indentation gives parentage — we just report, per scan leaf, the chain
of ancestor node names until an Exchange appears, plus whether any
chain node is Generate/ArrowEvalPython or contains split/regexp/
transform/aggregate-HOF text in its detail block.
"""
import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from chatdata_spark.session import get_spark  # noqa: E402
from chatdata_spark import registry  # noqa: E402

spark = get_spark(app_name="audit_scan_stage")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

HEAVY = re.compile(r"split\(|regexp|lambdafunction|_embed|xxhash64|sha2|aggregate\(")

names = sys.argv[1:]
qmap = registry.queries()
for name in names:
    fn = qmap.get(name)
    if fn is None:
        print(f"{name}: NOT FOUND", file=sys.stderr)
        continue
    try:
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: ERROR {exc}", file=sys.stderr)
        continue
    tree, _, rest = plan.partition("\n\n")
    detail = {}
    for block in rest.split("\n\n"):
        m = re.match(r"\((\d+)\)\s+(\S+)", block)
        if m:
            detail[int(m.group(1))] = block
    # parse tree lines into (indent, id, label)
    nodes = []
    for line in tree.splitlines():
        m = re.search(r"([:+]-|==)?\s*([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$", line)
        if m:
            indent = len(line) - len(line.lstrip(" :+-="))
            nodes.append((indent, int(m.group(3)), m.group(2).strip(), line))
    # find scan leaves; ancestors = nodes appearing ABOVE with smaller indent
    out_lines = []
    for i, (ind, nid, label, line) in enumerate(nodes):
        if not label.startswith("Scan"):
            continue
        chain = []
        cur = ind
        for j in range(i - 1, -1, -1):
            pind, pid, plabel, _ = nodes[j]
            if pind < cur:
                chain.append((pid, plabel))
                cur = pind
                if "Exchange" in plabel or "Broadcast" in plabel:
                    break
        heavy = [
            f"{pid}:{plabel}"
            for pid, plabel in chain
            if "Exchange" not in plabel
            and (
                plabel in ("Generate", "ArrowEvalPython", "BatchEvalPython", "Window", "Sort")
                or HEAVY.search(detail.get(pid, ""))
            )
        ]
        if heavy:
            out_lines.append(f"  scan({nid}) pre-exchange heavy: {heavy}")
    status = "FLAG" if out_lines else "ok"
    print(f"{name}: {status}")
    for l in out_lines:
        print(l)
