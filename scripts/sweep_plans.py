"""Mechanical plan-pathology sweep (optimization rounds, guide §1.3).

Builds every HEADLINE query's formatted plan driver-side and reports:
window-expression count vs DISTINCT window functions (a gap means
Catalyst duplicated un-named window subtrees — the ewma_alerts bug
class), Exchange count, Python-eval nodes, and parquet scans. Rows
print only when a signal trips (duplication, >=5 exchanges, >=6 py
nodes)."""

import os
import re
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hash_db_spark.session import get_spark
from hash_db_spark.queries import all_queries
import bench
SF="/root/testdata/sf0.1"
spark = get_spark(app_name="sweep")
reg = all_queries()
out=[]
for name in bench.HEADLINE:
    if name not in reg: continue
    try:
        df = reg[name].fn(spark, SF)
        s = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as e:
        print(name, "ERR", str(e)[:80], flush=True); continue
    wes = len(set(re.findall(r"_we\d+#", s)))
    # distinct window FUNCTION templates (dedup by function+frame)
    wfuncs = len(set(re.findall(r"(\w+\([^)]*\)) windowspecdefinition\([^)]*specifiedwindowframe\(([^)]*)\)", s)))
    exch = len(re.findall(r"\(\d+\) Exchange", s))
    py = len(re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", s))
    scans = len(re.findall(r"\(\d+\) Scan parquet", s))
    out.append((name, wes, wfuncs, exch, py, scans))
print(f"{'query':32s} wexpr wfn exch py scans")
for name, wes, wf, e, p, sc in sorted(out, key=lambda r: -(r[1]-r[2])):
    if wes>wf or e>=5 or p>=6:
        print(f"{name:32s} {wes:4d} {wf:3d} {e:3d} {p:3d} {sc:3d}")
spark.stop()
