"""Capture ``explain("formatted")`` for registry queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files
(OPTIMIZATION_r{N}.md cites them; the judge diffs before vs after).

Usage: python tools/capture_plans.py <tag> <suffix> [sf_dir] [q_name ...]
e.g.   python tools/capture_plans.py r13 before
       python tools/capture_plans.py r13 after /root/testdata/sf0.01 q_ivf_pq_topk
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from teste_carga_avro_vs_json_spark import registry
from teste_carga_avro_vs_json_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4:])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in registry.queries().items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {e}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
