"""Print the scale audit (plans.audit) for every registry query AND
every check_retired local-oracle surface (retired + extras), so plans
outside the 50-slot driver window get the same per-round scrutiny.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from teste_carga_avro_vs_json_spark import plans, registry
from teste_carga_avro_vs_json_spark.session import get_spark


def main() -> None:
    from tools.check_retired import retired_queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    local = {
        f"[local] {name}": fn for name, fn in retired_queries().items()
    }
    for name, fn in {**registry.queries(), **local}.items():
        try:
            a = plans.audit(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: AUDIT FAILED {e}")
            continue
        flags = "; ".join(a.warnings) if a.warnings else "-"
        print(
            f"{name}: exch={a.exchanges} py={a.python_evals} "
            f"codegen={a.codegen_spans} bhj={a.broadcast_joins} "
            f"smj={a.sortmerge_joins} cart={a.cartesian} "
            f"expfilt={len(a.expensive_filters)} [{flags}]"
        )
        for h in a.expensive_filters:
            print(f"    expensive-filter: {h}")
    spark.stop()


if __name__ == "__main__":
    main()
