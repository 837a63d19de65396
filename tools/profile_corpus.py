"""Stage-level wall-clock profile of corpus_clean (VERDICT r6 item 6).

Times cumulative prefixes of the pipeline at sf0.1 so the dominant
stage is visible: scan+tokenize, +marker scores, +gate, +md5 window
dedup, then near-dup clustering on the survivors, then the full lane
exactly as bench.py runs it. Each stage is min-of-3 after one warm lap.

Usage: python tools/profile_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession
import pyspark.sql.functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_corpus")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from teste_carga_avro_vs_json_spark.session import configure, load_table
    from teste_carga_avro_vs_json_spark.operators import corpus, dedup
    from teste_carga_avro_vs_json_spark.operators.text import (
        _MARKERS,
        _marker_count,
        tokens,
    )

    configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def docs_df():
        return load_table(spark, sf_dir, "documents").repartition(cpus)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def staged():
        return docs_df().select(
            "doc_id",
            "text",
            F.length("text").cast("long").alias("chars"),
            tokens("text").alias("toks"),
        )

    def scored():
        return staged().select(
            "doc_id",
            "text",
            "chars",
            F.size("toks").cast("long").alias("words"),
            *[
                _marker_count(F.col("toks"), ws).cast("long").alias(f"s_{code}")
                for code, ws in _MARKERS.items()
            ],
        )

    def uniq():
        return corpus.gated_unique(docs_df())

    stages = {
        "scan_tokens": lambda: run(staged().select("doc_id", F.size("toks").alias("n"))),
        "plus_marker_scores": lambda: run(scored().drop("text")),
        "gated_unique": lambda: run(uniq().drop("text")),
        "neardup_on_survivors": None,  # filled below (needs cached survivors)
        "full_corpus_clean": lambda: run(
            corpus.corpus_clean(docs_df(), scale=True)
        ),
    }

    surv = uniq().select("doc_id", "text").persist()
    surv.count()

    def neardup_only():
        run(dedup.neardup_clusters(surv, scale=True))

    stages["neardup_on_survivors"] = neardup_only

    results = {}
    for name, fn in stages.items():
        fn()  # warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        results[name] = round(min(walls), 3)
        print(f"{name}: {results[name]} s  (laps {[round(x,3) for x in walls]})", flush=True)

    surv.unpersist()
    print({"profile": results, "loadavg_1m": round(os.getloadavg()[0], 1)})
    spark.stop()


if __name__ == "__main__":
    main()
