"""One-off profiler for the corpus_clean bench lane: times each stage
of the pipeline separately on the bench configuration so optimization
work targets the real hot spot instead of the total.

Usage: python tools/profile_corpus_clean.py [sf_dir] [laps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    laps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from teste_carga_avro_vs_json_spark.operators import corpus, dedup
    from teste_carga_avro_vs_json_spark.operators.text import _MARKERS, _marker_count, tokens
    from teste_carga_avro_vs_json_spark.session import configure, load_table

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-corpus-clean")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def docs_df():
        return load_table(spark, sf_dir, "documents").repartition(cpus)

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn, results):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        results.setdefault(name, []).append(dt)

    # ---- stage bodies -------------------------------------------------
    def full():
        run(corpus.corpus_clean(docs_df(), scale=True))

    def score_gate_window():
        # score → gate → md5-window dedup, stop before near-dup
        docs = docs_df()
        staged = docs.select(
            "doc_id", "text",
            F.length("text").cast("long").alias("chars"),
            tokens("text").alias("toks"),
        )
        scored = staged.select(
            "doc_id", "text", "chars",
            F.size("toks").cast("long").alias("words"),
            *[
                _marker_count(F.col("toks"), ws).cast("long").alias(f"s_{c}")
                for c, ws in _MARKERS.items()
            ],
        )
        words_nz = F.greatest(F.col("words"), F.lit(1))
        quality = (
            F.when((F.col("words") >= 20) & (F.col("words") <= 2000), F.lit(0.5)).otherwise(F.lit(0.0))
            + F.when(F.col("s_en") > 0, F.lit(0.3)).otherwise(F.lit(0.0))
            + F.when((F.col("chars") / words_nz >= 3) & (F.col("chars") / words_nz <= 12), F.lit(0.2)).otherwise(F.lit(0.0))
        )
        best = F.greatest(*[F.col(f"s_{c}") for c in _MARKERS])
        pred = F.when(best <= 0, F.lit("und"))
        for c in sorted(_MARKERS):
            pred = pred.when(F.col(f"s_{c}") == best, F.lit(c))
        kept = (
            scored.withColumn("quality", quality)
            .withColumn("lang_pred", pred)
            .filter((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
        )
        w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
        run(
            kept.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "text", "words", "quality")
        )

    def neardup_only():
        # LSH candidates + clustering over the RAW docs (slightly more
        # rows than the gated survivor set, so an upper bound)
        run(dedup.neardup_clusters(docs_df().select("doc_id", "text"), threshold=0.3, scale=True))

    def lsh_only():
        run(dedup.minhash_lsh_candidates_scale(docs_df().select("doc_id", "text"), threshold=0.3))

    def shingle_only():
        run(dedup._shingled(docs_df().select("doc_id", "text"), 3))

    stages = {
        "full_corpus_clean": full,
        "score_gate_window": score_gate_window,
        "neardup_clusters_raw": neardup_only,
        "lsh_candidates_raw": lsh_only,
        "shingles_raw": shingle_only,
    }

    results: dict[str, list[float]] = {}
    for fn in stages.values():  # warm lap
        fn()
    for _ in range(laps):
        for name, fn in stages.items():
            t(name, fn, results)

    for name, xs in results.items():
        print(f"{name:24s} min={min(xs):6.3f}  all={[round(x,3) for x in xs]}")
    print("loadavg", os.getloadavg())
    spark.stop()


if __name__ == "__main__":
    main()
