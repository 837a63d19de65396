"""Avro-vs-JSON(-vs-parquet) comparison — the reference's research
question, answered on the engine's file pipelines.

For each (format, compression): write the wire dataset, measure wall
time + on-disk bytes, read it back through full decode, measure wall
time. Prints one JSON line per combination plus a ranked summary.

Usage: python tools/format_compare.py [n_msgs] [kb]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    kb = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from teste_carga_avro_vs_json_spark.session import get_spark
    from teste_carga_avro_vs_json_spark.sources import generator, io_files

    spark = get_spark("format-compare")
    spark.sparkContext.setLogLevel("ERROR")
    msgs = generator.mensagens(spark, n, kb)

    combos = [
        ("json", "none", io_files.write_json, io_files.read_json),
        ("json", "gzip", io_files.write_json, io_files.read_json),
        ("avro_parquet", "lz4", io_files.write_avro, io_files.read_avro),
        ("avro_ocf", "none", io_files.write_avro_ocf, io_files.read_avro_ocf),
        ("avro_ocf", "gzip", io_files.write_avro_ocf, io_files.read_avro_ocf),
        ("parquet", "lz4", io_files.write_parquet, io_files.read_parquet),
        ("parquet", "zstd", io_files.write_parquet, io_files.read_parquet),
    ]

    results = []
    for fmt, comp, writer, reader in combos:
        path = tempfile.mkdtemp(prefix=f"cmp_{fmt}_{comp}_")
        try:
            t0 = time.perf_counter()
            writer(msgs, path, 18, comp)
            t_write = time.perf_counter() - t0
            nbytes = _du(path)
            t0 = time.perf_counter()
            back = reader(spark, path)
            decoded = back.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.size("dados")).alias("regs"),
            ).collect()
            t_read = time.perf_counter() - t0
            assert decoded[0]["n"] == n, f"{fmt}/{comp}: row loss"
            row = {
                "format": fmt,
                "compression": comp,
                "bytes_total": nbytes,
                "bytes_per_msg": round(nbytes / n, 1),
                "write_s": round(t_write, 2),
                "read_s": round(t_read, 2),
                "write_msgs_s": round(n / t_write),
                "read_msgs_s": round(n / t_read),
            }
            results.append(row)
            print(json.dumps(row))
        finally:
            shutil.rmtree(path, ignore_errors=True)

    best_size = min(results, key=lambda r: r["bytes_total"])
    best_read = max(results, key=lambda r: r["read_msgs_s"])
    print(
        json.dumps(
            {
                "summary": {
                    "smallest": f"{best_size['format']}/{best_size['compression']}",
                    "fastest_read": f"{best_read['format']}/{best_read['compression']}",
                    "json_vs_avro_size_ratio": round(
                        next(r["bytes_total"] for r in results
                             if r["format"] == "json" and r["compression"] == "none")
                        / next(r["bytes_total"] for r in results
                               if r["format"] == "avro_ocf" and r["compression"] == "none"),
                        2,
                    ),
                    "n_msgs": n,
                    "kb": kb,
                }
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
