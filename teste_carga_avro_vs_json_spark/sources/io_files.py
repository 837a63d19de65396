"""File-based sinks/sources (O7 stand-in + north-star format comparison).

The reference's sink is an 18-partition Kafka topic with explicit
per-record routing (ProdutorAvro.java:67-90); its sources are
thread-per-partition consumers (ConsumidorAvro.java:45-125). Without a
broker, the faithful batch equivalents are partitioned file datasets:

- ``write_json`` / ``read_json``   — the JSON wire format as text files,
  one serialized message per line (exactly what the String serializer
  puts on the wire, ConfiguracaoKafka.java:158).
- ``write_avro`` / ``read_avro``   — Avro *binary* values from the
  pure-Python codec, stored as a one-binary-column parquet dataset.
  (The JVM spark-avro module is absent, so .format("avro") OCF files
  are unavailable; the payload bytes ARE real Avro binary — the
  container differs, the wire semantics don't.)
- ``write_parquet`` / ``read_parquet`` — the columnar baseline the
  reference never had; at 100 TB this is the layout that wins, so the
  comparison bench includes it.

All writes partition by the routing column ``particao = (seq-1) % P``
(``partitionBy`` → one directory per partition, matching the topic
layout). Compression passes through per format (lz4 default where the
format supports it, mirroring COMPRESSION_TYPE,
ConfiguracaoKafka.java:112-118).

Scale notes: ``partitionBy("particao")`` with P partitions writes P
dirs per task — fine for P=18; repartition("particao") first when task
count × P would explode small files. Reads prune on ``particao``
(directory pruning) so tail-N consumers touch only their partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import routing
from teste_carga_avro_vs_json_spark.schemas import MENSAGEM_CARGA

# Compression per format (COMPRESSION_TYPE lz4 default; JSON text lines
# support gzip-family codecs, parquet supports lz4/zstd/snappy).
_JSON_CODEC = {"none": None, "gzip": "gzip", "snappy": None, "lz4": None, "zstd": None}


def _routed(msgs: DataFrame, num_particoes: int) -> DataFrame:
    return routing.route(msgs, num_particoes)


# ------------------------------------------------------------------ JSON
def write_json(
    msgs: DataFrame,
    path: str,
    num_particoes: int = 18,
    compression: str = "none",
) -> None:
    """Messages -> line-delimited JSON text files partitioned by the
    routing arithmetic. The text written is the exact wire payload
    (to_json of the message struct)."""
    routed = _routed(msgs, num_particoes)
    wire = routed.select(
        "particao",
        F.to_json(
            F.struct("id", "timestamp", "sequencia", "dados", "versao")
        ).alias("value"),
    )
    writer = wire.repartition("particao").write.mode("overwrite").partitionBy(
        "particao"
    )
    codec = _JSON_CODEC.get(compression)
    if codec:
        writer = writer.option("compression", codec)
    writer.text(path)


def read_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON text files -> typed messages + particao (from the directory
    layout). Schema-on-read replaces the reference's untyped Gson Map
    (GeradorMensagemJson.java:81-83)."""
    raw = spark.read.text(path)
    # partition dir column comes back automatically via partition discovery
    return raw.select(
        F.col("particao").cast("int").alias("particao"),
        F.from_json(F.col("value"), MENSAGEM_CARGA).alias("msg"),
    ).select("particao", "msg.*")


# ------------------------------------------------------------------ Avro
def write_avro(
    msgs: DataFrame,
    path: str,
    num_particoes: int = 18,
    compression: str = "lz4",
) -> None:
    """Messages -> Avro-binary values (pure-Python codec) in a
    one-binary-column parquet dataset partitioned by routing."""
    routed = _routed(msgs, num_particoes)
    enc = routed.select(
        "particao",
        F.col("sequencia"),
        _avro_value(routed).alias("value"),
    )
    (
        enc.repartition("particao")
        .write.mode("overwrite")
        .partitionBy("particao")
        .option("compression", _parquet_codec(compression))
        .parquet(path)
    )


def _avro_value(msgs: DataFrame) -> F.Column:
    from teste_carga_avro_vs_json_spark.functions.avro_codec import to_avro

    return to_avro(F.struct("id", "timestamp", "sequencia", "dados", "versao"))


def _parquet_codec(compression: str) -> str:
    return {"none": "uncompressed", "gzip": "gzip", "snappy": "snappy",
            "lz4": "lz4", "zstd": "zstd"}.get(compression, "lz4")


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro-binary parquet -> decoded typed messages + particao."""
    from teste_carga_avro_vs_json_spark.functions.avro_codec import from_avro

    raw = spark.read.parquet(path)
    return raw.select(
        F.col("particao").cast("int").alias("particao"),
        from_avro(F.col("value")).alias("msg"),
    ).select("particao", "msg.*")


# --------------------------------------------------------------- Parquet
def write_parquet(
    msgs: DataFrame,
    path: str,
    num_particoes: int = 18,
    compression: str = "lz4",
) -> None:
    """Columnar-native sink: the typed message struct as parquet columns
    (no wire encoding at all — the layout the engine prefers at scale)."""
    routed = _routed(msgs, num_particoes)
    (
        routed.select("particao", "id", "timestamp", "sequencia", "dados", "versao")
        .repartition("particao")
        .write.mode("overwrite")
        .partitionBy("particao")
        .option("compression", _parquet_codec(compression))
        .parquet(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(
        F.col("particao").cast("int").alias("particao"),
        "id", "timestamp", "sequencia", "dados", "versao",
    )
