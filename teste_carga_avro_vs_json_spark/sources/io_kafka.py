"""Kafka batch/streaming IO (reference O7/O8/O9/O17) — connector plumbing.

No broker ships in this container, so nothing here is exercised against
a live cluster; the DataFrame plumbing and the offset arithmetic are the
engine's real code paths and are unit-tested (the arithmetic is pure).
On a real cluster the Spark Kafka connector
(spark-sql-kafka-0-10) provides ``format("kafka")`` batch + streaming.

Mappings:

- **Sink with explicit routing** (ProdutorAvro.java:67-90): the Kafka
  sink honors a ``partition`` column; ``to_wire_frame`` produces
  (key, value, partition) with the reference's ``msg-{i}`` key and
  ``(i-1) % P`` routing. Producer tuning passes through ``kafka.*``
  options (operators/routing.kafka_sink_options).
- **Parallel source** (O8): one Spark input partition per
  TopicPartition — the reference's thread-per-partition fan-out is the
  connector's default; ``minPartitions`` oversubscribes.
- **Offset pruning / tail-N** (O9, ConsumidorAvro.java:163-180):
  ``starting_offsets_tail_n`` computes per-partition
  ``max(begin, end - ceil(target/P))`` as the ``startingOffsets`` JSON.
- **Flow control** (O17): ``maxOffsetsPerTrigger`` when streaming.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import routing


# ----------------------------------------------------- offset arithmetic
def tail_n_offsets(
    begin_offsets: dict[int, int], end_offsets: dict[int, int], target_total: int
) -> dict[int, int]:
    """posicionarNoFimMenosN (ConsumidorAvro.java:163-180): per
    partition, start at ``max(begin, end - ceil(target/P))``."""
    num_particoes = len(end_offsets)
    per_part = math.ceil(target_total / num_particoes)
    return {
        p: max(begin_offsets.get(p, 0), end - per_part)
        for p, end in end_offsets.items()
    }


def starting_offsets_tail_n(
    topic: str,
    begin_offsets: dict[int, int],
    end_offsets: dict[int, int],
    target_total: int,
) -> str:
    """The ``startingOffsets`` JSON for a tail-N batch/stream read."""
    starts = tail_n_offsets(begin_offsets, end_offsets, target_total)
    return json.dumps({topic: {str(p): o for p, o in sorted(starts.items())}})


def fetch_offsets(bootstrap_servers: str, topic: str) -> tuple[dict, dict]:
    """Begin/end offsets for tail-N pruning (O9) — kafka-python when
    installed, else the stdlib wire-protocol client
    (:mod:`sources.kafka_wire`), so offset discovery works against any
    broker on a bare environment (SURVEY.md §4: plain driver-side
    helper, not a Catalyst concern)."""
    try:
        from kafka import KafkaConsumer, TopicPartition  # type: ignore
    except ImportError:
        return fetch_offsets_wire(bootstrap_servers, topic)
    consumer = KafkaConsumer(bootstrap_servers=bootstrap_servers)
    parts = [TopicPartition(topic, p) for p in consumer.partitions_for_topic(topic)]
    begins = consumer.beginning_offsets(parts)
    ends = consumer.end_offsets(parts)
    return (
        {tp.partition: o for tp, o in begins.items()},
        {tp.partition: o for tp, o in ends.items()},
    )


def read_kafka_wire_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    target_total: int | None = None,
    offsets: tuple[dict[int, int], dict[int, int]] | None = None,
    max_bytes: int = 1 << 20,
    security: dict | None = None,
    group: str | None = None,
) -> DataFrame:
    """Distributed batch consume over the stdlib wire-protocol client —
    a working Kafka SOURCE with zero non-stdlib dependencies, for
    environments without the spark-sql-kafka jar (this container; any
    bare PySpark install).

    Execution model mirrors the real connector (O8, parallel source):
    the driver discovers per-partition [start, end) bounds (tail-N
    arithmetic when ``target_total`` is given — O9), builds one plan
    row per TopicPartition, and ``mapInPandas`` fetches each partition
    executor-side over its own socket — one task per TopicPartition,
    records streamed out in Arrow batches, no driver traffic. Output
    columns match ``format("kafka")``: (topic, partition, offset, key,
    value) with binary key/value.

    ``security`` kwargs are forwarded to ``WireKafkaClient`` on every
    socket (driver offset discovery AND executor fetches) — SASL PLAIN
    and TLS are supported (the reference's SASL_SSL setup,
    ConfiguracaoKafka.java:134-138); note an ``ssl_context`` in
    ``security`` must be constructible executor-side (pass cert PATHS
    via a loader, not a live SSLContext, on a real cluster).

    ``group`` (r9) gives bounded reads RESUME semantics over
    broker-stored offsets: starts are overridden by the group's
    committed offsets where present (uncommitted partitions keep the
    computed start — auto.offset.reset=earliest, the reference's
    setting), and the caller commits the frontier back explicitly via
    :func:`commit_offsets_wire` AFTER materializing — a batch read
    must never auto-commit offsets for data that may not have been
    consumed.

    On a cluster the JVM connector remains the production choice
    (SCALE.md) — it adds rack-aware replica fetching and group
    REBALANCE (JoinGroup/SyncGroup) this client deliberately skips:
    Spark sources assign partitions statically, so only the offset
    store is needed."""
    from itertools import islice

    import pandas as pd

    from teste_carga_avro_vs_json_spark.sources.kafka_wire import WireKafkaClient

    security = security or {}
    begins, ends = offsets if offsets is not None else fetch_offsets_wire(
        bootstrap_servers, topic, security=security
    )
    starts = (
        tail_n_offsets(begins, ends, target_total)
        if target_total is not None
        else {p: begins.get(p, 0) for p in ends}
    )
    if group is not None:
        # resume semantics: a committed offset (the NEXT offset to
        # read, Kafka convention) overrides the computed start for its
        # partition; partitions with no commit keep theirs
        # (auto.offset.reset=earliest — the reference's setting,
        # ConfiguracaoKafka.java:171). Committing back after the read
        # is the CALLER's explicit step (commit_offsets_wire) — batch
        # reads must not auto-commit offsets for data the caller may
        # never have materialized.
        committed = fetch_committed_offsets_wire(
            bootstrap_servers, group, topic, sorted(ends), security=security
        )
        starts = {p: committed.get(p, s0) for p, s0 in starts.items()}
    plan = [(p, int(starts.get(p, 0)), int(end)) for p, end in sorted(ends.items())]

    def _fetch(batches):
        client = None
        try:
            for pdf in batches:
                for p, start, end in zip(pdf["partition"], pdf["start"], pdf["end"]):
                    p, offset, end = int(p), int(start), int(end)
                    if offset >= end:
                        continue
                    if client is None:
                        # multi-host bootstrap with failover (r7)
                        client = WireKafkaClient.connect(
                            bootstrap_servers, **security
                        )
                    # fetch_until retries transient empty fetches and
                    # raises instead of silently truncating the bounded
                    # read (r7, ADVICE fix)
                    it = client.fetch_until(topic, p, offset, end, max_bytes)
                    while True:
                        recs = list(islice(it, 10_000))
                        if not recs:
                            break
                        yield pd.DataFrame(
                            {
                                "topic": topic,
                                "partition": p,
                                "offset": [o for o, _, _ in recs],
                                "key": [k for _, k, _ in recs],
                                "value": [v for _, _, v in recs],
                            }
                        )
        finally:
            if client is not None:
                client.close()

    plan_df = spark.createDataFrame(
        plan, "partition int, start long, end long"
    ).repartition(max(len(plan), 1), "partition")
    return plan_df.mapInPandas(
        _fetch,
        "topic string, partition int, offset long, key binary, value binary",
    )


def fetch_committed_offsets_wire(
    bootstrap_servers: str,
    group: str,
    topic: str,
    partitions: list[int],
    security: dict | None = None,
) -> dict[int, int]:
    """Broker-stored committed offsets for ``group`` (OffsetFetch v1)
    — partitions with no commit are absent."""
    from teste_carga_avro_vs_json_spark.sources import kafka_wire

    client = kafka_wire.WireKafkaClient.connect(
        bootstrap_servers, **(security or {})
    )
    try:
        return client.offset_fetch(group, topic, partitions)
    finally:
        client.close()


def commit_offsets_wire(
    bootstrap_servers: str,
    group: str,
    topic: str,
    offsets: dict[int, int],
    security: dict | None = None,
) -> None:
    """Commit {partition: next_offset} for ``group`` (OffsetCommit v2)
    — the explicit post-materialization step that makes bounded batch
    reads resumable (`read_kafka_wire_batch(group=...)` starts from
    these)."""
    from teste_carga_avro_vs_json_spark.sources import kafka_wire

    client = kafka_wire.WireKafkaClient.connect(
        bootstrap_servers, **(security or {})
    )
    try:
        client.offset_commit(
            group, {(topic, p): off for p, off in offsets.items()}
        )
    finally:
        client.close()


def fetch_offsets_wire(
    bootstrap_servers: str, topic: str, security: dict | None = None
) -> tuple[dict, dict]:
    """Begin/end offsets via the stdlib Kafka wire-protocol client
    (Metadata v1 + ListOffsets v1) — no third-party dependency; the
    loopback broker test drives this against a real socket."""
    from teste_carga_avro_vs_json_spark.sources import kafka_wire

    client = kafka_wire.WireKafkaClient.connect(
        bootstrap_servers, **(security or {})
    )
    try:
        parts = client.partitions_for(topic)
        begins = {
            p: client.list_offset(topic, p, kafka_wire.EARLIEST) for p in parts
        }
        ends = {
            p: client.list_offset(topic, p, kafka_wire.LATEST) for p in parts
        }
        return begins, ends
    finally:
        client.close()


# ----------------------------------------------------------- wire frames
def to_wire_frame(msgs: DataFrame, value: F.Column, num_particoes: int = 18) -> DataFrame:
    """(key, value, partition) in the Kafka sink contract, with the
    reference's key/routing (ProdutorAvro.java:67-70)."""
    routed = routing.route(msgs, num_particoes)
    return routed.select(
        F.col("chave").alias("key"),
        value.alias("value"),
        F.col("particao").alias("partition"),
    )


# ----------------------------------------------------- option contracts
# Pure builders for the exact option dicts handed to format("kafka") —
# split out so the connector contract is testable without a broker (the
# container ships neither a broker nor spark-sql-kafka): the tests pin
# these dicts and the wire-frame schema; on a cluster the load()/save()
# wrappers below are one jar away from live.


def kafka_write_options(bootstrap_servers: str, topic: str, cfg=None) -> dict[str, str]:
    """Options for a batch produce (sink contract, ProdutorAvro tuning
    via routing.kafka_sink_options)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
    }
    if cfg is not None:
        opts.update(routing.kafka_sink_options(cfg))
    return opts


def kafka_tail_n_read_options(
    bootstrap_servers: str,
    topic: str,
    begin_offsets: dict[int, int],
    end_offsets: dict[int, int],
    target_total: int,
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Options for a bounded tail-N batch consume (O9): startingOffsets
    carries the per-partition end-N arithmetic."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets_tail_n(
            topic, begin_offsets, end_offsets, target_total
        ),
        "endingOffsets": "latest",
    }
    if min_partitions:
        opts["minPartitions"] = str(min_partitions)
    return opts


def kafka_stream_read_options(
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Options for a streaming consume with O17 flow control
    (maxOffsetsPerTrigger replaces the sleep-every-1000,
    ProdutorAvro.java:93-95)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def write_kafka(
    wire: DataFrame, bootstrap_servers: str, topic: str, cfg=None
) -> None:
    """Batch produce. ``wire`` must have key/value(/partition) columns."""
    wire.write.format("kafka").options(
        **kafka_write_options(bootstrap_servers, topic, cfg)
    ).save()


def read_kafka_tail_n(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    target_total: int,
    min_partitions: int | None = None,
    offsets: tuple[dict[int, int], dict[int, int]] | None = None,
) -> DataFrame:
    """Batch consume of the last ~target_total records (O9): compute
    end-N offsets driver-side, then a bounded Kafka scan. One task per
    TopicPartition (O8); raw bytes come back — decode with
    operators/serde or functions/avro_codec downstream. ``offsets``
    (begins, ends) skips the live AdminClient fetch when the caller
    already knows them.

    Connector autodetect (r6): uses the JVM connector
    (spark-sql-kafka-0-10) when its jar is on the classpath — the
    production path — else falls back to the wire-protocol source
    (:func:`read_kafka_wire_batch`, same partition-parallel shape, no
    dependencies), so this API works against any broker on a bare
    PySpark install. Column sets match except the JVM connector's extra
    timestamp/timestampType columns."""
    if not _jvm_kafka_connector_available(spark):
        return read_kafka_wire_batch(
            spark, bootstrap_servers, topic,
            target_total=target_total, offsets=offsets,
        )
    begins, ends = offsets if offsets is not None else fetch_offsets(
        bootstrap_servers, topic
    )
    return (
        spark.read.format("kafka")
        .options(
            **kafka_tail_n_read_options(
                bootstrap_servers, topic, begins, ends, target_total,
                min_partitions,
            )
        )
        .load()
    )


def _jvm_kafka_connector_available(spark: SparkSession) -> bool:
    """True when spark-sql-kafka-0-10 is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001 - py4j raises wrapped JVM errors
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming consume with O17 flow control."""
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_stream_read_options(
                bootstrap_servers, topic, max_offsets_per_trigger
            )
        )
        .load()
    )
