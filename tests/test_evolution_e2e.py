"""Full registry-backed schema-evolution pipeline over a real socket:
two producer generations write Confluent-framed Avro (schemas v1/v2,
distinct registry ids) through ``format("kafka_wire")`` to the loopback
broker; one consumer reads the topic back, resolves each frame's
writer schema FROM ITS EMBEDDED ID, and decodes everything into a
single evolved reader shape (promotion + default fill). This is the
KafkaAvroDeserializer consumer loop the reference delegates to
Confluent serdes (ConfiguracaoKafka.java:150-158), built from the
engine's own parts: kafka_wire + schema_registry + avro_generic."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.functions import avro_codec, avro_generic as ag
from teste_carga_avro_vs_json_spark.functions.schema_registry import (
    InMemorySchemaRegistry,
    serialize_confluent,
)
from teste_carga_avro_vs_json_spark.sources import kafka_wire_source
from teste_carga_avro_vs_json_spark.sources.kafka_wire import StubBroker

V1 = json.dumps(
    {
        "type": "record",
        "name": "Doc",
        "namespace": "br.com.sandbox",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "text", "type": "string"},
        ],
    }
)
V2 = json.dumps(
    {
        "type": "record",
        "name": "Doc",
        "namespace": "br.com.sandbox",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "text", "type": "string"},
            {"name": "lang", "type": "string", "default": "und"},
        ],
    }
)
# the consumer's evolved view: promoted id, lang backfilled for v1 data,
# plus a field neither producer wrote (default-filled for both)
READER = json.dumps(
    {
        "type": "record",
        "name": "Doc",
        "namespace": "br.com.sandbox",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "text", "type": "string"},
            {"name": "lang", "type": "string", "default": "und"},
            {"name": "score", "type": "double", "default": 0.5},
        ],
    }
)


def test_two_generation_produce_then_evolved_consume(spark):
    kafka_wire_source.register(spark)
    registry = InMemorySchemaRegistry()

    def produce_epoch(bootstrap, schema, rows_df, struct_col):
        framed, sid = serialize_confluent(
            ag.to_avro_any(struct_col, schema), registry, "carga-value", schema
        )
        wire = rows_df.select(
            F.col("id").cast("string").alias("key"),
            framed.alias("value"),
            (F.col("id") % 2).cast("int").alias("partition"),
        )
        (
            wire.write.format("kafka_wire")
            .option("bootstrap", bootstrap)
            .option("topic", "carga")
            .mode("append")
            .save()
        )
        return sid

    with StubBroker(num_partitions=2) as broker:
        bootstrap = f"{broker.addr[0]}:{broker.addr[1]}"

        gen1 = spark.createDataFrame(
            [(i, f"old-{i}") for i in range(10)], "id int, text string"
        )
        sid1 = produce_epoch(
            bootstrap, V1, gen1, F.struct("id", "text")
        )
        gen2 = spark.createDataFrame(
            [(i, f"new-{i}", "pt") for i in range(10, 25)],
            "id int, text string, lang string",
        )
        sid2 = produce_epoch(
            bootstrap, V2, gen2, F.struct("id", "text", "lang")
        )
        assert sid1 != sid2  # distinct schema identities

        raw = (
            spark.read.format("kafka_wire")
            .option("bootstrap", bootstrap)
            .option("topic", "carga")
            .load()
            .select(
                avro_codec.confluent_schema_id(F.col("value")).alias("sid"),
                avro_codec.confluent_unwrap(F.col("value")).alias("payload"),
            )
        )
        # KafkaAvroDeserializer loop: the set of DISTINCT ids on the
        # topic is bounded by schema versions (driver-safe collect);
        # each id's writer schema comes from the registry and resolves
        # against the ONE evolved reader shape.
        ids = sorted(r.sid for r in raw.select("sid").distinct().collect())
        assert ids == sorted([sid1, sid2])
        parts = [
            raw.filter(F.col("sid") == sid).select(
                ag.from_avro_any(
                    F.col("payload"), registry.get_by_id(sid), READER
                ).alias("msg")
            )
            for sid in ids
        ]
        decoded = parts[0].unionByName(parts[1]).select("msg.*")
        assert [f.dataType.simpleString() for f in decoded.schema.fields] == [
            "bigint", "string", "string", "double",
        ]
        rows = {r.id: r for r in decoded.collect()}

    assert len(rows) == 25
    for i in range(10):  # v1 generation: lang backfilled by the default
        assert rows[i].text == f"old-{i}"
        assert rows[i].lang == "und" and rows[i].score == 0.5
    for i in range(10, 25):  # v2 generation: lang as written
        assert rows[i].text == f"new-{i}"
        assert rows[i].lang == "pt" and rows[i].score == 0.5
