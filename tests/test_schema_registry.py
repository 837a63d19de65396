"""Confluent Schema Registry contract (broker-less): id semantics,
canonicalization, REST request shapes, and the produce-side framing
glue (KafkaAvroSerializer equivalent, ConfiguracaoKafka.java:152-156)."""

import json

import pyspark.sql.functions as F
import pytest

from teste_carga_avro_vs_json_spark.functions import avro_codec, schema_registry

SCHEMA = '{"type": "record", "name": "M", "fields": [{"name": "id", "type": "string"}]}'
SCHEMA_REORDERED = '{"fields": [{"type": "string", "name": "id"}], "name": "M", "type": "record"}'
OTHER = '{"type": "record", "name": "N", "fields": []}'


def test_in_memory_ids_are_monotone_and_idempotent():
    reg = schema_registry.InMemorySchemaRegistry()
    sid = reg.register("topic-value", SCHEMA)
    assert sid == 1
    # same schema (even reformatted / key-reordered) -> same id
    assert reg.register("topic-value", SCHEMA_REORDERED) == sid
    # different schema -> next id; lookup round-trips the canonical form
    sid2 = reg.register("topic-value", OTHER)
    assert sid2 == 2
    assert reg.get_by_id(sid) == schema_registry.canonical_schema(SCHEMA)
    assert reg.latest("topic-value") == (
        sid2, schema_registry.canonical_schema(OTHER)
    )
    # ids are GLOBAL content identity (Confluent semantics): the same
    # schema registered under another subject reuses the same id
    assert reg.register("other-topic-value", SCHEMA) == sid
    assert reg.latest("other-topic-value") == (
        sid, schema_registry.canonical_schema(SCHEMA)
    )


def test_http_register_quotes_subject():
    calls = []

    def opener(method, url, body):
        calls.append(url)
        return 200, b'{"id": 1}'

    reg = schema_registry.HttpSchemaRegistry("http://sr:8081", opener=opener)
    reg.register("a/b c", SCHEMA)
    assert calls == ["http://sr:8081/subjects/a%2Fb%20c/versions"]


def test_http_client_pins_rest_contract():
    calls = []

    def opener(method, url, body):
        calls.append((method, url, body))
        if method == "POST":
            return 200, b'{"id": 42}'
        return 200, json.dumps(
            {"schema": schema_registry.canonical_schema(SCHEMA)}
        ).encode()

    reg = schema_registry.HttpSchemaRegistry("http://sr:8081/", opener=opener)
    assert reg.register("t-value", SCHEMA) == 42
    assert reg.get_by_id(42) == schema_registry.canonical_schema(SCHEMA)
    post, get = calls
    assert post[0:2] == ("POST", "http://sr:8081/subjects/t-value/versions")
    assert json.loads(post[2]) == {
        "schema": schema_registry.canonical_schema(SCHEMA)
    }
    assert get[0:2] == ("GET", "http://sr:8081/schemas/ids/42")


def test_http_client_raises_on_error_status():
    reg = schema_registry.HttpSchemaRegistry(
        "http://sr:8081", opener=lambda m, u, b: (500, b"boom")
    )
    with pytest.raises(RuntimeError, match="HTTP 500"):
        reg.register("s", SCHEMA)


def test_serialize_confluent_frames_with_registered_id(spark):
    """End-to-end produce-side glue: auto-register, frame, and the
    header parse must recover the assigned id + payload."""
    reg = schema_registry.InMemorySchemaRegistry()
    reg.register("warmup", OTHER)  # bump the counter so id != 1
    df = spark.range(3).select(
        F.encode(F.concat(F.lit("p-"), F.col("id")), "UTF-8").alias("payload")
    )
    wire, sid = schema_registry.serialize_confluent(
        F.col("payload"), reg, "topic-value", SCHEMA
    )
    assert sid == 2
    out = df.select(
        avro_codec.confluent_schema_id(wire).alias("sid"),
        (avro_codec.confluent_unwrap(wire) == F.col("payload")).alias("rt"),
    ).collect()
    assert all(r.sid == sid and r.rt for r in out)
