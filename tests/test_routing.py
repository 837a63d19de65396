"""Routing arithmetic + tail-N pruning (ProdutorAvro.java:67-70,
ConsumidorAvro.java:163-180)."""

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import routing
from teste_carga_avro_vs_json_spark.sources import generator


def _routed(spark, n=100, p=6):
    msgs = generator.mensagens(spark, n, 1).select("sequencia")
    return routing.with_offsets(routing.route(msgs, p))


def test_route_arithmetic(spark):
    rows = _routed(spark, 20, 6).collect()
    for r in rows:
        assert r.particao == (r.sequencia - 1) % 6
        assert r.chave == f"msg-{r.sequencia}"


def test_offsets_contiguous(spark):
    rows = _routed(spark, 30, 5).collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r.particao, []).append(r.offset)
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))


def test_tail_n_keeps_last(spark):
    df = _routed(spark, 60, 6)
    kept = routing.tail_n(df, target_total=12, num_particoes=6)
    rows = kept.collect()
    # ceil(12/6)=2 per partition, 6 partitions -> 12 rows, and they are
    # the per-partition max offsets
    assert len(rows) == 12
    max_off = {r.particao: r.offset for r in df.groupBy("particao").agg(
        F.max("offset").alias("offset")).collect()}
    for r in rows:
        assert r.offset >= max_off[r.particao] - 1


def test_tail_n_small_partitions(spark):
    """begin-clamp: target bigger than the log keeps everything
    (max(begin, end-N) with begin=0)."""
    df = _routed(spark, 10, 5)
    assert routing.tail_n(df, target_total=1000, num_particoes=5).count() == 10


def test_size_estimate_formula(spark):
    msgs = generator.mensagens(spark, 5, 1)
    est = {r.sequencia: r.tamanho_estimado for r in routing.size_estimate(msgs).collect()}
    flat = generator.registros_flat(msgs).collect()
    expect = {}
    for r in flat:
        expect[r.sequencia] = expect.get(r.sequencia, 0) + 20 + len(r.texto) + len(r.uuid)
    assert est == expect
