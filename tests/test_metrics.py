"""Metrics-equivalence + golden report tests (SURVEY.md §5 items 3-4):
the aggregation must reproduce MetricasDesempenho.java:45-72 formulas
exactly, and the report the %.2f formatting of :74-105."""

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import metrics

# Fixture: 4 messages, one error with 0 bytes (the
# registrarMensagem(0, false) path, MetricasDesempenho.java:31-33),
# clock span exactly 2000 ms.
ROWS = [
    (1, 100, True, 10_000),
    (2, 300, True, 10_500),
    (3, 0, False, 11_000),
    (4, 200, True, 12_000),
]


def _fixture(spark):
    return spark.createDataFrame(
        ROWS, "sequencia long, tamanho_bytes long, sucesso boolean, ts_ms long"
    )


def test_metrics_formulas(spark):
    m = metrics.metricas_agg(_fixture(spark)).collect()[0]
    assert m.total_mensagens == 4
    assert m.total_bytes == 600
    assert m.mensagens_sucesso == 3
    assert m.mensagens_erro == 1
    assert m.duracao_ms == 2000
    assert m.throughput_msgs_s == 4 / 2.0                      # total/duracao_s
    assert m.throughput_mb_s == (600 / (1024.0 * 1024.0)) / 2.0
    assert m.tempo_por_msg_ms == 2000 / 4                      # duracaoMs/total
    assert m.taxa_sucesso == 75.0                              # 100*ok/total


def test_zero_bytes_not_counted(spark):
    """tamanhoBytes <= 0 must not reduce totals (the `if > 0` gate)."""
    df = spark.createDataFrame(
        [(1, -5, True, 0), (2, 10, True, 100)],
        "sequencia long, tamanho_bytes long, sucesso boolean, ts_ms long",
    )
    m = metrics.metricas_agg(df).collect()[0]
    assert m.total_bytes == 10


def test_report_golden(spark):
    r = metrics.relatorio(metrics.metricas_agg(_fixture(spark))).collect()[0]
    # String.format("%.2f") goldens (MetricasDesempenho.java:80-86)
    assert r.total_mb == "0.00"
    assert r.duracao_segundos == "2.00"
    assert r.throughput_mensagens_por_segundo == "2.00"
    assert r.tempo_por_mensagem_ms == "500.00"
    assert r.taxa_sucesso_porcentagem == "75.00"
    assert r.timestamp_inicio == 10_000 and r.timestamp_fim == 12_000


def test_merge_equals_global(spark):
    """merge(shards) == one global agg (MetricasDesempenho.java:112-117:
    counter addition is associative)."""
    df = _fixture(spark).withColumn(
        "aplicacao", F.lit("PRODUTOR_AVRO")
    ).withColumn("shard", (F.col("sequencia") % 2).cast("int"))
    shards = df.groupBy("aplicacao", "shard").agg(
        F.count(F.lit(1)).alias("total_mensagens"),
        F.sum(
            F.when(F.col("tamanho_bytes") > 0, F.col("tamanho_bytes")).otherwise(0)
        ).alias("total_bytes"),
        F.count_if("sucesso").alias("mensagens_sucesso"),
        F.count_if(~F.col("sucesso")).alias("mensagens_erro"),
        F.min("ts_ms").alias("inicio_ms"),
        F.max("ts_ms").alias("fim_ms"),
    )
    merged = metrics.metricas_merge(shards).collect()[0]
    direct = metrics.metricas_agg(_fixture(spark)).collect()[0]
    for f in [
        "total_mensagens", "total_bytes", "mensagens_sucesso", "mensagens_erro",
        "duracao_ms", "throughput_msgs_s", "taxa_sucesso",
    ]:
        assert getattr(merged, f) == getattr(direct, f), f


def test_warmup_boundary(spark):
    """Rows with sequencia <= warmup excluded; warmup+1 included
    (ProdutorAvro.java:78, ConsumidorAvro.java:42)."""
    out = metrics.warmup_filter(_fixture(spark), warmup=2).collect()
    assert sorted(r.sequencia for r in out) == [3, 4]


def test_empty_input_zero_rates(spark):
    empty = _fixture(spark).filter(F.lit(False))
    m = metrics.metricas_agg(empty).collect()[0]
    assert m.total_mensagens == 0
    assert m.throughput_msgs_s == 0.0
    assert m.taxa_sucesso == 0.0


def test_relatorio_json_single_column(spark):
    import json as _json

    import pyspark.sql.functions as F

    from teste_carga_avro_vs_json_spark.operators import metrics as m

    src = spark.createDataFrame(
        [(1, 100, True, 1000), (2, 200, True, 2000), (3, 0, False, 3000)],
        "sequencia long, tamanho_bytes long, sucesso boolean, ts_ms long",
    )
    out = m.relatorio_json(m.metricas_agg(src), aplicacao="CONSUMIDOR_AVRO")
    [row] = out.collect()
    doc = _json.loads(row.relatorio_json)
    assert doc["aplicacao"] == "CONSUMIDOR_AVRO"
    assert doc["total_mensagens"] == 3
    assert doc["mensagens_erro"] == 1
    assert doc["taxa_sucesso_porcentagem"] == "66.67"
