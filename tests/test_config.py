"""Config accessors (O19): reference names, defaults, normalization,
fail-fast — ConfiguracaoKafka.java:26-124."""

import pytest

from teste_carga_avro_vs_json_spark.config import EngineConfig, n_registros


def test_defaults_match_reference():
    cfg = EngineConfig()
    assert cfg.total_mensagens == 10_000_000      # ConfiguracaoKafka.java:38
    assert cfg.tamanho_mensagem_kb == 2048        # :53
    assert cfg.num_particoes == 18                # :71
    assert cfg.threads == 18                      # :85-96 (= particoes)
    assert cfg.bench_mode == "E2E_PARSE"          # :100
    assert cfg.compression_type == "lz4"          # :112-118
    assert cfg.warmup_mensagens == 0              # :120-124


def test_env_normalizes_case(monkeypatch):
    # obterBenchMode(): trim().toUpperCase(); obterCompressionType():
    # trim().toLowerCase() (ConfiguracaoKafka.java:98-118)
    monkeypatch.setenv("BENCH_MODE", "  transporte ")
    monkeypatch.setenv("COMPRESSION_TYPE", " LZ4 ")
    cfg = EngineConfig.from_env()
    assert cfg.bench_mode == "TRANSPORTE"
    assert cfg.compression_type == "lz4"


def test_env_reads_total_mensagens(monkeypatch):
    # env var is TOTAL_MENSAGENS, not the README's stale NUM_MENSAGENS
    # (SURVEY.md §1.4 discrepancy note)
    monkeypatch.setenv("TOTAL_MENSAGENS", "123")
    assert EngineConfig.from_env().total_mensagens == 123


def test_invalid_bench_mode_fails_fast():
    with pytest.raises(ValueError, match="BENCH_MODE"):
        EngineConfig(bench_mode="NOPE").validate()


def test_invalid_compression_fails_fast():
    with pytest.raises(ValueError, match="COMPRESSION_TYPE"):
        EngineConfig(compression_type="brotli").validate()


def test_kafka_mode_requires_bootstrap():
    with pytest.raises(ValueError, match="KAFKA_BOOTSTRAP_SERVERS"):
        EngineConfig().validate(require_kafka=True)


def test_n_registros_floor():
    # max(1, kb*1024//200) — GeradorCargaEstruturada.java:50; the
    # un-floored copy at GeradorMensagemJson.java:38 is a reference bug
    # the engine fixes (SURVEY.md §5 quirk table)
    assert n_registros(0) == 1
    assert n_registros(1) == 5
    assert n_registros(2048) == 10485
