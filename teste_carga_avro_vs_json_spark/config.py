"""Typed engine configuration (reference O18/O19).

Mirrors the env-var surface of `ConfiguracaoKafka.java:19-124` with the
same names and defaults, plus the app dispatcher values of
`AplicacaoPrincipal.java:14-19`. Required-credential fail-fast matches
`ConfiguracaoKafka.java:26-32`.

Quirk fixes carried from SURVEY.md §5: the registro-count formula always
applies the `max(1, ...)` floor (GeradorCargaEstruturada.java:50; the
un-floored copy at GeradorMensagemJson.java:38 is a reference bug).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

APPS = ("PRODUTOR_AVRO", "CONSUMIDOR_AVRO", "PRODUTOR_JSON", "CONSUMIDOR_JSON")
BENCH_MODES = ("E2E_PARSE", "TRANSPORTE", "MICRO")
COMPRESSIONS = ("none", "gzip", "snappy", "lz4", "zstd")

# Bytes-per-registro sizing heuristic (GeradorMensagemJson.java:36-38):
# a JSON-encoded Registro is ~200 bytes.
BYTES_PER_REGISTRO = 200


def n_registros(tamanho_kb: int) -> int:
    """Registros per message for a target payload size.

    `max(1, kb*1024/200)` — GeradorCargaEstruturada.java:50,63.
    """
    return max(1, (tamanho_kb * 1024) // BYTES_PER_REGISTRO)


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    if raw is None or raw.strip() == "":
        return default
    try:
        return int(raw.strip())
    except ValueError:
        return default


@dataclass
class EngineConfig:
    """Engine knobs, reference-name-compatible (ConfiguracaoKafka.java)."""

    total_mensagens: int = 10_000_000        # :38
    tamanho_mensagem_kb: int = 2048          # :53
    num_particoes: int = 18                  # :71
    consumer_threads: int | None = None      # :85-96 (None -> particoes)
    #: r10: route the consumer apps through the broker-coordinated
    #: group (N GroupConsumer threads in ONE group, the reference's
    #: actual model — ConsumidorAvro.java:57-68) instead of static
    #: partition assignment. Off by default: the static path is the
    #: Spark-idiomatic executor-parallel read.
    consumo_em_grupo: bool = False
    bench_mode: str = "E2E_PARSE"            # :100
    compression_type: str = "lz4"            # :112-118
    warmup_mensagens: int = 0                # :120-124
    topico_avro: str = "carga-sandbox-avro"
    topico_json: str = "carga-sandbox-json"
    bootstrap_servers: str | None = None     # fail-fast only for Kafka mode
    # Confluent Cloud credential surface (ConfiguracaoKafka.java:19-25;
    # the reference fail-fasts on ALL of these at class load — we
    # fail-fast only when an authenticated path is requested, so the
    # loopback/plaintext modes keep working without dummy env vars)
    cluster_api_key: str | None = None       # KAFKA_CLUSTER_API_KEY
    cluster_api_secret: str | None = None    # KAFKA_CLUSTER_API_SECRET
    schema_registry_url: str | None = None   # SCHEMA_REGISTRY_URL
    schema_registry_api_key: str | None = None
    schema_registry_api_secret: str | None = None
    security_protocol: str = "PLAINTEXT"     # reference runs SASL_SSL (:134)
    extra: dict = field(default_factory=dict)

    @property
    def threads(self) -> int:
        return self.consumer_threads or self.num_particoes

    @property
    def registros_por_mensagem(self) -> int:
        return n_registros(self.tamanho_mensagem_kb)

    def kafka_security(self) -> dict:
        """``WireKafkaClient`` security kwargs for this config.

        PLAIN SASL credentials are the cluster API key/secret, exactly
        the mapping the reference's jaas template performs
        (ConfiguracaoKafka.java:136-138: PlainLoginModule with
        username=CLUSTER_API_KEY password=CLUSTER_API_SECRET). Raises
        when an authenticated protocol is configured without both."""
        if self.security_protocol in ("SASL_PLAINTEXT", "SASL_SSL"):
            if not (self.cluster_api_key and self.cluster_api_secret):
                raise ValueError(
                    "KAFKA_CLUSTER_API_KEY/KAFKA_CLUSTER_API_SECRET "
                    f"obrigatorios para {self.security_protocol}"
                )
            return {
                "security_protocol": self.security_protocol,
                "sasl_mechanism": "PLAIN",
                "sasl_username": self.cluster_api_key,
                "sasl_password": self.cluster_api_secret,
            }
        if self.security_protocol == "SSL":
            return {"security_protocol": "SSL"}
        return {}

    def schema_registry_auth(self) -> tuple[str, str] | None:
        """Basic-auth pair for the Schema Registry client
        (USER_INFO source, ConfiguracaoKafka.java:153-156)."""
        if self.schema_registry_api_key and self.schema_registry_api_secret:
            return (self.schema_registry_api_key,
                    self.schema_registry_api_secret)
        return None

    def validate(self, require_kafka: bool = False) -> "EngineConfig":
        if self.bench_mode not in BENCH_MODES:
            raise ValueError(f"BENCH_MODE invalido: {self.bench_mode!r}; use {BENCH_MODES}")
        if self.compression_type not in COMPRESSIONS:
            raise ValueError(
                f"COMPRESSION_TYPE invalido: {self.compression_type!r}; use {COMPRESSIONS}"
            )
        _protos = ("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")
        if self.security_protocol not in _protos:
            raise ValueError(
                f"SECURITY_PROTOCOL invalido: {self.security_protocol!r}; "
                f"use {_protos}"
            )
        if require_kafka and not self.bootstrap_servers:
            # ConfiguracaoKafka.java:26-32 fail-fast behavior.
            raise ValueError("KAFKA_BOOTSTRAP_SERVERS obrigatorio para modo Kafka")
        return self

    @classmethod
    def from_env(cls) -> "EngineConfig":
        return cls(
            total_mensagens=_env_int("TOTAL_MENSAGENS", 10_000_000),
            tamanho_mensagem_kb=_env_int("TAMANHO_MENSAGEM_KB", 2048),
            num_particoes=_env_int("NUM_PARTICOES", 18),
            consumer_threads=(
                _env_int("CONSUMER_THREADS", 0) or None
            ),
            consumo_em_grupo=(
                os.environ.get("CONSUMO_EM_GRUPO", "").strip().lower()
                in ("1", "true", "sim")
            ),
            # obterBenchMode() does trim().toUpperCase(); obterCompressionType()
            # does trim().toLowerCase() (ConfiguracaoKafka.java:98-118).
            bench_mode=(
                os.environ.get("BENCH_MODE", "E2E_PARSE").strip().upper() or "E2E_PARSE"
            ),
            compression_type=(
                os.environ.get("COMPRESSION_TYPE", "lz4").strip().lower() or "lz4"
            ),
            warmup_mensagens=_env_int("WARMUP_MENSAGENS", 0),
            bootstrap_servers=os.environ.get("KAFKA_BOOTSTRAP_SERVERS"),
            cluster_api_key=os.environ.get("KAFKA_CLUSTER_API_KEY"),
            cluster_api_secret=os.environ.get("KAFKA_CLUSTER_API_SECRET"),
            schema_registry_url=os.environ.get("SCHEMA_REGISTRY_URL"),
            schema_registry_api_key=os.environ.get(
                "SCHEMA_REGISTRY_API_KEY"
            ),
            schema_registry_api_secret=os.environ.get(
                "SCHEMA_REGISTRY_API_SECRET"
            ),
            security_protocol=(
                os.environ.get("SECURITY_PROTOCOL", "PLAINTEXT")
                .strip()
                .upper()
                or "PLAINTEXT"
            ),
        ).validate()
