"""Confluent Schema Registry contract — broker-less client.

The reference auto-registers its Avro schema on first produce through
KafkaAvroSerializer and resolves writer schemas by id on consume
(/root/reference/src/main/java/br/com/sandbox/kafka/config/
ConfiguracaoKafka.java:152-156: ``schema.registry.url`` +
``auto.register.schemas``). No registry service ships in this
container, so the engine provides the same contract two ways:

- :class:`InMemorySchemaRegistry` — the full semantics (subjects,
  monotone ids, idempotent re-registration of the canonically-equal
  schema, id -> schema lookup), fully tested;
- :class:`HttpSchemaRegistry` — the standard REST endpoints
  (``POST /subjects/{s}/versions``, ``GET /schemas/ids/{id}``) over a
  pluggable opener so the request contract is testable without a
  server; pointing it at a live registry is a URL away.

Wire glue: :func:`serialize_confluent` registers (or resolves) the
schema and emits the Confluent 5-byte-framed column via
``avro_codec.confluent_wrap`` — the produce-side path the reference
delegates to KafkaAvroSerializer.

Scale note: registration is a driver-side, O(1)-per-schema call made
once per job, never per row/partition — executors only ever see the
resolved integer id baked into the plan as a literal.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable

from pyspark.sql import Column


def _strip_nonidentity(node):
    """Recursively drop Avro attributes that never affect parsing —
    ``doc`` and ``aliases`` (the [STRIP] step of Avro's Parsing
    Canonical Form, spec §"Transforming into Parsing Canonical Form")
    — so documentation-only edits don't mint new schema ids.

    ``default`` values are JSON DATA, not schema: a record default may
    legitimately contain keys named ``doc``/``aliases``, so recursion
    stops at them (they pass through verbatim)."""
    if isinstance(node, dict):
        return {
            k: (v if k == "default" else _strip_nonidentity(v))
            for k, v in node.items()
            if k not in ("doc", "aliases")
        }
    if isinstance(node, list):
        return [_strip_nonidentity(v) for v in node]
    return node


def canonical_schema(schema: str) -> str:
    """Canonical form used for schema identity: parsed JSON with
    ``doc``/``aliases`` stripped (as Avro Parsing Canonical Form does),
    re-dumped with sorted keys and no whitespace, so formatting,
    key-order, and documentation variants of the same schema resolve to
    the same id.

    Remaining divergences from a real Confluent registry's
    canonicalization, which a live deployment would dedupe further:

    - ``default`` and ``order`` are KEPT here (PCF strips them) —
      defaults matter to schema-resolution reads and this canon is also
      what :meth:`InMemorySchemaRegistry.get_by_id` hands back to
      decoders, so dropping them would change decode semantics;
    - names are not fullname-normalized (PCF inlines namespaces into
      every name) and numeric literals are not normalized.

    Schemas differing ONLY in those attributes get distinct ids here but
    one id on a live registry."""
    return json.dumps(
        _strip_nonidentity(json.loads(schema)),
        sort_keys=True,
        separators=(",", ":"),
    )


class InMemorySchemaRegistry:
    """Subject -> versioned schema store with Confluent id semantics:
    ids are GLOBAL content identity — the same canonical schema gets
    the same id in every subject (Confluent guarantees this), new
    schemas get monotone ids, and re-registration is idempotent."""

    def __init__(self) -> None:
        self._subject_versions: dict[str, list[int]] = {}
        self._id_by_canon: dict[str, int] = {}
        self._by_id: dict[int, str] = {}
        self._next_id = 1

    def register(self, subject: str, schema: str) -> int:
        canon = canonical_schema(schema)
        sid = self._id_by_canon.get(canon)
        if sid is None:
            sid = self._next_id
            self._next_id += 1
            self._id_by_canon[canon] = sid
            self._by_id[sid] = canon
        versions = self._subject_versions.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
        return sid

    def get_by_id(self, schema_id: int) -> str:
        return self._by_id[schema_id]

    def latest(self, subject: str) -> tuple[int, str]:
        """(id, schema) of the most recently registered version under
        ``subject`` (registration order, matching Confluent versions)."""
        sid = self._subject_versions[subject][-1]
        return sid, self._by_id[sid]


Opener = Callable[[str, str, bytes | None], tuple[int, bytes]]


def _default_opener(method: str, url: str, body: bytes | None) -> tuple[int, bytes]:
    req = urllib.request.Request(
        url,
        data=body,
        method=method,
        headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
    )
    try:  # pragma: no cover - needs server
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # pragma: no cover - needs server
        # 4xx/5xx arrive as HTTPError, not a response object — normalize
        # to (status, body) so the class's RuntimeError contract holds
        # for the real opener exactly as it does for injected ones
        return e.code, e.read()


class HttpSchemaRegistry:
    """REST client for the Confluent Schema Registry API. ``opener`` is
    injectable so the request contract (method, URL, payload shape) is
    pinned by tests without a live service."""

    def __init__(self, base_url: str, opener: Opener | None = None) -> None:
        self._base = base_url.rstrip("/")
        self._open = opener or _default_opener

    def register(self, subject: str, schema: str) -> int:
        payload = json.dumps({"schema": canonical_schema(schema)}).encode()
        quoted = urllib.parse.quote(subject, safe="")
        status, body = self._open(
            "POST", f"{self._base}/subjects/{quoted}/versions", payload
        )
        if status != 200:
            raise RuntimeError(f"schema registration failed: HTTP {status}")
        return int(json.loads(body)["id"])

    def get_by_id(self, schema_id: int) -> str:
        status, body = self._open(
            "GET", f"{self._base}/schemas/ids/{schema_id}", None
        )
        if status != 200:
            raise RuntimeError(f"schema lookup failed: HTTP {status}")
        return json.loads(body)["schema"]


def serialize_confluent(
    avro_bytes: Column, registry, subject: str, schema: str
) -> tuple[Column, int]:
    """Produce-side glue (KafkaAvroSerializer equivalent): register (or
    resolve) ``schema`` under ``subject``, frame the payload column with
    the resulting id. Returns (framed column, schema id)."""
    from teste_carga_avro_vs_json_spark.functions import avro_codec

    sid = registry.register(subject, schema)
    return avro_codec.confluent_wrap(avro_bytes, schema_id=sid), sid
