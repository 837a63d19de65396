"""``format("kafka_wire")`` — a Spark 4 Python DataSource over the
stdlib wire-protocol client (:mod:`sources.kafka_wire`).

Gives the engine a REGISTERED Kafka source/sink usable through the
standard reader/writer API with zero non-stdlib dependencies:

- **batch read** — the driver discovers per-partition ``[start, end)``
  bounds (tail-N pruning via ``target_total``, O9) and emits ONE
  ``InputPartition`` per TopicPartition; each Spark task fetches its
  partition over its own socket (O8, the same execution model as the
  JVM connector).
- **batch write** — each task groups its rows by the ``partition``
  column (the reference's explicit routing, O7 —
  ProdutorAvro.java:67-90) and produces record batches per partition.
- **streaming read** — a ``SimpleDataSourceStreamReader`` that walks
  per-partition offsets; ``maxRecordsPerBatch`` bounds each micro-batch
  (flow control, O17 — the ``maxOffsetsPerTrigger`` analogue).

Options: ``bootstrap`` (host:port, required), ``topic`` (required),
``target_total`` (tail-N bound, batch read), ``max_bytes`` (per fetch),
``maxRecordsPerBatch`` (streaming), ``batch_size`` (write).

Scale notes: on a real cluster the JVM connector
(spark-sql-kafka-0-10) remains the production path — SSL/SASL, replica
fetching, offset commit. This source is the no-dependency fallback and
the loopback test surface; its *shape* (partition-parallel fetch, no
driver traffic on the data path) is the connector's. Python data
sources pay one Python worker hop per task — the same cost class as
this environment's Avro codec path.

Reference parity: ConsumidorAvro.java:57-180 (bounded tail-N consume),
ProdutorAvro.java:67-95 (keyed, partition-routed produce).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

try:  # pickle-by-value: executors don't need the repo on PYTHONPATH
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

_SCHEMA = "topic string, partition int, offset long, key binary, value binary"


def _client(options):
    from teste_carga_avro_vs_json_spark.sources.kafka_wire import WireKafkaClient

    bootstrap = options["bootstrap"]
    host, _, port = bootstrap.partition(":")
    return WireKafkaClient(host, int(port))


class _TP(InputPartition):
    def __init__(self, partition: int, start: int, end: int):
        self.partition = partition
        self.start = start
        self.end = end


class KafkaWireBatchReader(DataSourceReader):
    def __init__(self, options):
        self.options = options
        self.topic = options["topic"]
        self.max_bytes = int(options.get("max_bytes", 1 << 20))

    def partitions(self):
        from teste_carga_avro_vs_json_spark.sources.io_kafka import (
            fetch_offsets_wire,
            tail_n_offsets,
        )

        begins, ends = fetch_offsets_wire(self.options["bootstrap"], self.topic)
        target = self.options.get("target_total")
        starts = (
            tail_n_offsets(begins, ends, int(target))
            if target is not None
            else begins
        )
        return [
            _TP(p, int(starts.get(p, 0)), int(end))
            for p, end in sorted(ends.items())
        ]

    def read(self, part: _TP):
        client = _client(self.options)
        try:
            offset = part.start
            while offset < part.end:
                _hw, recs = client.fetch(
                    self.topic, part.partition, offset, self.max_bytes
                )
                recs = [t for t in recs if t[0] < part.end]
                if not recs:
                    break
                for off, key, value in recs:
                    yield (self.topic, part.partition, off, key, value)
                offset = recs[-1][0] + 1
        finally:
            client.close()


class _Committed(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


def _produce_rows(options, rows, producer_id: int = -1, producer_epoch: int = -1) -> "_Committed":
    """Shared per-task produce: group rows by their ``partition``
    column (missing/null → partition 0), send one record batch per
    ``batch_size`` rows per partition.

    With ``producer_id >= 0`` (streaming), each batch carries a
    DETERMINISTIC base_sequence composed from (micro-batch id, task
    partition, per-partition chunk index) — all stable across task
    retries because the stream source replays checkpointed offsets in
    deterministic order — so the broker's KIP-98 dedupe turns a task
    retry into an ack of the original append instead of a duplicate.
    (int32 sequence packs 11/10/10 bits; a query run past 2047
    micro-batches wraps the id — the real producer wraps sequences the
    same way, with the broker holding only a recent window.)"""
    topic = options["topic"]
    batch_size = int(options.get("batch_size", 500))
    client = None
    pending: dict[int, list] = {}
    chunk_idx: dict[int, int] = {}
    n = 0

    batch_id = task_pid = -1
    if producer_id >= 0:
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None:
            batch_id = int(tc.getLocalProperty("streaming.sql.batchId") or -1)
            task_pid = tc.partitionId()

    def seq_for(p: int) -> int:
        if producer_id < 0 or batch_id < 0:
            return -1
        c = chunk_idx.get(p, 0)
        chunk_idx[p] = c + 1
        return ((batch_id & 0x7FF) << 20) | ((task_pid & 0x3FF) << 10) | (c & 0x3FF)

    def as_bytes(v):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        return v.encode() if v is not None else None

    def send(p, recs):
        nonlocal client
        if client is None:
            client = _client(options)
        client.produce(
            topic, p, recs,
            producer_id=producer_id,
            producer_epoch=producer_epoch,
            base_sequence=seq_for(p),
        )

    try:
        for row in rows:
            d = row.asDict()
            p = int(d.get("partition") or 0)
            pending.setdefault(p, []).append(
                (as_bytes(d.get("key")), as_bytes(d.get("value")))
            )
            n += 1
            if len(pending[p]) >= batch_size:
                send(p, pending.pop(p))
        for p, recs in pending.items():
            send(p, recs)
    finally:
        if client is not None:
            client.close()
    return _Committed(n)


class KafkaWireBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.options = options

    def write(self, rows):
        return _produce_rows(self.options, rows)


class KafkaWireStreamWriter(DataSourceStreamWriter):
    """Micro-batch streaming produce — ``writeStream.format("kafka_wire")``.
    The reference's continuous producer loop (ProdutorAvro.java:67-95)
    as a Structured Streaming sink.

    Semantics: IDEMPOTENT within a query run (default) — at query start
    the driver obtains a KIP-98 producer id (InitProducerId), every
    task's batches carry deterministic sequences, and the broker acks
    retried batches with their original offsets instead of appending
    twice. Across query RESTARTS the replayed last micro-batch gets a
    fresh producer id, so the cross-restart contract is at-least-once —
    exactly the JVM connector's idempotent (non-transactional) producer
    behavior; pair with the engine's streaming dedup downstream for
    end-to-end exactly-once. ``idempotent=false`` opts out."""

    def __init__(self, options):
        self.options = options
        self.producer_id = -1
        self.producer_epoch = -1
        if str(options.get("idempotent", "true")).lower() != "false":
            client = _client(options)  # driver-side, once per query run
            try:
                self.producer_id, self.producer_epoch = client.init_producer_id()
            finally:
                client.close()

    def write(self, rows):
        return _produce_rows(
            self.options, rows, self.producer_id, self.producer_epoch
        )

    def commit(self, messages, batchId) -> None:
        # appends are already durable in the broker; nothing to finalize
        pass

    def abort(self, messages, batchId) -> None:
        # at-least-once: produced rows of a failed batch remain (see
        # class docstring); nothing to roll back in the wire protocol
        pass


class KafkaWireStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: the offset is a per-partition dict; each
    ``read`` drains up to ``maxRecordsPerBatch`` NEW records across
    partitions (round-robin by partition order) and returns the
    advanced offset. An empty poll returns the same offset, so
    ``processAllAvailable`` terminates when the broker is drained."""

    def __init__(self, options):
        self.options = options
        self.topic = options["topic"]
        self.max_bytes = int(options.get("max_bytes", 1 << 20))
        self.per_batch = int(options.get("maxRecordsPerBatch", 10_000))

    def initialOffset(self) -> dict:
        from teste_carga_avro_vs_json_spark.sources.io_kafka import (
            fetch_offsets_wire,
        )

        begins, ends = fetch_offsets_wire(self.options["bootstrap"], self.topic)
        source = (
            ends
            if self.options.get("startingOffsets", "earliest") == "latest"
            else begins
        )
        return {str(p): int(o) for p, o in sorted(source.items())}

    def read(self, start: dict):
        client = _client(self.options)
        rows, offsets = [], dict(start)
        budget = self.per_batch
        try:
            for p_str in sorted(offsets, key=int):
                if budget <= 0:
                    break
                p, offset = int(p_str), int(offsets[p_str])
                while budget > 0:
                    hw, recs = client.fetch(self.topic, p, offset, self.max_bytes)
                    if offset >= hw or not recs:
                        break
                    for off, key, value in recs[:budget]:
                        rows.append((self.topic, p, off, key, value))
                        offset = off + 1
                    budget -= len(recs[:budget])
                offsets[p_str] = offset
        finally:
            client.close()
        return iter(rows), offsets

    def readBetweenOffsets(self, start: dict, end: dict):
        client = _client(self.options)
        rows = []
        try:
            for p_str in sorted(start, key=int):
                p = int(p_str)
                offset, stop = int(start[p_str]), int(end.get(p_str, start[p_str]))
                while offset < stop:
                    _hw, recs = client.fetch(self.topic, p, offset, self.max_bytes)
                    recs = [t for t in recs if t[0] < stop]
                    if not recs:
                        break
                    for off, key, value in recs:
                        rows.append((self.topic, p, off, key, value))
                    offset = recs[-1][0] + 1
        finally:
            client.close()
        return iter(rows)


class KafkaWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_wire"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema):
        return KafkaWireBatchReader(self.options)

    def writer(self, schema, overwrite: bool):
        return KafkaWireBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return KafkaWireStreamWriter(self.options)

    def simpleStreamReader(self, schema):
        return KafkaWireStreamReader(self.options)


def register(spark) -> None:
    """``spark.dataSource.register`` wrapper (idempotent)."""
    spark.dataSource.register(KafkaWireDataSource)
