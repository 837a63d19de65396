"""format("kafka_wire") — the registered Spark 4 Python DataSource over
the stdlib wire client: batch read (one InputPartition per
TopicPartition), batch write (partition-routed produce), and streaming
read with maxRecordsPerBatch flow control, all against the loopback
broker over real sockets."""

from __future__ import annotations

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.sources import kafka_wire_source
from teste_carga_avro_vs_json_spark.sources.kafka_wire import (
    StubBroker,
    WireKafkaClient,
)


def _produce(broker, topic, by_part):
    c = WireKafkaClient(*broker.addr)
    try:
        for p, recs in by_part.items():
            c.produce(topic, p, recs)
    finally:
        c.close()


def test_batch_read_partition_per_tp(spark):
    kafka_wire_source.register(spark)
    by_part = {
        p: [(f"k{p}-{i}".encode(), f"v{p}-{i}".encode()) for i in range(5)]
        for p in range(3)
    }
    with StubBroker(num_partitions=3) as broker:
        _produce(broker, "carga", by_part)
        df = (
            spark.read.format("kafka_wire")
            .option("bootstrap", f"{broker.addr[0]}:{broker.addr[1]}")
            .option("topic", "carga")
            .load()
        )
        assert df.columns == ["topic", "partition", "offset", "key", "value"]
        # one Spark input partition per TopicPartition (connector model)
        assert df.rdd.getNumPartitions() == 3
        rows = df.collect()
    assert len(rows) == 15
    got = {(r.partition, r.offset): (bytes(r.key), bytes(r.value)) for r in rows}
    for p, recs in by_part.items():
        for i, kv in enumerate(recs):
            assert got[(p, i)] == kv


def test_batch_read_tail_n(spark):
    kafka_wire_source.register(spark)
    by_part = {p: [(None, f"{p}:{i}".encode()) for i in range(10)] for p in range(2)}
    with StubBroker(num_partitions=2) as broker:
        _produce(broker, "t", by_part)
        df = (
            spark.read.format("kafka_wire")
            .option("bootstrap", f"{broker.addr[0]}:{broker.addr[1]}")
            .option("topic", "t")
            .option("target_total", "6")
            .load()
        )
        rows = df.collect()
    # ceil(6/2)=3 per partition, from the tail
    assert sorted((r.partition, r.offset) for r in rows) == [
        (0, 7), (0, 8), (0, 9), (1, 7), (1, 8), (1, 9),
    ]


def test_batch_write_routes_by_partition_column(spark):
    kafka_wire_source.register(spark)
    data = [(f"msg-{i}", f"payload-{i}", (i - 1) % 4) for i in range(1, 41)]
    df = spark.createDataFrame(data, "key string, value string, partition int")
    with StubBroker(num_partitions=4) as broker:
        bootstrap = f"{broker.addr[0]}:{broker.addr[1]}"
        (
            df.write.format("kafka_wire")
            .option("bootstrap", bootstrap)
            .option("topic", "out")
            .option("batch_size", "4")
            .mode("append")
            .save()
        )
        # read back through the batch reader and check routing
        back = (
            spark.read.format("kafka_wire")
            .option("bootstrap", bootstrap)
            .option("topic", "out")
            .load()
            .collect()
        )
    assert len(back) == 40
    for r in back:
        key = bytes(r.key).decode()
        seq = int(key.split("-")[1])
        assert r.partition == (seq - 1) % 4
        assert bytes(r.value).decode() == f"payload-{seq}"


def test_stream_relay_read_then_write(spark, tmp_path):
    """Streaming RELAY through both halves of the DataSource: readStream
    from topic 'in', writeStream to topic 'out' on the same broker —
    the reference's continuous produce/consume loop as one Structured
    Streaming query. Offsets checkpoint through the reader; the sink
    runs the default IDEMPOTENT path (driver-assigned producer id,
    batchId-derived sequences) so this also exercises KIP-98 framing
    end-to-end in real streaming tasks."""
    kafka_wire_source.register(spark)
    by_part = {
        0: [(f"k{i}".encode(), f"v{i}".encode()) for i in range(0, 12, 2)],
        1: [(f"k{i}".encode(), f"v{i}".encode()) for i in range(1, 12, 2)],
    }
    with StubBroker(num_partitions=2) as broker:
        _produce(broker, "in", by_part)
        bootstrap = f"{broker.addr[0]}:{broker.addr[1]}"
        stream = (
            spark.readStream.format("kafka_wire")
            .option("bootstrap", bootstrap)
            .option("topic", "in")
            .option("maxRecordsPerBatch", "5")
            .load()
        )
        q = (
            stream.select("key", "value", "partition")
            .writeStream.format("kafka_wire")
            .option("bootstrap", bootstrap)
            .option("topic", "out")
            .option("checkpointLocation", str(tmp_path / "relay_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # read the relayed topic back: same records, same partitions
        out = (
            spark.read.format("kafka_wire")
            .option("bootstrap", bootstrap)
            .option("topic", "out")
            .load()
            .collect()
        )
    assert len(out) == 12
    got = {
        p: sorted(
            (bytes(r.key), bytes(r.value)) for r in out if r.partition == p
        )
        for p in (0, 1)
    }
    assert got == {p: sorted(recs) for p, recs in by_part.items()}


def test_stream_read_flow_control(spark, tmp_path):
    kafka_wire_source.register(spark)
    by_part = {0: [(None, f"a{i}".encode()) for i in range(30)]}
    with StubBroker(num_partitions=1) as broker:
        _produce(broker, "s", by_part)
        stream = (
            spark.readStream.format("kafka_wire")
            .option("bootstrap", f"{broker.addr[0]}:{broker.addr[1]}")
            .option("topic", "s")
            .option("maxRecordsPerBatch", "8")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("kw_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
            assert spark.sql("select count(*) c from kw_sink").first().c == 30
            # records arriving AFTER the query started are picked up
            # from the checkpointed offsets (incremental source)
            _produce(broker, "s", {0: [(None, f"a{i}".encode()) for i in range(30, 35)]})
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.sql("select * from kw_sink").collect()
    assert len(out) == 35
    assert sorted(r.offset for r in out) == list(range(35))
    assert {bytes(r.value).decode() for r in out} == {f"a{i}" for i in range(35)}
    # flow control: 30 records at 8/batch needs >= 4 micro-batches
    prog = q.recentProgress
    batches_with_rows = [p for p in prog if p["numInputRows"] > 0]
    assert len(batches_with_rows) >= 4
    assert max(p["numInputRows"] for p in batches_with_rows) <= 8


def test_idempotent_produce_dedupes_retries():
    """KIP-98 idempotent produce: same (producer_id, base_sequence) on
    a partition acks with the ORIGINAL offset instead of appending; a
    different sequence appends normally; pid -1 never dedupes."""
    from teste_carga_avro_vs_json_spark.sources.kafka_wire import WireKafkaClient

    with StubBroker(num_partitions=1) as broker:
        c = WireKafkaClient(*broker.addr)
        try:
            pid, epoch = c.init_producer_id()
            pid2, _ = c.init_producer_id()
            assert pid2 == pid + 1  # broker-assigned, monotone
            recs = [(b"k", b"v"), (b"k2", b"v2")]
            base = c.produce("t", 0, recs, producer_id=pid,
                             producer_epoch=epoch, base_sequence=7)
            # retry of the SAME batch: acked at the original offset
            assert c.produce("t", 0, recs, producer_id=pid,
                             producer_epoch=epoch, base_sequence=7) == base
            assert c.list_offset("t", 0, LATEST := -1) == 2  # no dup append
            # next sequence appends
            assert c.produce("t", 0, recs, producer_id=pid,
                             producer_epoch=epoch, base_sequence=8) == 2
            # another producer with the same sequence is independent
            assert c.produce("t", 0, recs, producer_id=pid2,
                             producer_epoch=0, base_sequence=7) == 4
            # non-idempotent produce never dedupes
            assert c.produce("t", 0, recs) == 6
            assert c.produce("t", 0, recs) == 8
        finally:
            c.close()


def test_stream_writer_task_retry_no_duplicates(spark):
    """Simulated Spark task retry of a streaming micro-batch: calling
    the stream writer's write() twice with the same rows (same batch,
    same task partition) must leave ONE copy in the broker — the
    deterministic (pid, sequence) dedupe at work. A second query run
    (new writer => new pid) appends again, as documented."""
    from pyspark.sql import Row

    from teste_carga_avro_vs_json_spark.sources.kafka_wire import WireKafkaClient
    from teste_carga_avro_vs_json_spark.sources.kafka_wire_source import (
        KafkaWireStreamWriter,
    )

    rows = [Row(key=b"k%d" % i, value=b"v%d" % i, partition=0) for i in range(7)]
    with StubBroker(num_partitions=1) as broker:
        opts = {
            "bootstrap": f"{broker.addr[0]}:{broker.addr[1]}",
            "topic": "retry",
        }
        w = KafkaWireStreamWriter(opts)
        assert w.producer_id >= 1000
        # outside a real streaming task there is no batchId local
        # property; pin one deterministically via a fake TaskContext?
        # No — drive through a real micro-batch id by monkeypatching the
        # local-property lookup is brittle; instead simulate the task
        # body exactly: same writer, same rows, same (batch, task) ids.
        import teste_carga_avro_vs_json_spark.sources.kafka_wire_source as kws

        real_produce_rows = kws._produce_rows

        class _FakeTC:
            @staticmethod
            def get():
                class _T:
                    def getLocalProperty(self, k):
                        return "5" if k == "streaming.sql.batchId" else None

                    def partitionId(self):
                        return 3

                return _T()

        import pyspark

        orig_tc = pyspark.TaskContext
        pyspark.TaskContext = _FakeTC
        try:
            w.write(iter(rows))
            w.write(iter(rows))  # the retry
            c = WireKafkaClient(*broker.addr)
            try:
                assert c.list_offset("retry", 0, -1) == 7  # ONE copy
            finally:
                c.close()
            # new query run: fresh pid -> appends (at-least-once across runs)
            w2 = KafkaWireStreamWriter(opts)
            assert w2.producer_id != w.producer_id
            w2.write(iter(rows))
            c = WireKafkaClient(*broker.addr)
            try:
                assert c.list_offset("retry", 0, -1) == 14
            finally:
                c.close()
        finally:
            pyspark.TaskContext = orig_tc


def test_stream_restart_from_checkpoint_continues(spark, tmp_path):
    """Checkpoint recovery: a second query run on the SAME checkpoint
    resumes from the committed offsets — already-delivered records are
    not re-read (readBetweenOffsets replays only the uncommitted tail),
    and records produced between the runs arrive exactly once in the
    sink."""
    kafka_wire_source.register(spark)
    ck = str(tmp_path / "ck")
    with StubBroker(num_partitions=1) as broker:
        bootstrap = f"{broker.addr[0]}:{broker.addr[1]}"
        _produce(broker, "r", {0: [(None, f"x{i}".encode()) for i in range(10)]})

        outdir = str(tmp_path / "out")

        def run_once():
            q = (
                spark.readStream.format("kafka_wire")
                .option("bootstrap", bootstrap)
                .option("topic", "r")
                .option("maxRecordsPerBatch", "4")
                .load()
                .writeStream.format("parquet")
                .option("path", outdir)
                .option("checkpointLocation", ck)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        run_once()
        assert spark.read.parquet(outdir).count() == 10
        # new data lands while no query is running
        _produce(broker, "r", {0: [(None, f"x{i}".encode()) for i in range(10, 16)]})
        run_once()
        out = spark.read.parquet(outdir).collect()
    # the restart resumed from the committed offsets: the sink holds
    # each record exactly once, no re-read of the first ten
    assert sorted(r.offset for r in out) == list(range(16))
    assert {bytes(r.value).decode() for r in out} == {f"x{i}" for i in range(16)}
