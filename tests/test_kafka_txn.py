"""KIP-98 transactions over the wire stack (r12): atomic multi-
partition produce, control markers, LSO gating, read_committed
filtering, zombie fencing, and epoch-reset producer state — all
against the real socket path (StubBroker), no mocks.

Reference context: the reference produces fire-and-forget acks=1 and
counts errors (ProdutorAvro.java:74-90); transactions are the engine's
extension of that produce path to exactly-once-with-atomicity."""

import pytest

from teste_carga_avro_vs_json_spark.sources.kafka_wire import (
    InvalidTxnStateError,
    ProducerFencedError,
    StubBroker,
    TransactionalProducer,
    WireKafkaClient,
    decode_batches_meta,
)


def _values(recs):
    return [v for _off, _k, v in recs]


def test_commit_is_atomic_across_partitions():
    """Data produced inside an open transaction is invisible to
    read_committed on EVERY partition (LSO gating) and appears on all
    of them only after EndTxn(commit); read_uncommitted sees it
    immediately. Control markers never surface as records in either
    isolation level."""
    with StubBroker(num_partitions=2) as broker:
        c = WireKafkaClient(*broker.addr)
        try:
            with TransactionalProducer(
                *broker.addr, transactional_id="app"
            ) as tp:
                tp.begin_transaction()
                tp.send("t", 0, [(b"k1", b"v1")])
                tp.send("t", 1, [(b"k2", b"v2"), (b"k3", b"v3")])
                for p in (0, 1):
                    lso, rc = c.fetch("t", p, 0, isolation=1)
                    assert lso == 0 and rc == []  # gated at the LSO
                hw0, ru0 = c.fetch("t", 0, 0)
                assert _values(ru0) == [b"v1"]  # uncommitted sees it
                tp.commit_transaction()
            lso0, rc0 = c.fetch("t", 0, 0, isolation=1)
            lso1, rc1 = c.fetch("t", 1, 0, isolation=1)
            assert _values(rc0) == [b"v1"]
            assert _values(rc1) == [b"v2", b"v3"]
            # markers advanced the offsets but never surface as rows
            assert lso0 == 2 and lso1 == 3
            _hw, ru = c.fetch("t", 0, 0)
            assert _values(ru) == [b"v1"]
        finally:
            c.close()


def test_abort_invisible_to_read_committed():
    with StubBroker(num_partitions=1) as broker:
        c = WireKafkaClient(*broker.addr)
        try:
            with TransactionalProducer(
                *broker.addr, transactional_id="app"
            ) as tp:
                tp.begin_transaction()
                tp.send("t", 0, [(b"k", b"dead1"), (b"k", b"dead2")])
                tp.abort_transaction()
                tp.begin_transaction()
                tp.send("t", 0, [(b"k", b"live")])
                tp.commit_transaction()
            lso, rc = c.fetch("t", 0, 0, isolation=1)
            assert _values(rc) == [b"live"]
            _hw, ru = c.fetch("t", 0, 0)
            # read_uncommitted sees aborted data too (real semantics)
            assert _values(ru) == [b"dead1", b"dead2", b"live"]
        finally:
            c.close()


def test_zombie_fencing_and_leftover_abort():
    """A second InitProducerId with the same transactional.id bumps
    the epoch: the old incarnation's produce AND EndTxn raise
    ProducerFencedError, and the transaction it left OPEN is aborted
    by the coordinator — its data never reaches read_committed."""
    with StubBroker(num_partitions=1) as broker:
        c = WireKafkaClient(*broker.addr)
        try:
            old = TransactionalProducer(*broker.addr, transactional_id="a")
            old.begin_transaction()
            old.send("t", 0, [(b"k", b"zombie-data")])
            # new incarnation takes over (crash-restart)
            new = TransactionalProducer(*broker.addr, transactional_id="a")
            assert new.producer_id == old.producer_id  # stable pid
            assert new.producer_epoch == old.producer_epoch + 1
            with pytest.raises(ProducerFencedError):
                old.send("t", 0, [(b"k", b"more-zombie")])
            with pytest.raises(ProducerFencedError):
                old._client.end_txn(
                    "a", old.producer_id, old.producer_epoch, True
                )
            new.begin_transaction()
            new.send("t", 0, [(b"k", b"fresh")])
            new.commit_transaction()
            _lso, rc = c.fetch("t", 0, 0, isolation=1)
            assert _values(rc) == [b"fresh"]  # zombie txn aborted
            new.close()
            old._client.close()
        finally:
            c.close()


def test_epoch_bump_resets_sequences():
    """Producer state is per-epoch (KIP-98): the new incarnation's
    sequences restart at 0 and must NOT hit the old epoch's duplicate
    window; a batch from an OLDER epoch is rejected at the log."""
    with StubBroker(num_partitions=1) as broker:
        tp1 = TransactionalProducer(*broker.addr, transactional_id="a")
        tp1.begin_transaction()
        tp1.send("t", 0, [(b"k", b"e0-seq0")])
        tp1.abort_transaction()
        tp2 = TransactionalProducer(*broker.addr, transactional_id="a")
        tp2.begin_transaction()
        base = tp2.send("t", 0, [(b"k", b"e1-seq0")])  # seq 0 again
        tp2.commit_transaction()
        assert base == 2  # appended (not deduped against e0's seq 0)
        with pytest.raises(ProducerFencedError):
            tp1._client.produce(
                "t", 0, [(b"k", b"stale")],
                producer_id=tp1.producer_id,
                producer_epoch=tp1.producer_epoch,  # older epoch
                base_sequence=1,
                transactional_id="a",
            )
        tp1._client.close()
        tp2.close()


def test_txn_state_machine_guards():
    with StubBroker(num_partitions=1) as broker:
        tp = TransactionalProducer(*broker.addr, transactional_id="a")
        with pytest.raises(InvalidTxnStateError, match="outside"):
            tp.send("t", 0, [(b"k", b"v")])
        with pytest.raises(InvalidTxnStateError, match="no transaction"):
            tp.commit_transaction()
        tp.begin_transaction()
        with pytest.raises(InvalidTxnStateError, match="already"):
            tp.begin_transaction()
        # commit with no partitions = local no-op, state resets
        tp.commit_transaction()
        # broker-side: EndTxn with no ongoing txn -> INVALID_TXN_STATE
        with pytest.raises(InvalidTxnStateError):
            tp._client.end_txn(
                "a", tp.producer_id, tp.producer_epoch, True
            )
        # transactional produce to an UNREGISTERED partition
        with pytest.raises(InvalidTxnStateError):
            tp._client.produce(
                "t", 0, [(b"k", b"v")],
                producer_id=tp.producer_id,
                producer_epoch=tp.producer_epoch,
                base_sequence=0,
                transactional_id="a",
            )
        tp.close()


def test_unfinished_transaction_aborts_on_close():
    with StubBroker(num_partitions=1) as broker:
        with TransactionalProducer(
            *broker.addr, transactional_id="a"
        ) as tp:
            tp.begin_transaction()
            tp.send("t", 0, [(b"k", b"orphaned")])
            # context exit: the real client aborts an unfinished txn
        c = WireKafkaClient(*broker.addr)
        try:
            _lso, rc = c.fetch("t", 0, 0, isolation=1)
            assert rc == []
            log_metas = [
                decode_batches_meta(b)[0][0]
                for _base, b in broker._log("t", 0).batches
            ]
            assert log_metas[-1]["control"] is True  # abort marker
        finally:
            c.close()


def test_plain_consumers_skip_markers_on_mixed_topics():
    """The pre-existing bounded-consume path (fetch_until/consume_from)
    keeps working on a topic carrying transactional data: markers are
    transparent, committed+aborted DATA is visible (read_uncommitted),
    offsets stay monotone."""
    with StubBroker(num_partitions=1) as broker:
        c = WireKafkaClient(*broker.addr)
        try:
            c.produce("t", 0, [(b"p", b"plain")])
            with TransactionalProducer(
                *broker.addr, transactional_id="x"
            ) as tp:
                tp.begin_transaction()
                tp.send("t", 0, [(b"k", b"txn")])
                tp.commit_transaction()
            hw = c.list_offset("t", 0, -1)
            rows = list(c.fetch_until("t", 0, 0, hw))
            assert [v for _o, _k, v in rows] == [b"plain", b"txn"]
            offs = [o for o, _k, _v in rows]
            assert offs == sorted(offs)
        finally:
            c.close()


def test_group_consumer_read_committed():
    """GroupConsumer(isolation_level='read_committed') sees committed
    transactions atomically, never aborted data, pauses at the LSO
    while a transaction is open, and its committed offsets advance
    past markers (no stuck positions)."""
    from teste_carga_avro_vs_json_spark.sources.kafka_group import (
        GroupConsumer,
    )

    with StubBroker(
        num_partitions=1, initial_rebalance_delay_ms=0
    ) as broker:
        tp = TransactionalProducer(*broker.addr, transactional_id="a")
        tp.begin_transaction()
        tp.send("t", 0, [(b"k", b"dead")])
        tp.abort_transaction()
        tp.begin_transaction()
        tp.send("t", 0, [(b"k", b"c1"), (b"k", b"c2")])
        tp.commit_transaction()
        c = WireKafkaClient(*broker.addr)
        gc = GroupConsumer(
            c, "g1", ["t"], isolation_level="read_committed"
        )
        gc.join()
        got = []
        for _ in range(6):
            got.extend(gc.poll())
            if len(got) >= 2:
                break
        assert [v for *_rest, v in got] == [b"c1", b"c2"]
        # open transaction: the consumer pauses at the LSO...
        tp.begin_transaction()
        tp.send("t", 0, [(b"k", b"open")])
        assert gc.poll() == []
        # ...and resumes when it commits
        tp.commit_transaction()
        got2 = []
        for _ in range(6):
            got2.extend(gc.poll())
            if got2:
                break
        assert [v for *_rest, v in got2] == [b"open"]
        # position advanced past the trailing marker: commit + a fresh
        # member starts AFTER it (nothing replays)
        gc.commit()
        gc.close()
        tp.close()
        c2 = WireKafkaClient(*broker.addr)
        gc2 = GroupConsumer(
            c2, "g1", ["t"], isolation_level="read_committed"
        )
        gc2.join()
        assert gc2.poll() == []
        gc2.close()
        c.close()
        c2.close()


def test_group_consumer_rejects_bad_isolation():
    from teste_carga_avro_vs_json_spark.sources.kafka_group import (
        GroupConsumer,
    )

    with StubBroker(num_partitions=1) as broker:
        c = WireKafkaClient(*broker.addr)
        try:
            with pytest.raises(ValueError, match="isolation_level"):
                GroupConsumer(c, "g", ["t"], isolation_level="dirty")
        finally:
            c.close()
