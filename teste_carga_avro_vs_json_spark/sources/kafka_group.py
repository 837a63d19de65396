"""High-level consumer-group membership loop over the wire client.

This is the repo counterpart of the reference's consume model: N
``KafkaConsumer`` threads ``subscribe()``d to ONE group, each handed a
disjoint partition slice by the broker coordinator, with a
``ConsumerRebalanceListener`` that re-seeks whenever partitions are
(re)assigned (``ConsumidorAvro.java:61-68`` — the listener's
``onPartitionsAssigned`` seeks; group wiring
``ConfiguracaoKafka.java:169``). The Java client split is preserved:

- every member sends JoinGroup; the coordinator elects a LEADER;
- the leader computes the assignment CLIENT-SIDE (here:
  :func:`kafka_wire.range_assign`, the RangeAssignor default) and
  ships it via SyncGroup; followers receive theirs from the same call;
- heartbeats carry the rebalance signal: ``REBALANCE_IN_PROGRESS``
  means "rejoin now" — exactly what the Java heartbeat thread turns
  into the listener callback;
- on every (re)assignment the member RE-SEEKS to the group's
  COMMITTED offsets (the r9 offset store), so a partition moving
  between members resumes exactly where the previous owner committed —
  at-least-once across rebalances, exactly-once when commits precede
  handoff.

Scale note: this is the driver-side control surface (group membership
is a per-member, per-session negotiation); the executor hot path for
bulk reads remains the partition-parallel ``kafka_wire_source``. A
production deployment would run ONE membership per streaming query to
coordinate with non-Spark consumers, never one per task.
"""

from __future__ import annotations

from teste_carga_avro_vs_json_spark.sources.kafka_wire import (
    GroupCoordinatorError,
    RebalanceInProgressError,
    UnknownMemberIdError,
    WireKafkaClient,
    range_assign,
)


class GroupConsumer:
    """One group member. Usage::

        c = GroupConsumer(WireKafkaClient(*addr), "g1", ["topic"])
        c.join()                      # blocks through one rebalance
        records = c.poll()            # heartbeat + fetch assignment
        c.commit()                    # fence-checked offset commit
        c.close()                     # LeaveGroup (immediate rebalance
                                      # for survivors)

    ``poll`` returns ``(topic, partition, offset, key, value)`` tuples
    and transparently REJOINS (with re-seek to committed offsets) when
    the coordinator signals a rebalance; ``rebalances`` counts them so
    callers can observe reassignment, like the reference's listener
    logging (ConsumidorAvro.java:163-180)."""

    def __init__(
        self,
        client: WireKafkaClient,
        group: str,
        topics: list[str],
        session_timeout_ms: int = 10_000,
        rebalance_timeout_ms: int = 10_000,
        tail_n: int | None = None,
        instance_id: str | None = None,
        isolation_level: str = "read_uncommitted",
    ):
        """``tail_n`` switches the on-assignment seek from committed
        offsets to the reference's ``posicionarNoFimMenosN``
        (ConsumidorAvro.java:163-180): each assigned partition seeks
        to ``max(earliest, latest - ceil(tail_n / n_partitions))`` —
        the tail-N warm-read shape the reference's listener applies
        on every (re)assignment.

        ``isolation_level="read_committed"`` (r12, KIP-98) makes every
        fetch pass isolation 1: the broker withholds open-transaction
        data (the consumer pauses at the LSO, resuming on commit) and
        aborted transactions are filtered client-side; transaction
        markers are transparent and the consumed position advances
        past them.

        ``instance_id`` (KIP-345 ``group.instance.id``) makes this a
        STATIC member: a drop-and-rejoin within the session timeout
        re-acquires the previous assignment at the current generation
        with NO rebalance (the restart-heavy operational pattern), and
        ``close()`` skips LeaveGroup like the real static client — the
        assignment is held for a possible restart until the session
        expires."""
        self._client = client
        self.group = group
        self.topics = list(topics)
        self._session_ms = session_timeout_ms
        self._rebalance_ms = rebalance_timeout_ms
        self.tail_n = tail_n
        self.instance_id = instance_id
        if isolation_level not in ("read_uncommitted", "read_committed"):
            raise ValueError(
                f"isolation_level {isolation_level!r}: read_uncommitted"
                " or read_committed"
            )
        self.isolation_level = isolation_level
        self.member_id = ""
        self.generation = -1
        self.assignment: dict[str, list[int]] = {}
        self.positions: dict[tuple[str, int], int] = {}
        self.rebalances = 0
        self._closed = False

    # ------------------------------------------------------ membership
    def join(self) -> dict[str, list[int]]:
        """One full join+sync round; on success the member holds its
        assignment and has re-seeked every assigned partition to the
        group's committed offset (earliest when none — the
        ``auto.offset.reset=earliest`` default)."""
        while True:
            try:
                res = self._client.join_group(
                    self.group,
                    self.topics,
                    member_id=self.member_id,
                    session_timeout_ms=self._session_ms,
                    rebalance_timeout_ms=self._rebalance_ms,
                    instance_id=self.instance_id,
                )
            except UnknownMemberIdError:
                self.member_id = ""  # evicted: rejoin as a new member
                continue
            self.member_id = res["member_id"]
            self.generation = res["generation"]
            assignments = None
            if res["leader"] == self.member_id:
                # leader: compute the range assignment client-side
                # over every member's subscription metadata
                member_topics = {m: ts for m, ts in res["members"]}
                all_topics = sorted(
                    {t for ts in member_topics.values() for t in ts}
                )
                partitions = {
                    t: self._client.partitions_for(t) for t in all_topics
                }
                assignments = range_assign(member_topics, partitions)
            try:
                self.assignment = self._client.sync_group(
                    self.group, self.generation, self.member_id,
                    assignments,
                )
            except RebalanceInProgressError:
                continue  # another member moved the group: rejoin
            break
        self._seek_to_committed()
        return self.assignment

    def _seek_to_committed(self) -> None:
        """The listener's onPartitionsAssigned: position every owned
        partition at the group's committed offset, falling back to
        earliest — a moved partition resumes exactly where its previous
        owner committed. With ``tail_n`` set, apply the reference's
        end-minus-N seek instead (ConsumidorAvro.java:163-180:
        ``porParticao = ceil(totalAlvo / n_parts)``, start =
        ``max(begin, end - porParticao)``)."""
        self.positions = {}
        for topic, parts in self.assignment.items():
            if self.tail_n is not None:
                n_parts = max(1, len(parts))
                per_part = max(1, -(-self.tail_n // n_parts))  # ceil
                for p in parts:
                    begin = self._client.list_offset(topic, p, -2)
                    end = self._client.list_offset(topic, p, -1)
                    self.positions[(topic, p)] = max(begin, end - per_part)
                continue
            committed = self._client.offset_fetch(self.group, topic, parts)
            for p in parts:
                if p in committed:
                    pos = committed[p]
                else:
                    pos = self._client.list_offset(topic, p, -2)  # earliest
                self.positions[(topic, p)] = pos

    # ------------------------------------------------------ consumption
    def poll(
        self, max_bytes: int = 1 << 20
    ) -> list[tuple[str, int, int, bytes | None, bytes | None]]:
        """Heartbeat, then one fetch round over the assignment. A
        rebalance signal triggers a transparent rejoin (+ re-seek);
        the poll then reads from the NEW assignment — the Java
        ``poll()`` contract."""
        try:
            self._client.heartbeat_group(
                self.group, self.generation, self.member_id
            )
        except RebalanceInProgressError:
            self.rebalances += 1
            self.join()
        except UnknownMemberIdError:
            self.rebalances += 1
            self.member_id = ""
            self.join()
        out: list[tuple[str, int, int, bytes | None, bytes | None]] = []
        iso = 1 if self.isolation_level == "read_committed" else 0
        for (topic, partition), pos in sorted(self.positions.items()):
            _hw, recs = self._client.fetch(
                topic, partition, pos, max_bytes, isolation=iso
            )
            for off, key, value in recs:
                out.append((topic, partition, off, key, value))
            # markers occupy offsets but yield no records: advance the
            # position past everything this fetch CONSUMED (r12)
            next_pos = max(
                recs[-1][0] + 1 if recs else pos,
                getattr(self._client, "_last_fetch_pos", pos),
            )
            if next_pos > pos:
                self.positions[(topic, partition)] = next_pos
        return out

    def commit(self) -> None:
        """Commit current positions WITH membership credentials — the
        coordinator fences commits from stale generations or evicted
        members (raises the typed group errors)."""
        if self.positions:
            self._client.offset_commit(
                self.group,
                dict(self.positions),
                generation_id=self.generation,
                member_id=self.member_id,
            )

    def close(self) -> None:
        """LeaveGroup: survivors rebalance immediately instead of
        waiting out this member's session timeout. STATIC members
        (KIP-345) skip it — their assignment is held for a restart
        until the session expires, which is the point."""
        if not self._closed and self.member_id:
            self._closed = True
            if self.instance_id is None:
                self._client.leave_group(self.group, self.member_id)

    def __enter__(self) -> "GroupConsumer":
        self.join()
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def consume_transform_produce(
    consumer: GroupConsumer,
    producer,
    transform,
    out_topic: str,
    max_idle_polls: int = 10,
) -> int:
    """KIP-98 consume-transform-produce exactly-once loop (r13,
    VERDICT r12 order #2): one TRANSACTION per non-empty poll batch —
    produce the transformed records, stage the consumed positions with
    :meth:`TransactionalProducer.send_offsets_to_transaction`, commit.
    The group's committed offsets and the output batch become visible
    ATOMICALLY; a crash between produce and commit leaves the offsets
    at the previous committed position and the output invisible to
    read_committed consumers, so the next incarnation (whose
    InitProducerId fences the zombie and aborts its leftover txn)
    replays the batch and the end-to-end effect is exactly-once — the
    gap the reference's every-10k-records commit loop leaves open
    (ConsumidorAvro.java:111-115: offsets commit independently of any
    downstream effect).

    ``transform(topic, partition, offset, key, value)`` returns a
    ``(key, value)`` tuple, a list of them, or ``None`` to drop the
    record; output keeps the input's partition. Drains until every
    owned partition reaches its high watermark (or ``max_idle_polls``
    empty polls); returns the number of input records processed."""
    processed = 0
    idle = 0
    client = consumer._client  # same-module access, like grouped_tail_read
    while idle <= max_idle_polls:
        recs = consumer.poll()
        if not recs:
            ends = {
                (t, p): client.list_offset(t, p, -1)
                for (t, p) in consumer.positions
            }
            if consumer.positions and all(
                consumer.positions[tp] >= ends[tp]
                for tp in consumer.positions
            ):
                break
            idle += 1
            continue
        idle = 0
        producer.begin_transaction()
        by_part: dict[int, list] = {}
        for topic, partition, off, key, value in recs:
            out = transform(topic, partition, off, key, value)
            if out is None:
                continue
            by_part.setdefault(partition, []).extend(
                out if isinstance(out, list) else [out]
            )
        for partition, out_recs in sorted(by_part.items()):
            producer.send(out_topic, partition, out_recs)
        # an all-dropped batch still commits its offsets: a legal
        # consume-only transaction (AddOffsetsToTxn opens it).
        # Membership credentials ride along (KIP-447 v3): a consumer
        # rebalanced away mid-batch is fenced HERE, before commit —
        # the transaction aborts and the partition's new owner
        # reprocesses the batch exactly once.
        try:
            producer.send_offsets_to_transaction(
                dict(consumer.positions),
                consumer.group,
                generation_id=consumer.generation,
                member_id=consumer.member_id,
                instance_id=consumer.instance_id,
            )
        except GroupCoordinatorError:
            # fenced (rebalanced away / evicted / stale generation):
            # the whole batch aborts — output invisible, offsets
            # unmoved — and the partitions' NEW owner replays it; the
            # next poll() rejoins transparently
            producer.abort_transaction()
            continue
        producer.commit_transaction()
        processed += len(recs)
    return processed


def grouped_tail_read(
    bootstrap: str,
    topic: str,
    group: str,
    n_threads: int,
    target_total: int,
    security: dict | None = None,
    max_idle_polls: int = 50,
) -> list[tuple[int, int, bytes | None, bytes | None]]:
    """The reference's consume model verbatim
    (ConsumidorAvro.java:45-125): ``n_threads`` GroupConsumer threads
    in ONE group, each re-seeking end-minus-N on (re)assignment
    (``posicionarNoFimMenosN``), jointly draining the topic tail until
    ``target_total`` records are in hand or every owned partition hit
    its high watermark. Returns ``(partition, offset, key, value)``
    rows, deduplicated on (partition, offset) — the group gives
    at-least-once across rebalances, the dedup makes the BOUNDED read
    exactly-once, matching the report semantics.

    Driver-side control path by design: the executor bulk path remains
    the partition-parallel ``kafka_wire_source``; this exists for
    reference parity (18 in-process threads, one group) and for
    coexisting with non-Spark consumers in a shared group."""
    import threading

    security = security or {}
    seen: dict[tuple[int, int], tuple] = {}
    lock = threading.Lock()
    errors: list[BaseException] = []

    def worker() -> None:
        client = WireKafkaClient.connect(bootstrap, **security)
        consumer = GroupConsumer(
            client, group, [topic], tail_n=target_total
        )
        try:
            consumer.join()
            idle = 0
            while idle <= max_idle_polls:
                with lock:
                    if len(seen) >= target_total:
                        break
                recs = consumer.poll()
                if recs:
                    idle = 0
                    with lock:
                        for t, p, off, k, v in recs:
                            seen[(p, off)] = (p, off, k, v)
                    continue
                # drained? every owned partition at its high watermark
                ends = {
                    (t, p): client.list_offset(t, p, -1)
                    for (t, p) in consumer.positions
                }
                if consumer.positions and all(
                    consumer.positions[tp] >= ends[tp]
                    for tp in consumer.positions
                ):
                    break
                idle += 1
        except BaseException as e:  # surfaced to the caller below
            with lock:
                errors.append(e)
        finally:
            consumer.close()
            client.close()

    threads = [
        threading.Thread(target=worker, name=f"{group}-{i}")
        for i in range(max(1, n_threads))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return sorted(seen.values())[:target_total]
