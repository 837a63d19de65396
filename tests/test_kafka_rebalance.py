"""Consumer-group REBALANCE over the wire (r10): JoinGroup v1 /
SyncGroup / Heartbeat / LeaveGroup against the StubBroker coordinator,
plus the high-level GroupConsumer membership loop — the repo
counterpart of the reference's 18-threads-one-group consume model
(ConsumidorAvro.java:61-68: subscribe + ConsumerRebalanceListener that
re-seeks on assignment; group wiring ConfiguracaoKafka.java:169).

Covers the r9 verdict's done-criteria exactly: two concurrent wire
consumers in one group get DISJOINT partitions and jointly consume
exactly-once; one leaving mid-stream triggers reassignment + re-seek
to committed offsets; commits are generation-fenced (composing with
the r9 offset store)."""

from __future__ import annotations

import threading
import time

import pytest

from teste_carga_avro_vs_json_spark.sources.kafka_group import GroupConsumer
from teste_carga_avro_vs_json_spark.sources.kafka_wire import (
    IllegalGenerationError,
    RebalanceInProgressError,
    StubBroker,
    UnknownMemberIdError,
    WireKafkaClient,
    decode_consumer_metadata,
    decode_member_assignment,
    encode_consumer_metadata,
    encode_member_assignment,
    range_assign,
)


# ------------------------------------------------------------- pure units
def test_range_assign_matches_java_semantics():
    """RangeAssignor: sorted members each take a contiguous slice of
    the sorted partitions; the first n%k members get the extra one."""
    members = {"m2": ["t"], "m1": ["t"]}
    out = range_assign(members, {"t": [3, 0, 1, 2]})
    assert out["m1"]["t"] == [0, 1] and out["m2"]["t"] == [2, 3]
    # 5 partitions over 2: first member gets 3 (ceil), second 2
    out = range_assign(members, {"t": [0, 1, 2, 3, 4]})
    assert out["m1"]["t"] == [0, 1, 2] and out["m2"]["t"] == [3, 4]
    # a member not subscribed to a topic gets nothing from it
    out = range_assign(
        {"a": ["t1"], "b": ["t1", "t2"]}, {"t1": [0, 1], "t2": [0]}
    )
    assert out["a"] == {"t1": [0]}
    assert out["b"] == {"t1": [1], "t2": [0]}
    # more members than partitions: tail members get no slice
    out = range_assign({"a": ["t"], "b": ["t"], "c": ["t"]}, {"t": [0]})
    assert out["a"] == {"t": [0]} and out["b"] == {} and out["c"] == {}


def test_consumer_protocol_codecs_roundtrip():
    meta = encode_consumer_metadata(["carga", "other"])
    assert decode_consumer_metadata(meta) == ["carga", "other"]
    asg = {"carga": [2, 0], "other": [1]}
    raw = encode_member_assignment(asg)
    assert decode_member_assignment(raw) == {
        "carga": [0, 2], "other": [1],
    }
    assert decode_member_assignment(b"") == {}


# --------------------------------------------------------- protocol level
def test_single_member_join_sync_heartbeat_leave():
    with StubBroker(num_partitions=4, initial_rebalance_delay_ms=50) as b:
        c = WireKafkaClient(*b.addr)
        try:
            res = c.join_group("g1", ["carga"])
            assert res["generation"] == 1
            assert res["leader"] == res["member_id"]
            assert res["protocol"] == "range"
            assert res["members"] == [(res["member_id"], ["carga"])]
            mid = res["member_id"]
            asg = c.sync_group(
                "g1", 1, mid,
                {mid: {"carga": c.partitions_for("carga")}},
            )
            assert asg == {"carga": [0, 1, 2, 3]}
            c.heartbeat_group("g1", 1, mid)  # stable: no error
            # fencing: wrong generation / unknown member
            with pytest.raises(IllegalGenerationError):
                c.heartbeat_group("g1", 99, mid)
            with pytest.raises(UnknownMemberIdError):
                c.heartbeat_group("g1", 1, "ghost")
            c.leave_group("g1", mid)
            with pytest.raises(UnknownMemberIdError):
                c.heartbeat_group("g1", 1, mid)
        finally:
            c.close()


def test_offset_commit_generation_fencing():
    """While a group uses membership, only the current generation's
    members may commit — the exactly-once guard the reference relies
    on; plain offsets-namespace groups (r9 path) stay open."""
    with StubBroker(num_partitions=2, initial_rebalance_delay_ms=50) as b:
        c = WireKafkaClient(*b.addr)
        try:
            res = c.join_group("g1", ["carga"])
            mid = res["member_id"]
            c.sync_group("g1", 1, mid, {mid: {"carga": [0, 1]}})
            c.offset_commit(
                "g1", {("carga", 0): 3}, generation_id=1, member_id=mid
            )
            assert c.offset_fetch("g1", "carga", [0]) == {0: 3}
            with pytest.raises(IllegalGenerationError):
                c.offset_commit(
                    "g1", {("carga", 0): 9},
                    generation_id=99, member_id=mid,
                )
            with pytest.raises(UnknownMemberIdError):
                c.offset_commit(
                    "g1", {("carga", 0): 9},
                    generation_id=1, member_id="ghost",
                )
            # the standalone (-1, "") shape is fenced off a LIVE group
            with pytest.raises(UnknownMemberIdError):
                c.offset_commit("g1", {("carga", 0): 9})
            assert c.offset_fetch("g1", "carga", [0]) == {0: 3}  # unclobbered
            # ...but an offsets-namespace group with no members is open
            c.offset_commit("g2", {("carga", 0): 7})
            assert c.offset_fetch("g2", "carga", [0]) == {0: 7}
        finally:
            c.close()


def test_second_join_signals_rebalance_via_heartbeat():
    """A stable member learns about a newcomer through heartbeat err 27
    (REBALANCE_IN_PROGRESS) and must rejoin; the join completes as soon
    as every known member has rejoined."""
    with StubBroker(num_partitions=4, initial_rebalance_delay_ms=50) as b:
        c1 = WireKafkaClient(*b.addr)
        c2 = WireKafkaClient(*b.addr)
        try:
            r1 = c1.join_group("g1", ["carga"])
            m1 = r1["member_id"]
            c1.sync_group("g1", 1, m1, {m1: {"carga": [0, 1, 2, 3]}})
            # newcomer joins in the background (blocks server-side)
            result: dict = {}

            def _join_b():
                result["res"] = c2.join_group("g1", ["carga"])

            t = threading.Thread(target=_join_b)
            t.start()
            # the stable member's heartbeat turns into the rejoin signal
            deadline = time.monotonic() + 5.0
            while True:
                try:
                    c1.heartbeat_group("g1", 1, m1)
                except RebalanceInProgressError:
                    break
                assert time.monotonic() < deadline, "no rebalance signal"
                time.sleep(0.02)
            r1b = c1.join_group("g1", ["carga"], member_id=m1)
            t.join(timeout=5.0)
            assert not t.is_alive()
            r2 = result["res"]
            assert r1b["generation"] == r2["generation"] == 2
            assert r1b["member_id"] == m1  # identity survives rejoin
            leader_res = r1b if r1b["leader"] == m1 else r2
            assert len(leader_res["members"]) == 2
        finally:
            c1.close()
            c2.close()


# ------------------------------------------------------- GroupConsumer e2e
def _produce_all(addr, n_parts: int, per_part: int, tag: str = "v"):
    p = WireKafkaClient(*addr)
    try:
        expected = set()
        for part in range(n_parts):
            batch = []
            for i in range(per_part):
                v = f"{tag}-{part}-{i}".encode()
                batch.append((f"k{part}-{i}".encode(), v))
                expected.add(v)
            p.produce("carga", part, batch)
        return expected
    finally:
        p.close()


def test_two_group_consumers_split_and_consume_exactly_once():
    """The r9 verdict's done-criterion: two concurrent wire consumers
    in ONE group get disjoint partition slices covering the topic and
    jointly consume every record exactly once; after one LEAVES
    mid-stream, the survivor is reassigned ALL partitions and resumes
    from the group's committed offsets (re-seek), still exactly-once."""
    with StubBroker(num_partitions=4, initial_rebalance_delay_ms=400) as b:
        expected = _produce_all(b.addr, 4, 5)
        cl1, cl2 = WireKafkaClient(*b.addr), WireKafkaClient(*b.addr)
        c1 = GroupConsumer(cl1, "g1", ["carga"])
        c2 = GroupConsumer(cl2, "g1", ["carga"])
        try:
            # join concurrently: the initial-rebalance delay (KIP-134)
            # lands both in generation 1
            t1 = threading.Thread(target=c1.join)
            t2 = threading.Thread(target=c2.join)
            t1.start(), t2.start()
            t1.join(timeout=10), t2.join(timeout=10)
            assert not t1.is_alive() and not t2.is_alive()
            assert c1.generation == c2.generation == 1
            p1 = set(c1.assignment.get("carga", []))
            p2 = set(c2.assignment.get("carga", []))
            assert p1 | p2 == {0, 1, 2, 3}
            assert p1 & p2 == set()
            assert len(p1) == len(p2) == 2  # range: 4 over 2

            got1 = {v for (_, _, _, _k, v) in c1.poll()}
            got2 = {v for (_, _, _, _k, v) in c2.poll()}
            assert got1 | got2 == expected
            assert got1 & got2 == set()  # disjoint: exactly-once jointly
            c1.commit()
            c2.commit()

            # member 2 leaves mid-stream -> survivor rebalances and
            # re-seeks to COMMITTED offsets: only NEW records arrive
            c2.close()
            fresh = _produce_all(b.addr, 4, 2, tag="w")
            deadline = time.monotonic() + 10.0
            got_after: set = set()
            while got_after != fresh:
                got_after |= {v for (_, _, _, _k, v) in c1.poll()}
                assert time.monotonic() < deadline, (
                    f"missing {fresh - got_after}"
                )
            assert c1.rebalances >= 1
            assert set(c1.assignment["carga"]) == {0, 1, 2, 3}
            assert got_after == fresh  # nothing re-read, nothing lost
            c1.commit()
            # committed frontier == log end on every partition
            committed = cl1.offset_fetch("g1", "carga", [0, 1, 2, 3])
            for part in range(4):
                assert committed[part] == cl1.list_offset("carga", part, -1)
        finally:
            c1.close()
            cl1.close()
            cl2.close()


def test_session_expiry_evicts_silent_member():
    """A member that stops heartbeating past its session timeout is
    evicted; the survivor inherits its partitions (crash semantics —
    no LeaveGroup involved)."""
    with StubBroker(num_partitions=4, initial_rebalance_delay_ms=400) as b:
        cl1, cl2 = WireKafkaClient(*b.addr), WireKafkaClient(*b.addr)
        c1 = GroupConsumer(cl1, "g1", ["carga"], session_timeout_ms=700)
        c2 = GroupConsumer(cl2, "g1", ["carga"], session_timeout_ms=700)
        try:
            t1 = threading.Thread(target=c1.join)
            t2 = threading.Thread(target=c2.join)
            t1.start(), t2.start()
            t1.join(timeout=10), t2.join(timeout=10)
            assert len(c1.assignment.get("carga", [])) == 2
            # c2 goes silent (simulated crash); c1 keeps polling
            deadline = time.monotonic() + 10.0
            while set(c1.assignment.get("carga", [])) != {0, 1, 2, 3}:
                c1.poll()
                assert time.monotonic() < deadline, "no eviction rebalance"
                time.sleep(0.1)
            assert c1.rebalances >= 1
        finally:
            c1.close()
            cl1.close()
            cl2.close()


def test_group_apis_require_auth_when_sasl_enabled():
    """The membership APIs sit behind the same per-connection auth
    gate as every other non-SASL API (real-broker behavior: drop)."""
    with StubBroker(
        num_partitions=2,
        sasl_plain={"user": "pw"},
        initial_rebalance_delay_ms=50,
    ) as b:
        plain = WireKafkaClient(*b.addr)
        with pytest.raises((ConnectionError, OSError, ValueError)):
            plain.join_group("g1", ["carga"])
        plain.close()
        authed = WireKafkaClient(
            *b.addr,
            security_protocol="SASL_PLAINTEXT",
            sasl_username="user",
            sasl_password="pw",
        )
        try:
            res = authed.join_group("g1", ["carga"])
            assert res["generation"] == 1
        finally:
            authed.close()


def test_tail_n_seek_on_assignment_matches_reference_shape():
    """The reference's posicionarNoFimMenosN applied by the membership
    loop (ConsumidorAvro.java:163-180): on assignment each partition
    seeks to max(begin, end - ceil(tail_n / n_parts)) — the warm
    tail-read every consumer thread performs on (re)assignment."""
    with StubBroker(num_partitions=2, initial_rebalance_delay_ms=50) as b:
        _produce_all(b.addr, 2, 10)  # 10 records on each partition
        cl = WireKafkaClient(*b.addr)
        c = GroupConsumer(cl, "g1", ["carga"], tail_n=6)
        try:
            c.join()  # alone: both partitions, ceil(6/2)=3 per part
            assert c.positions == {("carga", 0): 7, ("carga", 1): 7}
            got = c.poll()
            assert len(got) == 6  # exactly the tail-3 of each partition
            assert all(off >= 7 for (_t, _p, off, _k, _v) in got)
            # tail larger than the log clamps to earliest
            c2 = GroupConsumer(
                WireKafkaClient(*b.addr), "g2", ["carga"], tail_n=1000
            )
            c2.join()
            assert c2.positions == {("carga", 0): 0, ("carga", 1): 0}
            c2.close()
        finally:
            c.close()
            cl.close()


def test_inconsistent_protocol_rejected_at_join():
    """A joiner sharing no assignor with the group is rejected with
    INCONSISTENT_GROUP_PROTOCOL (err 23) at entry — without disturbing
    the stable group."""
    with StubBroker(num_partitions=2, initial_rebalance_delay_ms=50) as b:
        c1 = WireKafkaClient(*b.addr)
        c2 = WireKafkaClient(*b.addr)
        try:
            r1 = c1.join_group("g1", ["carga"], protocol="range")
            m1 = r1["member_id"]
            c1.sync_group("g1", 1, m1, {m1: {"carga": [0, 1]}})
            with pytest.raises(ValueError, match="INCONSISTENT_GROUP_PROTOCOL"):
                c2.join_group("g1", ["carga"], protocol="sticky")
            # the stable member is untouched: same generation, no 27
            c1.heartbeat_group("g1", 1, m1)
        finally:
            c1.close()
            c2.close()


# -------------------------------------------------------- property-based
def test_range_assign_invariants_property():
    """Hypothesis sweep of the assignor invariants: per topic the
    slices are DISJOINT, their union is every partition, sizes differ
    by at most one across subscribed members, and the assignment is a
    pure function of its inputs (determinism)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        n_members=st.integers(1, 8),
        topics=st.dictionaries(
            st.sampled_from(["t1", "t2", "t3"]),
            st.integers(1, 17),
            min_size=1,
            max_size=3,
        ),
        subs=st.data(),
    )
    def check(n_members, topics, subs):
        member_topics = {
            f"m{i}": subs.draw(
                st.lists(
                    st.sampled_from(sorted(topics)),
                    min_size=0,
                    max_size=len(topics),
                    unique=True,
                ),
                label=f"subs-m{i}",
            )
            for i in range(n_members)
        }
        parts = {t: list(range(n)) for t, n in topics.items()}
        out = range_assign(member_topics, parts)
        assert out == range_assign(member_topics, parts)  # deterministic
        for topic, n in topics.items():
            slices = {
                m: out[m].get(topic, []) for m in member_topics
            }
            subscribed = [
                m for m, ts in member_topics.items() if topic in ts
            ]
            for m, sl in slices.items():
                if m not in subscribed:
                    assert sl == []
            claimed = [p for m in subscribed for p in slices[m]]
            assert len(set(claimed)) == len(claimed)  # disjoint
            if subscribed:
                assert sorted(claimed) == list(range(n))  # complete
                sizes = [len(slices[m]) for m in subscribed]
                assert max(sizes) - min(sizes) <= 1  # balanced
            else:
                assert claimed == []  # nobody subscribed: unassigned

    check()


def test_list_and_describe_groups_admin_surface():
    """kafka-consumer-groups --list/--describe over the wire: a stable
    two-member group reports its state machine, protocol, members and
    per-member assignments; an unknown group answers state Dead with
    no members; after all members leave, the group is Empty but still
    listed (offsets outlive membership)."""
    with StubBroker(num_partitions=4, initial_rebalance_delay_ms=300) as b:
        _produce_all(b.addr, 4, 2)
        admin = WireKafkaClient(*b.addr)
        cl1, cl2 = WireKafkaClient(*b.addr), WireKafkaClient(*b.addr)
        c1 = GroupConsumer(cl1, "g1", ["carga"])
        c2 = GroupConsumer(cl2, "g1", ["carga"])
        try:
            assert admin.describe_group("nope")["state"] == "Dead"
            t1 = threading.Thread(target=c1.join)
            t2 = threading.Thread(target=c2.join)
            t1.start(), t2.start()
            t1.join(timeout=10), t2.join(timeout=10)

            assert admin.list_groups() == [("g1", "consumer")]
            desc = admin.describe_group("g1")
            assert desc["state"] == "Stable"
            assert desc["protocol_type"] == "consumer"
            assert desc["protocol"] == "range"
            assert len(desc["members"]) == 2
            member_ids = {m["member_id"] for m in desc["members"]}
            assert member_ids == {c1.member_id, c2.member_id}
            # every member's ASSIGNMENT bytes decode to its live slice
            from teste_carga_avro_vs_json_spark.sources.kafka_wire import (
                decode_member_assignment,
            )

            by_id = {m["member_id"]: m for m in desc["members"]}
            for c in (c1, c2):
                got = decode_member_assignment(
                    by_id[c.member_id]["assignment"]
                )
                assert got == {
                    t: sorted(ps) for t, ps in c.assignment.items()
                }
                assert by_id[c.member_id]["metadata"]  # subscription rides

            c1.close()
            c2.close()
            desc2 = admin.describe_group("g1")
            assert desc2["state"] == "Empty"
            assert desc2["members"] == []
            assert admin.list_groups() == [("g1", "consumer")]
        finally:
            for cl in (admin, cl1, cl2):
                cl.close()


# ------------------------------------------------- KIP-345 static membership
def test_static_member_rejoins_without_rebalance():
    """KIP-345 (r11): a static member (group.instance.id) that drops
    and rejoins within its session timeout re-acquires its previous
    assignment at the CURRENT generation — no rebalance, no generation
    bump, and the other member's heartbeat never sees err 27. A
    genuinely NEW member still triggers the full rebalance."""
    with StubBroker(num_partitions=4, initial_rebalance_delay_ms=400) as b:
        cl1, cl2 = WireKafkaClient(*b.addr), WireKafkaClient(*b.addr)
        c1 = GroupConsumer(
            cl1, "g1", ["carga"], instance_id="pod-0",
            session_timeout_ms=8_000,
        )
        c2 = GroupConsumer(
            cl2, "g1", ["carga"], instance_id="pod-1",
            session_timeout_ms=8_000,
        )
        try:
            t1 = threading.Thread(target=c1.join)
            t2 = threading.Thread(target=c2.join)
            t1.start(), t2.start()
            t1.join(timeout=10), t2.join(timeout=10)
            assert not t1.is_alive() and not t2.is_alive()
            gen0 = c1.generation
            assert gen0 == c2.generation
            old_assignment = dict(c2.assignment)
            assert len(old_assignment.get("carga", [])) == 2

            # c2 "restarts": close() skips LeaveGroup for static
            # members, a fresh consumer presents the same instance id
            c2.close()
            cl2.close()
            cl2b = WireKafkaClient(*b.addr)
            c2b = GroupConsumer(
                cl2b, "g1", ["carga"], instance_id="pod-1",
                session_timeout_ms=8_000,
            )
            c2b.join()  # returns immediately: no rebalance round
            assert c2b.generation == gen0  # NO generation bump
            assert c2b.assignment == old_assignment  # same partitions
            # the survivor's heartbeat stays quiet (no err 27)
            c1.poll()
            assert c1.rebalances == 0

            # both members still function: commits are fence-accepted
            c2b.commit()

            # a NEW instance id = a real join: full rebalance fires
            cl3 = WireKafkaClient(*b.addr)
            c3 = GroupConsumer(
                cl3, "g1", ["carga"], instance_id="pod-2",
                session_timeout_ms=8_000,
            )
            res: dict = {}
            t3 = threading.Thread(target=lambda: res.update(a=c3.join()))
            t3.start()

            # joins BLOCK server-side until every member rejoined —
            # drive the two survivors from their own threads (the
            # documented concurrent-member rule; sequential polls
            # would deadlock against each other's rejoin)
            def pump(consumer):
                deadline = time.monotonic() + 10.0
                while consumer.rebalances == 0:
                    consumer.poll()
                    if time.monotonic() > deadline:
                        return
                    time.sleep(0.05)

            p1 = threading.Thread(target=pump, args=(c1,))
            p2 = threading.Thread(target=pump, args=(c2b,))
            p1.start(), p2.start()
            p1.join(timeout=15), p2.join(timeout=15)
            t3.join(timeout=10)
            assert not t3.is_alive()
            assert c1.rebalances >= 1 and c2b.rebalances >= 1
            assert c3.generation == c1.generation > gen0
            owned = sorted(
                c1.assignment.get("carga", [])
                + c2b.assignment.get("carga", [])
                + c3.assignment.get("carga", [])
            )
            assert owned == [0, 1, 2, 3]
            c3.close()
            cl3.close()
            c2b.close()
            cl2b.close()
        finally:
            c1.close()
            cl1.close()


def test_static_rejoin_after_subscription_change_rebalances():
    """The no-rebalance path requires an UNCHANGED subscription: a
    static rejoin with different topics goes through the full join
    (real-coordinator behavior — the assignment may no longer fit)."""
    with StubBroker(num_partitions=2, initial_rebalance_delay_ms=50) as b:
        cl = WireKafkaClient(*b.addr)
        try:
            r = cl.join_group("g1", ["carga"], instance_id="pod-0")
            cl.sync_group(
                "g1", r["generation"], r["member_id"],
                {r["member_id"]: {"carga": [0, 1]}},
            )
            gen0 = r["generation"]
            # same instance id, different subscription -> new rebalance
            r2 = cl.join_group(
                "g1", ["carga", "extra"], instance_id="pod-0"
            )
            assert r2["generation"] == gen0 + 1
            # identity was preserved (rebound, not duplicated)
            assert r2["member_id"] == r["member_id"]
            assert len(r2["members"]) == 1
        finally:
            cl.close()
