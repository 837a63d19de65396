"""Rebalance churn soak: the coordinator's hardest shape at volume.

A producer feeds a P-partition topic continuously while N consumer
threads in ONE group CHURN — each runs (join → poll+commit → leave)
cycles, so the group rebalances constantly across many generations.
The invariants under test:

- **no loss**: every produced record is consumed by SOMEONE (re-seek
  to committed offsets on every reassignment picks up where the
  previous owner committed);
- **exactly-once by commit frontier**: records are deduplicated on
  (partition, offset) — at-least-once across handoffs is expected,
  but the DUPLICATE RATE stays proportional to churn (only
  consumed-but-not-yet-committed tails replay), never to volume;
- **fencing holds**: commits from stale generations raise instead of
  clobbering (counted);
- **liveness**: generations advance (churn really rebalances) and the
  run drains to the produced total.

Usage: python tools/stress_rebalance.py [n_records] [n_consumers] [cycles]
Emits one JSON line (commit to bench_runs/r{N}_stress_rebalance.json).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from teste_carga_avro_vs_json_spark.sources.kafka_group import GroupConsumer
from teste_carga_avro_vs_json_spark.sources.kafka_wire import (
    GroupCoordinatorError,
    StubBroker,
    WireKafkaClient,
)

TOPIC = "churn"
GROUP = "grupo-churn-1"


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    n_consumers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    parts = 6
    out = {
        "n_records": n_records,
        "n_consumers": n_consumers,
        "cycles": cycles,
        "partitions": parts,
    }
    seen: dict[tuple[int, int], bytes] = {}
    dup_events = 0
    fenced_commits = 0
    lock = threading.Lock()
    done_producing = threading.Event()
    t_start = time.perf_counter()

    with StubBroker(
        num_partitions=parts, initial_rebalance_delay_ms=100
    ) as broker:

        def producer() -> None:
            # paced so the stream OUTLIVES several join/leave cycles —
            # the churn must overlap live consumption
            c = WireKafkaClient(*broker.addr)
            try:
                batch_sz = 500
                n_batches = max(1, -(-n_records // batch_sz))
                pace = (cycles * 1.2) / n_batches
                for base in range(0, n_records, batch_sz):
                    p = (base // batch_sz) % parts
                    c.produce(
                        TOPIC, p,
                        [(f"k{base + i}".encode(),
                          f"v{base + i}".encode())
                         for i in range(min(batch_sz, n_records - base))],
                    )
                    time.sleep(pace)
                done_producing.set()
            finally:
                c.close()

        def consumer(tid: int) -> None:
            nonlocal dup_events, fenced_commits
            cl = WireKafkaClient(*broker.addr)
            try:
                for _cycle in range(cycles):
                    gc = GroupConsumer(
                        cl, GROUP, [TOPIC], session_timeout_ms=10_000
                    )
                    gc.join()
                    deadline = time.perf_counter() + 1.0
                    while time.perf_counter() < deadline:
                        recs = gc.poll()
                        with lock:
                            for _t, p, off, _k, v in recs:
                                if (p, off) in seen:
                                    dup_events += 1
                                seen[(p, off)] = v
                        try:
                            gc.commit()
                        except GroupCoordinatorError:
                            fenced_commits += 1  # stale gen: rejected
                        if not recs:
                            time.sleep(0.01)
                    gc.close()  # leave: survivors rebalance
            finally:
                cl.close()

        threads = [threading.Thread(target=producer)]
        threads += [
            threading.Thread(target=consumer, args=(i,))
            for i in range(n_consumers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        # sweep any tail left when every consumer exhausted its cycles
        sweeper = WireKafkaClient(*broker.addr)
        try:
            gc = GroupConsumer(sweeper, GROUP, [TOPIC])
            gc.join()
            for _ in range(200):
                recs = gc.poll()
                with lock:
                    for _t, p, off, _k, v in recs:
                        if (p, off) in seen:
                            dup_events += 1
                        seen[(p, off)] = v
                    if len(seen) >= n_records:
                        break
                if not recs:
                    time.sleep(0.01)
            gc.commit()
            gc.close()
            generations = None
            g = broker._groups.get(GROUP)
            if g is not None:
                generations = g.generation
        finally:
            sweeper.close()

    out["wall_sec"] = round(time.perf_counter() - t_start, 2)
    out["records_seen"] = len(seen)
    out["no_loss"] = len(seen) == n_records
    out["values_exact"] = all(
        v == f"v{i}".encode()
        for i, v in enumerate(
            v for (_p, _o), v in sorted(
                seen.items(),
                key=lambda kv: int(kv[1][1:]),
            )
        )
    )
    out["dup_events"] = dup_events
    out["dup_rate"] = round(dup_events / max(1, n_records), 4)
    out["fenced_commits"] = fenced_commits
    out["generations"] = generations
    out["churned"] = (generations or 0) >= n_consumers * 2
    out["exact"] = bool(
        out["no_loss"] and out["values_exact"] and out["churned"]
    )
    try:
        out["loadavg_1m"] = round(os.getloadavg()[0], 1)
    except OSError:
        pass
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
