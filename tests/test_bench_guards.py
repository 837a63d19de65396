"""bench.py self-defense instruments (no Spark session needed).

The official per-round artifact must be trustworthy on its own: the
pre-run quiet gate + run-window steal stamp catch CPU contention, and
the r11 floor-deviation tripwire catches channels the CPU stamps
cannot see (BENCH_r10: steal 0.03% stamped quiet while the two
disk-bound file-roundtrip lanes sat at 2-2.7x their frozen floors).
Thresholds are pinned against the committed r10 run spread."""

import json
import os

import bench

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _deltas_vs_baseline(queries: dict) -> dict:
    with open(os.path.join(_REPO, "BENCH_BASELINE.json")) as f:
        base = json.load(f)["queries"]
    return {
        n: round(100.0 * (t - base[n]) / base[n], 1)
        for n, t in queries.items()
        if n in base
    }


def test_tripwire_quiet_runs_do_not_trip():
    """The three committed quiet r10 runs (steal 0.05-0.39%) must sit
    UNDER the tripwire — zero lanes >40% over floor."""
    for name in ("r10_run1", "r10_run2", "r10_run3"):
        with open(os.path.join(_REPO, "bench_runs", f"{name}.json")) as f:
            run = json.loads(f.readline())
        n, reason = bench._floor_tripwire(
            _deltas_vs_baseline(run["queries"])
        )
        assert n == 0 and reason is None, (name, n, reason)


def test_tripwire_catches_the_damaged_official_r10_capture():
    """BENCH_r10.json passed the steal stamp; the tripwire must flag
    it (file_avro +173%, file_json +102%, intra_doc_dedup +73%,
    cosine_topk +57% vs frozen floors)."""
    with open(os.path.join(_REPO, "BENCH_r10.json")) as f:
        wrapped = json.load(f)
    queries = wrapped["parsed"]["queries"]
    n, reason = bench._floor_tripwire(_deltas_vs_baseline(queries))
    assert n >= 3 and reason is not None
    assert "file_avro" in reason


def test_tripwire_catches_every_committed_damaged_r10_run():
    for name in (
        "r10_run4_contended",
        "r10_run5",
        "r10_run6_contended",
        "r10_run7_noisy_avro",
        "r10_run8_steal",
        "r10_run9_steal",
        "r10_run10_contended_stamped",
    ):
        with open(os.path.join(_REPO, "bench_runs", f"{name}.json")) as f:
            run = json.loads(f.readline())
        n, reason = bench._floor_tripwire(
            _deltas_vs_baseline(run["queries"])
        )
        assert reason is not None, (name, n)


def test_tripwire_alias_lane_never_double_counts():
    """avro_e2e_arrow aliases avro_e2e: a single inflated codec lane
    must count ONCE (two synthetic deviations stay under min_lanes=3)."""
    n, reason = bench._floor_tripwire(
        {"avro_e2e": 900.0, "avro_e2e_arrow": 900.0, "json_e2e": 50.0}
    )
    assert n == 2 and reason is None


def test_io_probe_returns_a_time():
    ms = bench._io_probe_ms(size_mb=4)
    assert ms is None or ms > 0


def _mk_run(tmp, name, head, queries, lane_steal, sf=0.1, cpus=32,
            reps=5, dirty=False, compact=False):
    run = {
        "metric": "headline_total_sec",
        "queries": queries,
        "lane_steal_pct": lane_steal,
        "sf": sf,
        "cpus": cpus,
        "reps": reps,
        "git_head": head,
        "git_dirty": dirty,
    }
    if compact:
        run["compact"] = True
    with open(os.path.join(tmp, name), "w") as f:
        f.write(json.dumps(run) + "\n")
    return run


def test_composite_takes_per_lane_best_of_same_code_runs(tmp_path):
    """r13 (VERDICT order #4): the composite merges per-lane bests
    across runs with the SAME git identity, stamps each lane with the
    steal of its winning window, and is contended only when a WINNING
    window was dirty."""
    tmp = str(tmp_path)
    _mk_run(tmp, "r1.json", "abc", {"a": 2.0, "b": 1.0}, {"a": 0.1, "b": 0.9})
    _mk_run(tmp, "r2.json", "abc", {"a": 1.5, "b": 3.0}, {"a": 0.2, "b": 0.1})
    # different code / dirty tree / compact lines never fold in
    _mk_run(tmp, "other.json", "zzz", {"a": 0.1, "b": 0.1}, {"a": 0, "b": 0})
    _mk_run(tmp, "dirty.json", "abc", {"a": 0.1, "b": 0.1},
            {"a": 0, "b": 0}, dirty=True)
    _mk_run(tmp, "compact.json", "abc", {"a": 0.1, "b": 0.1},
            {"a": 0, "b": 0}, compact=True)
    out = {
        "git_head": "abc", "git_dirty": False, "sf": 0.1, "cpus": 32,
        "reps": 5, "queries": {"a": 1.8, "b": 0.8},
        "lane_steal_pct": {"a": 0.0, "b": 0.5},
    }
    comp = bench._composite_best_of_runs(out, set(), tmp, 3)
    assert comp["n_runs"] == 3  # this run + r1 + r2
    assert comp["queries"] == {"a": 1.5, "b": 0.8}
    assert comp["lane_source"]["a"] == "r2.json"
    assert comp["lane_source"]["b"] == "<this run>"
    # b's winning window was dirty (0.5 > 0.4) -> composite contended
    assert comp["dirty_lanes"] == ["b"]
    assert comp["contended_fallback"] is True
    assert comp["headline_total_sec"] == 2.3

    # all winning windows clean -> non-contended composite
    _mk_run(tmp, "r3.json", "abc", {"a": 1.4, "b": 0.7}, {"a": 0.3, "b": 0.2})
    comp2 = bench._composite_best_of_runs(out, set(), tmp, 3)
    assert comp2["queries"] == {"a": 1.4, "b": 0.7}
    assert comp2["dirty_lanes"] == []
    assert comp2["contended_fallback"] is False


def test_composite_requires_min_same_identity_runs(tmp_path):
    tmp = str(tmp_path)
    _mk_run(tmp, "r1.json", "abc", {"a": 2.0}, {"a": 0.1})
    out = {
        "git_head": "abc", "git_dirty": False, "sf": 0.1, "cpus": 32,
        "reps": 5, "queries": {"a": 1.8}, "lane_steal_pct": {"a": 0.0},
    }
    assert bench._composite_best_of_runs(out, set(), tmp, 3) is None
    # a dirty CURRENT tree never composes (code identity unprovable)
    out_dirty = dict(out, git_dirty=True)
    _mk_run(tmp, "r2.json", "abc", {"a": 2.0}, {"a": 0.1})
    assert bench._composite_best_of_runs(out_dirty, set(), tmp, 3) is None
