"""Opportunistic quiet-window bench capture (r12 order #1).

All five r11 one-shot capture attempts hit host contention (steal
0.66-3.4%, io_probe post up to 4.5 s). Instead of firing the bench once
at session end, this loop probes the host on a schedule (loadavg_1m,
2-s steal window, 32 MiB io_probe) and fires the FULL ``bench.py`` the
first time the window reads quiet:

    loadavg_1m <= 3.0  AND  steal_pct <= 0.4  AND  io_probe_ms <= 400

Every probe sample is appended to ``bench_runs/{PREFIX}_probe_samples.jsonl``
so that, if the host never goes quiet, the committed sample trail IS the
evidence (the verdict asked for >=6 samples across the session in that
case). Each fired bench's full stdout is saved to
``bench_runs/{PREFIX}_run<N>.json`` (SPARK_GRAFT_BENCH_PREFIX, default r13); the loop stops after ``--max-quiet``
captures whose compact line stamps ``contended_fallback: false``.

Run detached:  python tools/bench_probe_loop.py &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREFIX = os.environ.get("SPARK_GRAFT_BENCH_PREFIX", "r13")
SAMPLES = os.path.join(
    REPO, "bench_runs", f"{PREFIX}_probe_samples.jsonl"
)

sys.path.insert(0, REPO)
import bench  # noqa: E402  (the probe primitives live there)

LOAD_CAP = 3.0
STEAL_CAP = 0.4
IO_CAP_MS = 400.0
PROBE_EVERY_SEC = 120.0
COOLDOWN_AFTER_CONTENDED_SEC = 300.0


def _own_work_running() -> bool:
    """The r12_run1 lesson: the pre-gate (loadavg + steal + io) passed
    at 15:27 while a local pytest session's local[32] JVM was SPINNING
    UP — loadavg_1m lags ~a minute behind a burst, so the bench fired
    into self-inflicted contention (19 lanes over floor, honest stamp).
    Never fire while the dev session itself has Spark-shaped work
    alive."""
    try:
        out = subprocess.run(
            ["pgrep", "-af",
             "pytest|check_correctness|check_retired|stress_|SparkSubmit"],
            capture_output=True, text=True, timeout=10,
        ).stdout
    except Exception:
        return False
    me = str(os.getpid())
    lines = [
        ln for ln in out.strip().splitlines()
        if ln and not ln.startswith(me + " ")
        and "bench_probe_loop" not in ln
        and "pgrep" not in ln
    ]
    return bool(lines)


def probe() -> dict:
    load = float(open("/proc/loadavg").read().split()[0])
    steal = bench._steal_pct_window(2.0)
    io_ms = bench._io_probe_ms()
    cpu_ms = getattr(bench, "_cpu_probe_ms", lambda: None)()
    own = _own_work_running()
    s = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "loadavg_1m": load,
        "steal_pct": None if steal is None else round(steal, 3),
        "io_probe_ms": io_ms,
        "cpu_probe_ms": cpu_ms,
        "own_work": own,
    }
    # r12 lane-gating update: bench.py now gates STEAL per lane
    # internally (waits for a quiet second before each lane's reps),
    # so the loop only needs to avoid firing into our own work or a
    # disk-channel storm — a fluttering steal% no longer blocks fires.
    s["quiet"] = (
        not own
        and load <= LOAD_CAP
        and (io_ms is None or io_ms <= IO_CAP_MS)
    )
    s["steal_quiet"] = steal is None or steal <= STEAL_CAP
    return s


def record(sample: dict) -> None:
    os.makedirs(os.path.dirname(SAMPLES), exist_ok=True)
    with open(SAMPLES, "a") as f:
        f.write(json.dumps(sample) + "\n")


def next_run_path() -> str:
    n = 1
    while os.path.exists(
        os.path.join(REPO, "bench_runs", f"{PREFIX}_run{n}.json")
    ):
        n += 1
    return os.path.join(REPO, "bench_runs", f"{PREFIX}_run{n}.json")


def fire_bench() -> dict:
    """Run the full bench; return the parsed compact (last) JSON line."""
    env = dict(os.environ)
    # The loop is the retry mechanism; don't double-run inside bench.
    env["SPARK_GRAFT_BENCH_RETRY"] = "0"
    # lane-gated instrument: let dirty lanes outlast minute-scale
    # bursts (only they pay; clean lanes run once)
    env.setdefault("SPARK_GRAFT_BENCH_LANE_RETRIES", "3")
    path = next_run_path()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    with open(path, "w") as f:
        f.write(proc.stdout)
    compact: dict = {}
    for line in proc.stdout.strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                compact = json.loads(line)
            except json.JSONDecodeError:
                pass
    return {
        "run_path": os.path.relpath(path, REPO),
        "rc": proc.returncode,
        "wall_sec": round(time.time() - t0, 1),
        "contended_fallback": compact.get("contended_fallback"),
        "floor_deviation_lanes": compact.get("floor_deviation_lanes"),
        "steal_pct": compact.get("steal_pct"),
        "io_probe_ms": compact.get("io_probe_ms"),
        "headline_total_sec": compact.get("value"),
    }


def main() -> None:
    max_quiet = 3
    for i, a in enumerate(sys.argv):
        if a == "--max-quiet" and i + 1 < len(sys.argv):
            max_quiet = int(sys.argv[i + 1])
    quiet_captures = 0
    while quiet_captures < max_quiet:
        s = probe()
        if s["quiet"]:
            # loadavg lags bursts ~a minute: demand a SECOND quiet
            # reading before committing the 10-minute capture
            record(s)
            time.sleep(45.0)
            s = probe()
            if not s["quiet"]:
                record(s)
                time.sleep(PROBE_EVERY_SEC)
                continue
            s["action"] = "fire_bench"
            record(s)
            result = fire_bench()
            result["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            result["event"] = "bench_run"
            record(result)
            if result.get("contended_fallback") is False:
                quiet_captures += 1
                if quiet_captures >= max_quiet:
                    break
            # Either way the bench itself just loaded the box — cool down.
            time.sleep(COOLDOWN_AFTER_CONTENDED_SEC)
        else:
            record(s)
            time.sleep(PROBE_EVERY_SEC)
    record({"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "event": "done", "quiet_captures": quiet_captures})


if __name__ == "__main__":
    main()
