"""One-call training-corpus builder — the published web-corpus recipe
(C4 → CCNet → RefinedWeb lineage) composed from this repo's operators
into a single auditable pipeline:

    normalize → C4 line cleaning → blocklist → heuristic quality →
    perplexity quantile gate → exact dedup → MinHash near-dedup →
    ExactSubstr span cleaning → n-gram decontamination → sequence
    packing

Every stage is one of the individually oracle-/pytest-pinned
operators; this module adds only composition, per-stage accounting,
and the no-silent-caps ledger (rows in/out + wall per stage — a
corpus build that can't say where documents died is undebuggable at
100 TB).

Engine shape: stages communicate through (doc_id, text) frames.
``measure=True`` (the report mode) materializes each stage once to
count rows — the honest way to get a ledger, costing one action per
stage. ``measure=False`` defers everything to the final action (stage
boundaries stay lazy checkpoints). Either way every stage boundary
TRUNCATES LINEAGE — see _Ledger for why that is load-bearing.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import (
    corpus,
    decontam,
    dedup,
    lm,
    substr_dedup,
    text as text_ops,
)


class _Ledger:
    """Per-stage accounting with LINEAGE-TRUNCATING stage boundaries:
    every stage output is ``localCheckpoint``ed (eager in measure
    mode, lazy otherwise), so downstream operators see a leaf instead
    of the whole composed plan. This is not an optimization nicety —
    it is the difference between the pipeline working and not:
    measured on sf0.1, the SAME neardup stage costs 3.4 s behind a
    checkpoint boundary and 51 s behind five nested cached joins
    (Catalyst/AQE re-planning grows ~3-4x per extra join in the
    lineage of a composite operator; see SCALE.md). On a real cluster
    prefer ``checkpoint`` to a DFS dir for fault tolerance — same
    note as the label-propagation loop in dedup.neardup_clusters."""

    def __init__(self, measure: bool) -> None:
        self.measure = measure
        self.stats: list[dict] = []

    def stage(self, name: str, frame: DataFrame, t0: float) -> DataFrame:
        frame = frame.localCheckpoint(eager=self.measure)
        if not self.measure:
            self.stats.append({"stage": name, "rows": None, "sec": None})
            return frame
        n = frame.count()
        prev_rows = next(
            (s["rows"] for s in reversed(self.stats)
             if s.get("rows") is not None),
            None,
        )
        rec = {
            "stage": name,
            "rows": n,
            "sec": round(time.perf_counter() - t0, 2),
        }
        if prev_rows is not None and name != "pack_sequences":
            rec["dropped"] = prev_rows - n
            # no-silent-caps: a stage erasing (almost) the whole corpus
            # is usually a domain-mismatched gate, not a clean corpus —
            # say so in the ledger instead of letting zeros flow on
            if prev_rows > 0 and n <= prev_rows * 0.05:
                rec["warn"] = "stage dropped >95% of the corpus"
        self.stats.append(rec)
        return frame

    def skip(self, name: str, reason: str) -> None:
        self.stats.append(
            {"stage": name, "rows": None, "sec": None, "skipped": reason}
        )


def build_training_corpus(
    docs: DataFrame,
    test: DataFrame | None = None,
    *,
    seq_len: int = 1024,
    keep_frac: float = 0.7,
    min_quality: float = 0.0,
    exact_substr_min_len: int = 20,
    line_filter: bool = True,
    measure: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """(doc_id, text) corpus → (packed-sequence plan, stage ledger).

    ``test`` (optional) is the benchmark/eval set to decontaminate
    against — omitted, the stage is skipped (recorded in the ledger
    as such, never silently). Returns :func:`corpus.pack_sequences`'s
    packing plan over the surviving cleaned text plus the per-stage
    ledger [{stage, rows, sec}, ...]."""
    led = _Ledger(measure)
    cur = _clean_stages(
        docs,
        test,
        led,
        keep_frac=keep_frac,
        min_quality=min_quality,
        exact_substr_min_len=exact_substr_min_len,
        line_filter=line_filter,
    )

    # 10. Sequence packing (the training-ready plan)
    t0 = time.perf_counter()
    packed = corpus.pack_sequences(cur, seq_len=seq_len)
    packed = led.stage("pack_sequences", packed, t0)
    return packed, led.stats


def _clean_stages(
    docs: DataFrame,
    test: DataFrame | None,
    led: "_Ledger",
    *,
    keep_frac: float,
    min_quality: float,
    exact_substr_min_len: int,
    line_filter: bool,
) -> DataFrame:
    """Stages 1-9 of the published recipe (everything except packing)
    — shared by :func:`build_training_corpus` and
    :func:`build_corpus_incremental`."""
    t0 = time.perf_counter()
    cur = led.stage("input", docs.select("doc_id", "text"), t0)

    # 1. Unicode normalization (CCNet §3.1 — canonicalize before
    # anything hashes text)
    t0 = time.perf_counter()
    cur = led.stage(
        "normalize",
        text_ops.normalize_text(cur).select(
            "doc_id", F.col("clean_text").alias("text")
        ),
        t0,
    )

    # 2. C4 line cleaning (page drops + line keeps). Parameterized:
    # the recipe presumes PROSE (lines end in terminal punctuation) —
    # on non-prose corpora it erases everything, which the ledger's
    # >95% warning surfaces; callers disable it for such domains.
    if line_filter:
        t0 = time.perf_counter()
        c4 = corpus.c4_line_filter(cur)
        cur = led.stage(
            "c4_line_filter",
            c4.where("keep").select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            t0,
        )
    else:
        led.skip("c4_line_filter", "line_filter=False")

    # 3. Page-level blocklist (C4 §2.2's content gate)
    t0 = time.perf_counter()
    keep_ids = corpus.blocklist_filter(cur).where("keep").select("doc_id")
    cur = led.stage(
        "blocklist",
        cur.join(keep_ids, "doc_id", "left_semi"),
        t0,
    )

    # 4. Heuristic quality floor (cheap pre-filter before the LM gate)
    t0 = time.perf_counter()
    q_ids = (
        text_ops.quality_score(cur)
        .where(F.col("quality") >= F.lit(min_quality))
        .select("doc_id")
    )
    cur = led.stage(
        "quality",
        cur.join(q_ids, "doc_id", "left_semi"),
        t0,
    )

    # 5. Perplexity QUANTILE gate (CCNet's actual recipe — the
    # absolute-threshold mode is the documented footgun)
    t0 = time.perf_counter()
    ppl_ids = (
        lm.perplexity_score(cur, keep_frac=keep_frac)
        .where("keep")
        .select("doc_id")
    )
    cur = led.stage(
        "perplexity",
        cur.join(ppl_ids, "doc_id", "left_semi"),
        t0,
    )

    # 6. Exact dedup (hash-agg keyed on text; min doc_id survives)
    t0 = time.perf_counter()
    survivors = dedup.exact_dedup_scale(cur).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    cur = led.stage(
        "exact_dedup",
        cur.join(survivors, "doc_id", "left_semi"),
        t0,
    )

    # 7. MinHash-LSH near-dedup: clusters only list CLUSTERED docs, so
    # drop the non-canonical cluster members and keep everyone else
    t0 = time.perf_counter()
    losers = (
        dedup.neardup_clusters(cur, scale=True)
        .where(~F.col("is_canonical"))
        .select("doc_id")
    )
    cur = led.stage(
        "neardup",
        cur.join(losers, "doc_id", "left_anti"),
        t0,
    )

    # 8. ExactSubstr span cleaning (Lee et al. — covered spans removed,
    # docs keep their unique remainder)
    t0 = time.perf_counter()
    spans = substr_dedup.exact_substring_spans(
        cur, min_len=exact_substr_min_len, scale=True
    )
    cur = led.stage(
        "exact_substring",
        spans.where(F.length("clean_text") > 0).select(
            "doc_id", F.col("clean_text").alias("text")
        ),
        t0,
    )

    # 9. Benchmark decontamination (skipped loudly when no test set)
    if test is not None:
        t0 = time.perf_counter()
        clean_ids = (
            decontam.decontaminate(cur, test, scale=True)
            .where(~F.col("contaminated"))
            .select("doc_id")
        )
        cur = led.stage(
            "decontaminate",
            cur.join(clean_ids, "doc_id", "left_semi"), t0,
        )
    else:
        led.skip("decontaminate", "no test set supplied")

    return cur


def build_corpus_incremental(
    spark,
    raw_table: str,
    clean_table: str,
    *,
    test: DataFrame | None = None,
    keep_frac: float = 0.7,
    min_quality: float = 0.0,
    exact_substr_min_len: int = 20,
    line_filter: bool = True,
    measure: bool = True,
    bloom_fpp: float = 0.01,
    mode: str = "append",
) -> dict:
    """Incremental corpus maintenance over snapshot tables — the
    mechanism a CONTINUOUSLY-crawled 100 TB corpus actually needs:
    each crawl batch lands in ``raw_table`` via ``snapshot_commit``;
    this builder processes ONLY the files added since the last run
    and appends the cleaned survivors to ``clean_table``, never
    re-reading the processed history.

    Mechanics (each piece is an already-pinned surface):

    - **delta discovery**: the clean table's latest manifest carries
      ``extra.raw_version`` (the high-water raw version processed);
      the delta is the FILE-LIST difference between the raw manifests
      — append-only raw tables yield exactly the new files, and a
      compacted/overwritten raw table degrades safely to a full
      re-scan whose re-emissions the Bloom gate then drops.
    - **cross-history dedup**: a Bloom filter built from the EXISTING
      clean corpus (fixed memory — the Dolma mechanism) gates the
      delta before cleaning; probable-seen docs drop. False positives
      drop genuinely-new docs at the filter's FP rate, so the count
      is REPORTED per run (``n_bloom_dropped`` — no silent caps), and
      the rate is a knob (``bloom_fpp``).
    - **cleaning**: the same stage-1-9 recipe as
      :func:`build_training_corpus` (ledger included) minus packing —
      packing is a training-time view, not corpus state.
    - **commit**: one ``snapshot_commit(mode="append")`` carrying the
      new high-water mark; concurrent writers are safe (CAS publish)
      and a crashed run re-processes its delta idempotently next time
      (the commit IS the state update — exactly-once effect).
    - **update mode** (r10, VERDICT order #4): ``mode="update"``
      commits via :func:`maintenance.snapshot_merge` keyed on
      ``doc_id`` — a RE-CRAWLED doc whose text changed passes the
      Bloom gate (new text) and then REPLACES its stale row
      copy-on-write, instead of accumulating both versions; unchanged
      re-crawls still drop at the gate. A lost merge race raises
      ``SnapshotConflictError``; re-running the builder retries
      idempotently (the high-water mark only advances on commit).

    Returns a report dict: status, raw/clean versions, per-stage
    ledger, delta + bloom-drop counts (+ merge stats in update mode).
    """
    if mode not in ("append", "update"):
        raise ValueError("mode must be append|update")
    from teste_carga_avro_vs_json_spark.operators import (
        maintenance as mt,
    )

    raw_versions = mt.snapshot_versions(raw_table)
    if not raw_versions:
        raise ValueError(f"raw table {raw_table!r} has no committed version")
    raw_latest = raw_versions[-1]

    clean_versions = mt.snapshot_versions(clean_table)
    last_raw = 0
    if clean_versions:
        last_manifest = mt._read_manifest(clean_table, clean_versions[-1])
        last_raw = int(last_manifest.get("extra", {}).get("raw_version", 0))
    if last_raw >= raw_latest:
        return {
            "status": "up_to_date",
            "raw_version": raw_latest,
            "clean_version": clean_versions[-1] if clean_versions else None,
            "n_delta_docs": 0,
        }

    # ---- delta = files in the latest raw manifest not in the last
    # processed one (path identity; raw data files are immutable)
    latest_files = {
        f["path"] for f in mt._read_manifest(raw_table, raw_latest)["files"]
    }
    prev_files: set = set()
    if last_raw and last_raw in raw_versions:
        prev_files = {
            f["path"]
            for f in mt._read_manifest(raw_table, last_raw)["files"]
        }
    delta_paths = [
        f"{raw_table}/{p}" for p in sorted(latest_files - prev_files)
    ]
    if not delta_paths:
        # raw advanced versions without adding files (e.g. vacuum)
        delta = spark.createDataFrame([], "doc_id long, text string")
    else:
        delta = spark.read.parquet(*delta_paths).select("doc_id", "text")

    report: dict = {
        "status": "appended",
        "raw_version": raw_latest,
        "raw_version_prev": last_raw,
        "n_delta_files": len(delta_paths),
    }

    # ---- Bloom gate against the EXISTING clean corpus
    n_delta = delta.count()
    report["n_delta_docs"] = n_delta
    if clean_versions and n_delta:
        existing = mt.snapshot_read(spark, clean_table).select("text")
        bloom = dedup.bloom_build(existing, "text", fpp=bloom_fpp)
        gated = dedup.bloom_dedup(delta, bloom, "text")
        fresh = gated.where(~F.col("probably_seen")).select(
            "doc_id", "text"
        )
        n_fresh = fresh.count()
        report["n_bloom_dropped"] = n_delta - n_fresh
    else:
        fresh = delta
        report["n_bloom_dropped"] = 0

    # ---- the shared cleaning recipe (stages 1-9, no packing)
    led = _Ledger(measure)
    cleaned = _clean_stages(
        fresh,
        test,
        led,
        keep_frac=keep_frac,
        min_quality=min_quality,
        exact_substr_min_len=exact_substr_min_len,
        line_filter=line_filter,
    )

    # ---- one CAS-published commit carrying the new high-water mark
    if mode == "update" and clean_versions:
        res = mt.snapshot_merge(
            cleaned,
            clean_table,
            keys=["doc_id"],
            extra={"raw_version": raw_latest},
        )
        report["status"] = "merged"
        report["clean_version"] = res["version"]
        report["merge"] = res
    else:
        version = mt.snapshot_commit(
            cleaned,
            clean_table,
            mode="append",
            extra={"raw_version": raw_latest},
        )
        report["clean_version"] = version
    report["ledger"] = led.stats
    return report
