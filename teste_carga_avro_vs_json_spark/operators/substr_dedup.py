"""Exact-substring deduplication — remove globally duplicated token
spans from every document (SURVEY.md §2.3 extension surface; the
reference engine has no corpus operators).

The ExactSubstr recipe of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (arXiv:2107.06499): any run of >= L
consecutive tokens that occurs more than once in the corpus is removed
from the training text (the paper uses a suffix array and L = 50 BPE
tokens).  A suffix array is inherently sequential; the distributed
re-expression below is the standard L-gram formulation and finds the
IDENTICAL covered-token set: a token is covered by some duplicated
run of length >= L  iff  it is covered by some duplicated L-gram
(every length->=L duplicated run contains only duplicated L-grams and
every duplicated L-gram is itself a duplicated run).

Plan shape (what must survive 100 TB):

- Tokenization and L-gram construction are ROW-LOCAL (`word_kgrams`
  zip_with chain over a STAGED token array — O(L) array ops per row,
  tokenizer runs once per row).
- Duplicate detection is ONE hash aggregation on the gram key with
  map-side partial agg (`groupBy(gkey).count()`), which absorbs
  hot-gram skew where a window-over-gram would sort every copy of a
  viral passage into one partition.  The duplicated-gram set then
  drives a LEFT SEMI join back over the (gkey, doc_id, pos) stream —
  ids-first: the document text never rides either shuffle.
- ``scale=True`` replaces gram STRINGS with 8-byte ``xxhash64`` keys
  before both shuffles (an L=20-word gram is ~100+ bytes; at corpus
  scale the gram bytes dominate both exchanges).  Not
  DuckDB-expressible — pytest pins agreement with the string path,
  same convention as ``dedup.exact_dedup_scale``.
- Per-doc span assembly is row-local again: sorted start positions
  fold into merged [s, e] intervals with one ``aggregate`` pass
  (O(starts) per row), and the rebuild filter tests membership against
  MERGED spans (few) rather than raw starts (many).  Both arrays are
  staged behind projections first — expressions captured inside HOF
  lambdas re-evaluate per element (CLAUDE.md scale rules).
- Zero-span docs survive via the final LEFT join from the token frame
  (fetch-after-dedup: the heavy agg side carries only doc_id + starts).

Contract: ``clean_text`` is the uncovered tokens joined with single
spaces — i.e. whitespace-normalized, exactly like the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators.text import (
    tokens,
    tokens_sql,
    word_kgrams,
    word_kgrams_sx,
)


def _gram_key(gram: Column, scale: bool) -> Column:
    # Null-safe like decontam._gram_key: xxhash64 of NULL returns the
    # bare seed (a real 64-bit value), so hash only non-null grams.
    if not scale:
        return gram
    return F.when(gram.isNotNull(), F.xxhash64(gram))


def exact_substring_spans(
    docs: DataFrame,
    min_len: int = 20,
    scale: bool = False,
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Per-document duplicated-span stats + cleaned text.

    A position is *covered* when some word ``min_len``-gram starting at
    or crossing it occurs >= 2 times in the whole corpus (within- or
    cross-document).  Returns one row per input document:

    (doc_id, n_tokens, n_spans, n_dup_tokens, clean_text) — the maximal
    merged covered spans count, total covered tokens, and the text with
    covered tokens removed (single-space joined).

    ``token_col``: operate on a PRE-TOKENIZED ``array<string>`` column
    instead of whitespace-tokenizing ``text_col`` — the published
    recipe runs on BPE tokens with L=50 (Lee et al. §4.1:
    ``bpe.bpe_tokenize`` → this, see the chain pytest pin), and any
    external tokenization plugs in the same way.  Identical plan (the
    tokenizer is the only change, and it is row-local either way); the
    output additionally carries ``clean_tokens`` (the uncovered tokens
    as an array — space-joining BPE subwords is lossy, so the array is
    the faithful artifact; ``clean_text`` stays the space-joined form
    for contract parity).  On a whitespace-pretokenized corpus the two
    paths agree exactly (pytest-pinned).
    """
    L = int(min_len)
    if token_col is None:
        toks = docs.select("doc_id", tokens(text_col).alias("toks"))
    else:
        toks = docs.select(
            "doc_id",
            F.coalesce(
                F.col(token_col), F.array().cast("array<string>")
            ).alias("toks"),
        )
    # (gkey, doc_id, pos): one row per L-gram occurrence.  posexplode
    # (0-based pos) over the staged gram array; _outer so short docs
    # don't invite an InferFiltersFromGenerate size() re-shingle below
    # the Generate (plans.expensive_filter_nodes).
    occ = (
        toks.select(
            "doc_id", F.expr(word_kgrams_sx("toks", L)).alias("grams")
        )
        .select("doc_id", F.posexplode_outer("grams").alias("pos", "gram"))
        .select(
            "doc_id", "pos", _gram_key(F.col("gram"), scale).alias("gkey")
        )
    )
    # Hash agg with map-side combine; hot grams never pile into one
    # sort the way a count-over-window would.
    dup = (
        occ.groupBy("gkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("cnt") >= 2) & F.col("gkey").isNotNull())
        .select("gkey")
    )
    starts = (
        occ.join(dup, "gkey", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    # Fetch-after-dedup: rejoin the token arrays only now, on doc_id.
    # Sorted starts fold: extend the last interval while the next start
    # is <= last_e + 1 (overlap or adjacency), else open a new one.
    # Ends are monotone (e = s + L - 1 with s ascending), so extending
    # = rewriting last_e to s + L - 1. Parsed fragments (r13-opt, see
    # text.tokens_sx): identical expressions, one py4j parse each.
    new_span = f"array(named_struct('s', s, 'e', s + {L} - 1))"
    fold = (
        "aggregate(starts, "
        "CAST(array() AS ARRAY<STRUCT<s: INT, e: INT>>), "
        "(acc, s) -> CASE WHEN (size(acc) > 0) "
        "AND (s <= element_at(acc, -1).e + 1) THEN "
        "concat(slice(acc, 1, size(acc) - 1), "
        f"array(named_struct('s', element_at(acc, -1).s, "
        f"'e', s + {L} - 1))) "
        f"ELSE concat(acc, {new_span}) END)"
    )
    merged = (
        toks.join(starts, "doc_id", "left")
        .select(
            "doc_id",
            "toks",
            F.expr(
                "coalesce(starts, CAST(array() AS ARRAY<INT>))"
            ).alias("starts"),
        )
        .select("doc_id", "toks", F.expr(fold).alias("spans"))
    )
    # filter's two-arg lambda exposes the element index (0-based,
    # matching posexplode's pos); membership is tested against the
    # MERGED spans so the rebuild is O(n_tokens * n_spans).
    keep = (
        "filter(toks, (t, i) -> NOT exists(spans, "
        "sp -> (sp.s <= i) AND (i <= sp.e)))"
    )
    cols = [
        F.col("doc_id"),
        F.expr("CAST(size(toks) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(size(spans) AS BIGINT)").alias("n_spans"),
        F.expr(
            "aggregate(spans, CAST(0 AS BIGINT), "
            "(acc, sp) -> acc + CAST(sp.e - sp.s + 1 AS BIGINT))"
        ).alias("n_dup_tokens"),
        F.expr(f"concat_ws(' ', {keep})").alias("clean_text"),
    ]
    if token_col is not None:
        cols.append(F.expr(keep).alias("clean_tokens"))
    return merged.select(*cols)


def exact_substring_spans_sql(
    table: str = "documents", min_len: int = 20
) -> str:
    """DuckDB twin of :func:`exact_substring_spans` (string-key path).

    Same tokenizer, 0-based positions, LAG-based gaps-and-islands for
    the span merge (merge when s <= prev_s + L, i.e. s <= prev_e + 1),
    and an uncovered-token rebuild via LEFT JOIN + IS NULL.
    """
    L = int(min_len)
    t = tokens_sql("text")
    return f"""
        WITH toks AS (
            SELECT doc_id, {t} AS toks FROM {table}
        ),
        grams AS (
            SELECT doc_id,
                   unnest(generate_series(1, GREATEST(len(toks) - {L - 1}, 0)))
                       AS i
            FROM toks
        ),
        occ AS (
            SELECT g.doc_id, g.i - 1 AS pos,
                   array_to_string(t.toks[g.i:g.i + {L - 1}], ' ') AS gram
            FROM grams g JOIN toks t USING (doc_id)
        ),
        dup AS (
            SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2
        ),
        starts AS (
            SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (gram)
        ),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos <= LAG(pos) OVER w + {L} THEN 0 ELSE 1 END
                       AS is_new
            FROM starts
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        isl AS (
            SELECT doc_id, pos,
                   SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS gid
            FROM brk
        ),
        spans AS (
            SELECT doc_id, gid, MIN(pos) AS s, MAX(pos) + {L - 1} AS e
            FROM isl GROUP BY doc_id, gid
        ),
        spanagg AS (
            SELECT doc_id, COUNT(*)::BIGINT AS n_spans,
                   SUM(e - s + 1)::BIGINT AS n_dup_tokens
            FROM spans GROUP BY doc_id
        ),
        tokpos AS (
            SELECT doc_id, unnest(generate_series(1, len(toks))) AS i
            FROM toks
        ),
        clean AS (
            SELECT tp.doc_id,
                   string_agg(t.toks[tp.i], ' ' ORDER BY tp.i)
                       AS clean_text
            FROM tokpos tp
            JOIN toks t USING (doc_id)
            LEFT JOIN spans sp
              ON tp.doc_id = sp.doc_id
             AND tp.i - 1 BETWEEN sp.s AND sp.e
            WHERE sp.s IS NULL
            GROUP BY tp.doc_id
        )
        SELECT t.doc_id,
               len(t.toks)::BIGINT AS n_tokens,
               COALESCE(sa.n_spans, 0)::BIGINT AS n_spans,
               COALESCE(sa.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
               COALESCE(c.clean_text, '') AS clean_text
        FROM toks t
        LEFT JOIN spanagg sa USING (doc_id)
        LEFT JOIN clean c USING (doc_id)
    """
