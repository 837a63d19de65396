"""ExactSubstr dedup (operators/substr_dedup.py): span construction
goldens, edge cases, scale-twin agreement, and the DuckDB oracle pin."""

import duckdb
import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import substr_dedup
from teste_carga_avro_vs_json_spark.session import load_table


def _run(spark, rows, min_len, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_tokens, r.n_spans, r.n_dup_tokens, r.clean_text)
        for r in substr_dedup.exact_substring_spans(
            df, min_len=min_len, **kw
        ).collect()
    }


def test_cross_doc_spans_merge_overlaps(spark):
    """Two docs share the prefix 'a b c d' -> duplicated 3-grams at
    starts 0 and 1 merge into ONE [0,3] span in each doc."""
    out = _run(
        spark,
        [(1, "a b c d e f"), (2, "a b c d x y")],
        min_len=3,
    )
    assert out == {
        1: (6, 1, 4, "e f"),
        2: (6, 1, 4, "x y"),
    }


def test_whole_doc_duplicate_cleans_to_empty(spark):
    out = _run(spark, [(3, "p q r s"), (4, "p q r s")], min_len=3)
    assert out == {3: (4, 1, 4, ""), 4: (4, 1, 4, "")}


def test_within_doc_repetition_is_covered(spark):
    """ExactSubstr counts WITHIN-doc repeats too: 'm n o' x3 makes every
    3-gram of the doc duplicated, covering the whole doc."""
    out = _run(spark, [(6, "m n o m n o m n o")], min_len=3)
    assert out == {6: (9, 1, 9, "")}


def test_disjoint_spans_stay_separate(spark):
    """Duplicated runs at both ends with a unique middle -> two spans,
    the unique gap survives in clean_text."""
    out = _run(
        spark,
        [(7, "a b c u1 u2 a b c"), (8, "a b c")],
        min_len=3,
    )
    # doc 7: 'a b c' occurs at starts 0 and 5 (plus doc 8) ->
    # spans [0,2] and [5,7]; the other 3-grams are unique.
    assert out[7] == (8, 2, 6, "u1 u2")
    assert out[8] == (3, 1, 3, "")


def test_short_and_empty_docs_pass_through(spark):
    out = _run(
        spark,
        [(9, "z z"), (10, ""), (11, "   ")],
        min_len=3,
    )
    assert out == {
        9: (2, 0, 0, "z z"),
        10: (0, 0, 0, ""),
        11: (0, 0, 0, ""),
    }


def test_clean_text_is_whitespace_normalized(spark):
    out = _run(spark, [(12, "  w1\tw2 \n w3  ")], min_len=3)
    assert out == {12: (3, 0, 0, "w1 w2 w3")}


def test_scale_twin_agrees_on_fixture(spark, sf_dir):
    """The xxhash64-keyed production path returns identical rows to the
    exact-string path, and the fixture actually has duplicated spans."""
    docs = load_table(spark, sf_dir, "documents")
    exact = substr_dedup.exact_substring_spans(docs)
    scale = substr_dedup.exact_substring_spans(docs, scale=True)
    assert exact.exceptAll(scale).count() == 0
    assert scale.exceptAll(exact).count() == 0
    n_hit = exact.filter(F.col("n_spans") > 0).count()
    assert n_hit > 0  # the check is non-vacuous on the fixture


def test_duckdb_oracle_pin(spark, sf_dir):
    """Spark rows == DuckDB twin rows on the fixture corpus (the same
    comparison check_retired.py commits per round)."""
    docs = load_table(spark, sf_dir, "documents")
    sdf = substr_dedup.exact_substring_spans(docs)
    srows = {tuple(r) for r in sdf.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    orows = {
        tuple(r)
        for r in con.execute(
            substr_dedup.exact_substring_spans_sql()
        ).fetchall()
    }
    assert srows == orows


def test_token_col_path_equals_word_path(spark, sf_dir):
    """Feeding the whitespace tokens through token_col must reproduce
    the text path exactly (same plan, tokenizer swapped) — the pin that
    makes the BPE chain trustworthy."""
    from teste_carga_avro_vs_json_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents").limit(300)
    pre = docs.select("doc_id", tokens("text").alias("toks"))
    a = {
        r.doc_id: (r.n_tokens, r.n_spans, r.n_dup_tokens, r.clean_text)
        for r in substr_dedup.exact_substring_spans(docs, min_len=5).collect()
    }
    got = substr_dedup.exact_substring_spans(
        pre, min_len=5, token_col="toks"
    ).collect()
    b = {
        r.doc_id: (r.n_tokens, r.n_spans, r.n_dup_tokens, r.clean_text)
        for r in got
    }
    assert a == b
    # clean_tokens is the array form of clean_text on a whitespace corpus
    assert all(
        " ".join(r.clean_tokens) == r.clean_text for r in got
    )


def test_bpe_token_exact_substring_chain(spark):
    """The Lee et al. shape end to end: learn BPE on the corpus,
    tokenize, dedup spans in BPE-token space. A passage duplicated
    across docs must be covered in token space; unique tails survive
    as tokens."""
    from teste_carga_avro_vs_json_spark.operators import bpe

    passage = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, passage + "unique ending one"),
        (2, passage + "different closing words"),
        (3, "entirely unrelated content with no repeats at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_learn(docs, num_merges=30)
    toks = bpe.bpe_tokenize(docs, merges).select("doc_id", "tokens")
    out = {
        r.doc_id: r
        for r in substr_dedup.exact_substring_spans(
            toks, min_len=8, token_col="tokens"
        ).collect()
    }
    # the shared passage dominates docs 1/2: most tokens covered
    assert out[1].n_dup_tokens > 0 and out[2].n_dup_tokens > 0
    assert out[1].n_dup_tokens >= out[1].n_tokens // 2
    # doc 3 has no >=8-token duplicated run anywhere in the corpus
    assert out[3].n_dup_tokens == 0 and out[3].clean_tokens == [
        t for t in out[3].clean_tokens
    ]
    # survivors are a subsequence of the doc's tokens
    toks3 = {r.doc_id: r.tokens for r in toks.collect()}[3]
    assert out[3].clean_tokens == toks3
