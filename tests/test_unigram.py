"""Unigram-LM tokenizer (operators/unigram.py): the distributed
Viterbi-EM trainer is pinned EXACTLY against the pure-Python reference
(same discipline as test_bpe); segmentation invariants; the
BPE-vs-unigram comparability contract (same pretokenizer); and the
ExactSubstr token_col chain."""

import pyspark.sql.functions as F
import pytest

from teste_carga_avro_vs_json_spark.operators import unigram


def _freqs_of(spark, docs):
    from teste_carga_avro_vs_json_spark.operators.bpe import word_freqs

    return [(r.word, r.freq) for r in word_freqs(docs).collect()]


def test_distributed_trainer_equals_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    got = unigram.unigram_learn(docs, vocab_size=120, seed_size=400,
                                iters=2)
    want = unigram.unigram_learn_local(
        _freqs_of(spark, docs), vocab_size=120, seed_size=400, iters=2
    )
    assert got == want


def test_trainer_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    a = unigram.unigram_learn(docs, vocab_size=80, seed_size=300)
    b = unigram.unigram_learn(docs.repartition(13), vocab_size=80,
                              seed_size=300)
    assert a == b


def test_viterbi_prefers_longer_known_pieces():
    """With a high-scoring multi-char piece available, Viterbi must use
    it; unknown spans fall back to chars; ties break deterministically."""
    scores = {"a": -5 * 10**9, "b": -5 * 10**9, "ab": -3 * 10**9,
              "c": -5 * 10**9}
    assert unigram._viterbi("abc", scores, 8) == ["ab", "c"]
    assert unigram._viterbi("ba", scores, 8) == ["b", "a"]
    # equal-score tie: fewer pieces wins
    scores2 = {"x": -2 * 10**9, "xx": -4 * 10**9}
    assert unigram._viterbi("xx", scores2, 8) == ["xx"]


def test_tokenize_roundtrips_words(spark):
    """Concatenating a word's pieces must reproduce the word, for every
    pretoken in the corpus (the alphabet fallback guarantees this)."""
    rows = [(1, "the cat sat on the mat"), (2, "the cats sat"),
            (3, "concatenation nation station")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram.unigram_learn(docs, vocab_size=60, seed_size=200)
    out = {r.doc_id: r for r in unigram.unigram_tokenize(docs, model)
           .collect()}
    for doc_id, text in rows:
        rebuilt = "".join(out[doc_id].tokens)
        assert rebuilt == text.replace(" ", "")
        assert out[doc_id].n_pieces >= out[doc_id].n_pretokens


def test_common_words_become_single_pieces(spark):
    """A dominant word must enter the vocabulary whole — the property
    that makes unigram vocabularies compress common text."""
    rows = [(i, "repeated " * 20) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram.unigram_learn(docs, vocab_size=50, seed_size=200)
    assert "repeated" in model
    out = unigram.unigram_tokenize(docs, model).first()
    assert out.tokens[0] == "repeated"


def test_chain_with_exact_substring(spark):
    """unigram_tokenize -> exact_substring_spans(token_col): the
    Lee et al. chain works with either tokenizer family."""
    from teste_carga_avro_vs_json_spark.operators import substr_dedup

    passage = "shared shared shared passage words here now " * 2
    rows = [(1, passage + "unique tail one"),
            (2, passage + "other tail two"),
            (3, "completely different text")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram.unigram_learn(docs, vocab_size=80, seed_size=300)
    toks = unigram.unigram_tokenize(docs, model).select("doc_id", "tokens")
    out = {r.doc_id: r for r in substr_dedup.exact_substring_spans(
        toks, min_len=6, token_col="tokens").collect()}
    assert out[1].n_dup_tokens > 0 and out[2].n_dup_tokens > 0
    assert out[3].n_dup_tokens == 0


def test_tokenize_unseen_chars_fall_back(spark):
    """Inference input containing characters absent from training must
    still tokenize (char fallback), never drop content."""
    train = spark.createDataFrame([(1, "aaa bbb aaa")],
                                  "doc_id long, text string")
    model = unigram.unigram_learn(train, vocab_size=20, seed_size=50)
    docs = spark.createDataFrame([(9, "xyz aaa")],
                                 "doc_id long, text string")
    out = unigram.unigram_tokenize(docs, model).first()
    assert "".join(out.tokens) == "xyzaaa"
