"""Distributed BPE (operators/bpe.py) pinned against a pure-Python
reference implementation of the published algorithm (Sennrich et al.,
arXiv 1508.07909) — the oracle substitute for a surface whose merge
loop is not SQL-expressible (same convention as functions/avro_generic:
pin against an independent implementation, not against itself)."""

import re
from collections import Counter

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import bpe
from teste_carga_avro_vs_json_spark.operators.text import _BPE_RE


# ---------------------------------------------------- reference impl
def _ref_word_freqs(texts):
    rx = re.compile(_BPE_RE)
    c: Counter = Counter()
    for t in texts:
        c.update(rx.findall(t or ""))
    return dict(c)


def _ref_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(word_freqs, num_merges, min_freq=2):
    vocab = {
        tuple(list(w) + [bpe.END]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # tie-break identical to the Spark argmax: count desc, pair asc
        best, cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_freq:
            break
        merges.append(best)
        vocab = {
            tuple(_ref_apply(list(s), *best)): f for s, f in vocab.items()
        }
    return merges


# ------------------------------------------------------------- tests
def test_bpe_learn_sennrich_golden(spark):
    """The canonical paper corpus (low x5, lower x2, newest x6,
    widest x3): the first merges must be the published est-chain."""
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe.bpe_learn(docs, num_merges=5)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", bpe.END)]
    assert merges[3:5] == [("l", "o"), ("lo", "w")]


def test_bpe_learn_matches_reference_on_corpus(spark, sf_dir):
    """Spark merges == pure-Python reference merges on the real fixture
    corpus (exact list equality, including tie-breaks and the min_freq
    early stop)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    want = _ref_bpe(_ref_word_freqs(texts), num_merges=25)
    got = bpe.bpe_learn(docs, num_merges=25)
    assert got == want
    assert len(got) > 5  # the corpus must actually support merges


def test_bpe_learn_min_freq_stop(spark):
    """All-unique words below min_freq: zero merges."""
    docs = spark.createDataFrame(
        [(1, "abc defg hij")], "doc_id long, text string"
    )
    assert bpe.bpe_learn(docs, num_merges=10, min_freq=2) == []


def test_bpe_tokenize_reconstructs_and_compresses(spark, sf_dir):
    """Concatenating each doc's tokens (END markers -> spaces) must
    reconstruct its pretoken stream exactly, and more merges can never
    yield more tokens than fewer merges."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    merges = bpe.bpe_learn(docs, num_merges=20)
    assert len(merges) > 0
    full = bpe.bpe_tokenize(docs, merges)
    few = bpe.bpe_tokenize(docs, merges[:3])
    rx = re.compile(_BPE_RE)
    joined = {
        r.doc_id: (r.tokens, r.n_bpe_tokens) for r in full.collect()
    }
    few_counts = {r.doc_id: r.n_bpe_tokens for r in few.collect()}
    for r in docs.select("doc_id", "text").collect():
        toks, n = joined[r.doc_id]
        assert "".join(toks).split(bpe.END) == rx.findall(r.text) + [""]
        assert n <= few_counts[r.doc_id]


def test_bpe_tokenize_plan_is_scan_local(spark, sf_dir):
    """Tokenization is one Arrow-batched scan: no shuffle, and the
    Python eval is the vectorized Arrow node, not row-at-a-time."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bpe.bpe_tokenize(docs, [("e", "s"), ("es", "t")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_bpe_property_random_corpora(spark):
    """Property pin: on RANDOM small corpora the Spark merge loop must
    equal the reference implementation exactly — merges, tie-breaks,
    and early stops included. One Spark session, driver-side loop over
    hypothesis-style generated cases (explicit seeds: each example
    costs Spark jobs, so the case list is bounded and reproducible)."""
    import random

    for seed in range(8):
        rng = random.Random(seed)
        vocab = [
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(2, 12))
        ]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
            for _ in range(rng.randint(1, 6))
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        want = _ref_bpe(_ref_word_freqs(texts), num_merges=12)
        got = bpe.bpe_learn(docs, num_merges=12)
        assert got == want, f"seed {seed}"


def test_bpe_learn_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert bpe.bpe_learn(docs, num_merges=10) == bpe.bpe_learn(
        docs, num_merges=10
    )
