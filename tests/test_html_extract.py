"""HTML → text extraction (operators/html_extract.py): parser goldens
(drop rules, entities, malformed markup), the exact round-trip over
synth_html on the real fixture corpus, and the shuffle-free plan pin.
No SQL oracle — DuckDB has no HTML parser (documented convention for
non-relational codecs)."""

import pyspark.sql.functions as F

from teste_carga_avro_vs_json_spark.operators import html_extract as hx


def test_extract_core_goldens():
    title, text, n_links, n_dropped = hx.extract_html(
        "<html><head><title> My  Page </title>"
        "<style>p{x:1}</style></head><body>"
        "<nav><a href='/'>Home</a></nav>"
        "<p>Hello &amp; <b>world</b></p>"
        "<script>var x = '<p>not text</p>';</script>"
        "<p>Second   line</p>"
        "<footer>chrome</footer></body></html>"
    )
    assert title == "My Page"
    assert text == "Hello & world\nSecond line"
    assert n_links == 0  # the only link sits inside dropped <nav>
    assert n_dropped == 4  # style, nav, script, footer


def test_extract_links_and_inline_flow():
    _, text, n_links, _ = hx.extract_html(
        "<body><p>See <a href='x'>this</a> and <a href='y'>that</a>."
        "</p><div>next<br>block</div></body>"
    )
    assert n_links == 2
    assert text == "See this and that.\nnext\nblock"


def test_extract_malformed_html_no_crash():
    # unclosed tags, stray brackets, nested misuse — parser tolerance
    _, text, _, _ = hx.extract_html(
        "<p>open <b>bold <p>ragged</i> tail < 5 > ok"
    )
    assert "open" in text and "ragged" in text
    assert hx.extract_html("")[1] == ""
    assert hx.extract_html(None)[1] == ""


def test_extract_nested_drop_subtrees():
    """A chrome subtree containing another droppable tag must count
    once and drop everything inside."""
    _, text, n_links, n_dropped = hx.extract_html(
        "<body><nav>menu <script>x</script> <a href=z>l</a></nav>"
        "<p>kept</p></body>"
    )
    assert text == "kept"
    assert n_links == 0
    assert n_dropped == 1


def test_roundtrip_on_fixture(spark, sf_dir):
    """extract_text(synth_html(docs)) recovers EXACTLY the original
    corpus text re-wrapped as 12-word lines, with the synthetic title
    and chrome accounted for — every doc, bit-exact."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        r.doc_id: r
        for r in hx.extract_text(hx.synth_html(docs)).collect()
    }
    for r in docs.collect():
        toks = r.text.split()
        want = "\n".join(
            " ".join(toks[i : i + 12]) for i in range(0, len(toks), 12)
        )
        g = got[r.doc_id]
        assert g.text == want
        assert g.title == f"Doc {r.doc_id}"
        assert g.n_links == 0  # both links live inside dropped <nav>
        assert g.n_dropped == 4  # style, nav, script, footer


def test_plan_shuffle_free(spark, sf_dir):
    from teste_carga_avro_vs_json_spark import plans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = hx.extract_text(hx.synth_html(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert plans.expensive_filter_nodes(df) == []
