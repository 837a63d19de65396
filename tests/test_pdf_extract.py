"""PDF ingest stage pins (r8 VERDICT order #7): exact round-trips
over build_pdf (compressed + raw streams, multi-page, escapes),
hand-crafted bitstreams for the operators the builder doesn't emit
(TJ kerning, quote operators, hex strings, ASCIIHexDecode, /Prev
incremental updates), the PDF 1.5 layouts (xref streams with PNG
predictors, object streams), LZW (spec golden + JVM-interop pin in
test_imageio_interop), Type0/Identity-H + ToUnicode text (CJK,
astral), documented boundaries (encrypted, DCT, CMap-less Type0),
and the Spark surfaces (extract_text_pdf + synth_pdf) including the
error-column contract on a malformed doc. Fuzz coverage lives in
test_fuzz_decoders.py ("pdf" + "pdf15" rows)."""

from __future__ import annotations

import re
import zlib

import pyspark.sql.functions as F
import pytest

from teste_carga_avro_vs_json_spark.operators import pdf_extract as px


def test_roundtrip_exact_compressed_and_raw():
    pages = [
        ["Hello world this is line one", "second line (with parens) ok",
         "back\\slash and fim"],
        ["page two line", "last line"],
    ]
    expect = "\n".join(line for page in pages for line in page)
    for comp in (True, False):
        text, n_pages = px.extract_pdf(px.build_pdf(pages, compress=comp))
        assert n_pages == 2
        assert text == expect


def test_roundtrip_latin1_and_empty_page():
    pages = [["ação café naïve — ©"], [""]]
    text, n_pages = px.extract_pdf(px.build_pdf(pages))
    assert n_pages == 2
    assert text == "ação café naïve — ©".encode("latin-1", "replace").decode(
        "latin-1"
    )


def _wrap_content(content: bytes, filters: bytes = b"") -> bytes:
    """Minimal single-page PDF around a raw content stream."""
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R >>"
        ),
        4: b"<< /Length " + str(len(content)).encode() + filters + b" >>",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num]
        if num == 4:
            out += b"\nstream\n" + content + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for num in range(1, 5):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_tj_kerning_spaces_and_quote_operators():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Hel) -20 (lo) -500 (world)] TJ "
        b"(next via quote) ' "
        b"1 2 (double quote line) \" "
        b"ET"
    )
    text, n = px.extract_pdf(_wrap_content(content))
    # -20 > threshold: glued; -500 <= threshold: space
    assert text == "Hello world\nnext via quote\ndouble quote line"
    assert n == 1


def test_hex_strings_and_asciihex_filter():
    inner = b"BT (plain) Tj <48692074 6865 7265> Tj ET"
    hexed = inner.hex().encode() + b">"
    pdf = _wrap_content(hexed, filters=b" /Filter /ASCIIHexDecode")
    text, _ = px.extract_pdf(pdf)
    assert text == "plainHi there"


def test_incremental_update_prev_chain_newest_wins():
    """Append an update that replaces the content object (object 4)
    via a second xref section with /Prev — classic incremental save.
    The newest xref must win for object 4."""
    base = _wrap_content(b"BT (old text) Tj ET")
    # find original startxref for /Prev
    old_xref = int(base.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    new_content = b"BT (new text) Tj ET"
    upd = bytearray(base)
    new4_at = len(upd)
    upd += (
        b"4 0 obj\n<< /Length " + str(len(new_content)).encode()
        + b" >>\nstream\n" + new_content + b"\nendstream\nendobj\n"
    )
    xref_at = len(upd)
    upd += (
        b"xref\n4 1\n" + f"{new4_at:010d} 00000 n \n".encode()
        + f"trailer\n<< /Size 5 /Root 1 0 R /Prev {old_xref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    text, _ = px.extract_pdf(bytes(upd))
    assert text == "new text"
    # the original file alone still reads the old text
    assert px.extract_pdf(base)[0] == "old text"


def test_boundaries_raise_not_implemented():
    # an out-of-range Standard revision (public-key handlers use
    # /Filter /Adobe.PubSec, but a hypothetical R7 must also refuse)
    enc = _wrap_content(b"BT (x) Tj ET").replace(
        b"/Size 5 /Root 1 0 R",
        b"/Size 5 /Root 1 0 R /Encrypt << /Filter /Standard /V 6 /R 7 "
        b"/O <00> /U <00> /P -1 >>",
    )
    with pytest.raises(NotImplementedError, match="out of scope"):
        px.extract_pdf(enc)
    # an unknown crypt-filter method under /V 4
    enc_cfm = _wrap_content(b"BT (x) Tj ET").replace(
        b"/Size 5 /Root 1 0 R",
        b"/Size 5 /Root 1 0 R /Encrypt << /Filter /Standard /V 4 /R 4 "
        b"/CF << /StdCF << /CFM /AESV9 >> >> /StmF /StdCF "
        b"/O <00> /U <00> /P -1 >>",
    )
    with pytest.raises(NotImplementedError, match="crypt filter method"):
        px.extract_pdf(enc_cfm)
    # non-Standard handlers stay out of scope
    enc2 = _wrap_content(b"BT (x) Tj ET").replace(
        b"/Size 5 /Root 1 0 R",
        b"/Size 5 /Root 1 0 R /Encrypt << /Filter /Outro /V 1 /R 2 "
        b"/O <00> /U <00> >>",
    )
    with pytest.raises(NotImplementedError, match="non-Standard"):
        px.extract_pdf(enc2)
    # unsupported filter
    dct = _wrap_content(b"xxxx", filters=b" /Filter /DCTDecode")
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        px.extract_pdf(dct)
    # an XRef stream with a broken /W must fail loudly, not guess
    fake = bytearray(b"%PDF-1.5\n")
    obj_at = len(fake)
    fake += (
        b"1 0 obj\n<< /Type /XRef /Length 2 >>\nstream\nxx\nendstream"
        b"\nendobj\n"
    )
    fake += f"startxref\n{obj_at}\n%%EOF\n".encode()
    with pytest.raises(px.PdfFormatError, match="/W"):
        px.extract_pdf(bytes(fake))


def test_type0_font_boundary():
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"
        ),
        4: b"<< /Length 14 >>",
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /X >>",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num]
        if num == 4:
            out += b"\nstream\nBT (x) Tj ET\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with pytest.raises(NotImplementedError, match="Type0"):
        px.extract_pdf(bytes(out))


def test_inflate_bomb_capped(monkeypatch):
    bomb_plain = b"BT " + b"(A) Tj " * 10 + b"ET"
    comp = zlib.compress(bomb_plain + b"\x00" * 500_000, 9)
    pdf = _wrap_content(comp, filters=b" /Filter /FlateDecode")
    monkeypatch.setattr(px, "MAX_STREAM_BYTES", 10_000)
    with pytest.raises(px.PdfFormatError, match="cap"):
        px.extract_pdf(pdf)


def test_page_tree_cycle_and_depth_capped():
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Count 1 /Kids [2 0 R] >>",  # self-cycle
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 3\n0000000000 65535 f \n"
    for num in range(1, 3):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 3 /Root 1 0 R >>\nstartxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with pytest.raises(px.PdfFormatError, match="cycle|deep"):
        px.extract_pdf(bytes(out))


# ------------------------------------------------------ Spark stages
def test_spark_synth_extract_roundtrip(spark, sf_dir):
    """All-docs round trip: synth_pdf(docs) → extract_text_pdf must
    recover the exact 8-word line structure for every document — the
    synth_html convention."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(120)
    pdfs = px.synth_pdf(docs)
    got = px.extract_text_pdf(pdfs)
    joined = (
        got.alias("g")
        .join(docs.alias("d"), "doc_id")
        .select("doc_id", "g.text", "g.error", F.col("d.text").alias("src"))
    )
    rows = joined.collect()
    assert len(rows) == 120
    for r in rows:
        assert r.error is None
        words = (r.src or "").split()
        expect = "\n".join(
            " ".join(words[i : i + 8])
            for i in range(0, max(len(words), 1), 8)
        ).strip()
        assert r.text == expect, r.doc_id


def test_spark_malformed_doc_lands_in_error_column(spark):
    df = spark.createDataFrame(
        [(1, bytearray(px.build_pdf([["boa linha"]]))),
         (2, bytearray(b"%PDF-1.4 truncated garbage"))],
        "doc_id long, pdf binary",
    )
    rows = {r.doc_id: r for r in px.extract_text_pdf(df).collect()}
    assert rows[1].text == "boa linha" and rows[1].error is None
    assert rows[2].text is None and rows[2].error == "PdfFormatError"
    assert rows[2].n_pages == 0


@pytest.mark.slow
def test_pdf_chains_into_corpus_builder(spark, sf_dir):
    """The ingest chain the verdict asked for: PDFs → extract →
    build_training_corpus, with the extractor's error column feeding
    the no-silent-caps accounting (malformed docs are counted, then
    excluded from the corpus input)."""
    from teste_carga_avro_vs_json_spark.pipelines import (
        build_training_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(60)
    pdfs = px.synth_pdf(docs)
    # poison two docs to exercise the error path mid-corpus
    poisoned = pdfs.withColumn(
        "pdf",
        F.when(F.col("doc_id") % 29 == 0, F.lit(b"%PDF-1.4 bad")).otherwise(
            F.col("pdf")
        ),
    )
    extracted = px.extract_text_pdf(poisoned).cache()
    n_bad = extracted.where("error is not null").count()
    assert n_bad >= 1
    good = extracted.where("error is null").select("doc_id", "text")
    packed, ledger = build_training_corpus(
        good, seq_len=256, line_filter=False, keep_frac=0.9
    )
    assert packed.count() > 0
    stages = [s["stage"] for s in ledger]
    assert stages[0] == "input"
    assert ledger[0]["rows"] == 60 - n_bad
    extracted.unpersist()


def test_plan_shuffle_free(spark, sf_dir):
    """Scale pin (the html_extract convention): the whole synth →
    extract chain is one Arrow-batched projection — zero Exchange,
    no expensive filter nodes."""
    from teste_carga_avro_vs_json_spark import plans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = px.extract_text_pdf(px.synth_pdf(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert plans.expensive_filter_nodes(df) == []


# ------------------------------------------------------------- LZW
def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Test-local TIFF-variant LZW encoder (MSB-first, 256=Clear,
    257=EOD, EarlyChange) — exists only to exercise the decoder's
    width growth and table handling; the decoder's external golden is
    the ISO 32000 worked example below."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits: list[tuple[int, int]] = [(256, 9)]
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        # the decoder's table lags one entry behind at read time, so
        # the encoder widens one assignment later than the decoder's
        # len(table) threshold (JVM-pinned in test_imageio_interop)
        if next_code + early > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096 - 1:
            out_bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((257, width))
    acc = bits = 0
    out = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        bits += wd
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def test_lzw_spec_golden():
    """The ISO 32000 §7.4.4.2 worked example — external golden."""
    assert px._lzw_decode(bytes.fromhex("800B6050220C0C8501")) == b"-----A---B"


def test_lzw_roundtrip_with_width_growth_and_clear():
    import random

    rng = random.Random(7)
    # enough distinct digrams to push the table past 512 and 1024
    # entries (width 9→10→11) and past a mid-stream Clear
    data = bytes(rng.randrange(8) for _ in range(60_000))
    assert px._lzw_decode(_lzw_encode(data)) == data
    # prose-like too
    text = (b"the quick brown fox jumps over the lazy dog " * 400)
    assert px._lzw_decode(_lzw_encode(text)) == text


def test_lzw_pdf_content_stream_end_to_end():
    content = b"BT /F1 12 Tf 72 720 Td (via LZW stream) Tj ET"
    enc = _lzw_encode(content)
    pdf = _wrap_content(enc, filters=b" /Filter /LZWDecode")
    text, _ = px.extract_pdf(pdf)
    assert text == "via LZW stream"


# ------------------------------------------------ PDF 1.5 layouts
@pytest.mark.parametrize("layout", ["xref_stream", "objstm"])
@pytest.mark.parametrize("compress", [True, False])
def test_pdf15_layout_roundtrip(layout, compress):
    """Cross-reference streams (Flate + PNG Up predictor when
    compressed) and object streams must round-trip exactly like the
    classic layout — build_pdf is the builder twin for each reader
    path."""
    pages = [
        ["linha um dois tres", "quatro (cinco) seis"],
        ["pagina dois inteira"],
    ]
    pdf = px.build_pdf(pages, compress=compress, layout=layout)
    text, n_pages = px.extract_pdf(pdf)
    assert n_pages == 2
    assert text == "\n".join(l for pg in pages for l in pg)
    # the layout markers are really present
    if layout == "objstm":
        assert b"/ObjStm" in pdf
    assert b"/Type /XRef" in pdf and b"trailer" not in pdf
    if compress:
        assert b"/Predictor 12" in pdf


def test_pdf15_incremental_update_over_xref_stream():
    """A classic-table update appended on top of an xref-stream base
    (the common 'signed afterwards' shape): /Prev points at the
    stream section, the newest table wins for the updated object."""
    base = px.build_pdf([["texto antigo"]], layout="xref_stream")
    old_startxref = int(
        base.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0]
    )
    new_content = b"BT (texto novo) Tj ET"
    upd = bytearray(base)
    new4_at = len(upd)
    upd += (
        b"5 0 obj\n<< /Length " + str(len(new_content)).encode()
        + b" >>\nstream\n" + new_content + b"\nendstream\nendobj\n"
    )
    xref_at = len(upd)
    upd += (
        b"xref\n5 1\n" + f"{new4_at:010d} 00000 n \n".encode()
        + f"trailer\n<< /Size 7 /Root 1 0 R /Prev {old_startxref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    assert px.extract_pdf(bytes(upd))[0] == "texto novo"
    assert px.extract_pdf(base)[0] == "texto antigo"


def test_png_unpredict_filters():
    """All five PNG row filters through the predictor path (the
    builder only emits Up) — encode by applying each filter forward,
    decode must invert it."""
    rows = [bytes((i * 31 + j * 7) % 256 for j in range(8)) for i in range(5)]
    filters = [0, 1, 2, 3, 4]
    enc = bytearray()
    prev = bytes(8)
    for row, f in zip(rows, filters):
        enc.append(f)
        for j in range(8):
            a = row[j - 1] if j >= 1 else 0
            b = prev[j]
            c = prev[j - 1] if j >= 1 else 0
            if f == 0:
                x = row[j]
            elif f == 1:
                x = (row[j] - a) & 0xFF
            elif f == 2:
                x = (row[j] - b) & 0xFF
            elif f == 3:
                x = (row[j] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                x = (row[j] - pred) & 0xFF
            enc.append(x)
        prev = row
    assert px._png_unpredict(bytes(enc), columns=8) == b"".join(rows)


# ----------------------------------------------- Type0 / Identity-H
def test_type0_identity_h_roundtrip_cjk_and_astral():
    """The modern-writer shape: Type0 + Identity-H + ToUnicode CMap.
    CIDs are first-appearance-ordered (subset-embedder behavior), so
    extraction exercises the CMap, not a codepoint identity; covers
    BMP CJK, combining marks, and an astral emoji (surrogate-pair
    destination)."""
    pages = [
        ["olá 日本語 texto", "ação — em dash €"],
        ["page two 中文 🙂"],
    ]
    expect = "\n".join(l for pg in pages for l in pg)
    for layout in ("classic", "objstm"):
        pdf = px.build_pdf(pages, layout=layout, font="type0")
        text, n = px.extract_pdf(pdf)
        assert n == 2 and text == expect, layout
        # really a CID font: the literal text must NOT appear raw
        assert "日本語".encode("utf-8") not in pdf
    plain = px.build_pdf(pages, font="type0", compress=False)
    assert b"/Identity-H" in plain and b"/ToUnicode" in plain


def test_type0_unmapped_cid_is_visible_replacement():
    """A CID missing from the ToUnicode CMap must surface as U+FFFD
    (visible coverage gap), never be silently dropped."""
    pdf = px.build_pdf([["ab"]], font="type0", compress=False)
    assert b"<00010002> Tj" in pdf  # first-appearance CID assignment
    assert px.extract_pdf(pdf)[0] == "ab"
    from teste_carga_avro_vs_json_spark.operators.pdf_extract import (
        _FontDecoder,
    )

    dec = _FontDecoder("cid2", {1: "a", 2: "b"})
    assert dec.decode(bytes.fromhex("000109990002")) == "a�b"


def test_tounicode_bfrange_forms():
    """Both bfrange forms: incrementing destination and explicit
    destination arrays; plus a surrogate-pair bfchar."""
    from teste_carga_avro_vs_json_spark.operators.pdf_extract import (
        _parse_tounicode_cmap,
    )

    cmap_src = (
        b"begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar\n"
        b"<0001> <0041>\n"
        b"<0002> <D83D DE42>\n"       # U+1F642 as UTF-16BE surrogates
        b"endbfchar\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <0061>\n"      # a, b, c
        b"<0020> <0021> [<0058> <0059>]\n"  # X, Y
        b"endbfrange\n"
        b"endcmap\n"
    )
    cmap = _parse_tounicode_cmap(cmap_src)
    assert cmap[1] == "A"
    assert cmap[2] == "\U0001f642"
    assert [cmap[0x10], cmap[0x11], cmap[0x12]] == ["a", "b", "c"]
    assert [cmap[0x20], cmap[0x21]] == ["X", "Y"]


def test_type0_without_tounicode_still_raises():
    # the pre-existing boundary test (test_type0_font_boundary) builds
    # a Type0 WITHOUT ToUnicode — keep a direct pin here too, on the
    # builder's output with the ToUnicode ref stripped
    pdf = px.build_pdf([["abc"]], font="type0", compress=False)
    # /Encoding other than Identity-H is also out of scope (same-
    # length splice so the classic xref offsets stay valid)
    other_enc = pdf.replace(b"/Identity-H", b"/Xdentity-H")
    with pytest.raises(NotImplementedError, match="out of scope"):
        px.extract_pdf(other_enc)


def test_mixed_fonts_switch_mid_page():
    """Tf switches between a simple and a CID font mid-stream; each
    string decodes under the font active at its operator."""
    from teste_carga_avro_vs_json_spark.operators.pdf_extract import (
        _FontDecoder,
        _content_text,
    )

    fonts = {
        "F1": _FontDecoder("simple"),
        "F2": _FontDecoder("cid2", {1: "日", 2: "本"}),
    }
    content = (
        b"BT /F1 12 Tf (latin ) Tj /F2 12 Tf <00010002> Tj "
        b"/F1 12 Tf ( fim) Tj ET"
    )
    assert _content_text(content, fonts) == "latin 日本 fim"


def test_spark_null_pdf_lands_in_error_column(spark):
    df = spark.createDataFrame(
        [(1, bytearray(px.build_pdf([["ok"]]))), (2, None)],
        "doc_id long, pdf binary",
    )
    rows = {r.doc_id: r for r in px.extract_text_pdf(df).collect()}
    assert rows[1].text == "ok"
    assert rows[2].text is None and rows[2].error == "PdfFormatError"


# ------------------------------------------------ RC4 encryption (r10)


def test_encrypted_roundtrip_matches_plaintext_twin():
    """The build_pdf encrypt twin: extraction of the RC4-encrypted
    file must equal the PLAINTEXT twin exactly — across both handler
    revisions, both compression modes, both font models."""
    pages = [
        ["linha um dois tres", "quatro (cinco) seis"],
        ["pagina dois com mais texto"],
    ]
    for r in (2, 3):
        for compress in (True, False):
            for font in ("type1", "type0"):
                enc = px.build_pdf(
                    pages, compress=compress, font=font,
                    encrypt={"revision": r, "user_password": ""},
                )
                assert b"/Encrypt" in enc
                # the encrypted bytes must NOT contain the plaintext
                want = px.extract_pdf(
                    px.build_pdf(pages, compress=compress, font=font)
                )
                assert px.extract_pdf(enc) == want, (r, compress, font)
    # deterministic bytes (the /ID is content-derived, never random)
    a = px.build_pdf(pages, encrypt={"revision": 3})
    assert a == px.build_pdf(pages, encrypt={"revision": 3})


def test_encrypted_ciphertext_hides_plaintext():
    """Honesty check on the twin: with compress=False the plaintext
    lines are directly visible in an UNencrypted file and absent from
    the encrypted one."""
    pages = [["texto confidencial visivel"]]
    plain = px.build_pdf(pages, compress=False)
    enc = px.build_pdf(
        pages, compress=False, encrypt={"revision": 3}
    )
    assert b"texto confidencial visivel" in plain
    assert b"texto confidencial visivel" not in enc


def test_encrypted_wrong_password_raises():
    pages = [["dados protegidos"]]
    enc = px.build_pdf(
        pages, encrypt={"revision": 3, "user_password": "segredo"}
    )
    want = px.extract_pdf(px.build_pdf(pages))
    assert px.extract_pdf(enc, password="segredo") == want
    with pytest.raises(px.PdfPasswordError):
        px.extract_pdf(enc)  # the empty default must NOT authenticate
    with pytest.raises(px.PdfPasswordError):
        px.extract_pdf(enc, password="errada")
    # PdfPasswordError IS a PdfFormatError: the Spark error-column
    # contract (no-silent-caps) catches it without a new except arm
    assert issubclass(px.PdfPasswordError, px.PdfFormatError)


def test_encrypted_40bit_r2_key_shape():
    """R2 forces the 40-bit key path (5-byte file key, object keys
    capped at 10 bytes) — a distinct arithmetic branch from R3/128."""
    pages = [["quarenta bits"]]
    enc = px.build_pdf(
        pages, encrypt={"revision": 2, "user_password": "pw40"}
    )
    assert px.extract_pdf(enc, password="pw40") == px.extract_pdf(
        px.build_pdf(pages)
    )
    with pytest.raises(px.PdfPasswordError):
        px.extract_pdf(enc, password="")


def test_encrypted_spark_error_column(spark):
    """extract_text_pdf (empty-password path): empty-user-password
    files extract transparently; password-protected ones land in the
    error column, never crash the stage."""
    rows = [
        (1, px.build_pdf([["doc aberto"]],
                         encrypt={"revision": 3, "user_password": ""})),
        (2, px.build_pdf([["doc fechado"]],
                         encrypt={"revision": 3, "user_password": "x"})),
    ]
    df = spark.createDataFrame(rows, "doc_id long, pdf binary")
    out = {r.doc_id: r for r in px.extract_text_pdf(df).collect()}
    assert out[1].text == "doc aberto" and out[1].error is None
    assert out[2].text is None
    assert out[2].error == "PdfPasswordError"


def test_rc4_matches_jvm_arcfour(spark):
    """Cross-implementation cipher pin: our stdlib RC4 must produce
    byte-identical keystreams to the JVM's independent ARCFOUR cipher
    (SunJCE) across key lengths 5..16 — the avro-jar/imageio interop
    trick applied to the PDF security handler's primitive."""
    import hashlib

    jvm = spark.sparkContext._jvm
    for i in range(6):
        key = hashlib.md5(f"k{i}".encode()).digest()[: 5 + i * 2]
        data = hashlib.md5(f"d{i}".encode()).digest() * (i + 7)
        c = jvm.javax.crypto.Cipher.getInstance("ARCFOUR")
        sk = jvm.javax.crypto.spec.SecretKeySpec(bytearray(key), "ARCFOUR")
        c.init(jvm.javax.crypto.Cipher.ENCRYPT_MODE, sk)
        assert bytes(c.doFinal(bytearray(data))) == px._rc4(key, data)


# ------------------------------------------------ AES encryption (r10)
def _jvm_aes(spark, mode: str, transform: str, key: bytes,
             data: bytes, iv: bytes | None = None) -> bytes:
    jvm = spark.sparkContext._jvm
    c = jvm.javax.crypto.Cipher.getInstance(transform)
    sk = jvm.javax.crypto.spec.SecretKeySpec(bytearray(key), "AES")
    m = (jvm.javax.crypto.Cipher.ENCRYPT_MODE if mode == "enc"
         else jvm.javax.crypto.Cipher.DECRYPT_MODE)
    if iv is None:
        c.init(m, sk)
    else:
        c.init(m, sk, jvm.javax.crypto.spec.IvParameterSpec(bytearray(iv)))
    return bytes(c.doFinal(bytearray(data)))


def test_aes_matches_jvm(spark):
    """Cross-implementation pin for functions/aes_stdlib: ECB and CBC,
    all three key sizes, BOTH directions against SunJCE — the ARCFOUR
    trick applied to the AES crypt filters."""
    import hashlib

    from teste_carga_avro_vs_json_spark.functions import aes_stdlib as aes

    for klen in (16, 24, 32):
        key = hashlib.sha256(b"jk%d" % klen).digest()[:klen]
        iv = hashlib.md5(b"jiv%d" % klen).digest()
        data = hashlib.sha256(b"jd%d" % klen).digest() * 5
        assert aes.ecb_encrypt(key, data) == _jvm_aes(
            spark, "enc", "AES/ECB/NoPadding", key, data
        )
        jvm_ct = _jvm_aes(spark, "enc", "AES/CBC/NoPadding", key, data, iv)
        assert aes.cbc_encrypt(key, iv, data) == jvm_ct
        assert aes.cbc_decrypt(key, iv, jvm_ct) == data
        assert _jvm_aes(
            spark, "dec", "AES/CBC/NoPadding", key, jvm_ct, iv
        ) == data
        # a payload above CBC_NP_THRESHOLD pins the numpy batch path
        # against SunJCE too (the small payloads above pin the scalar)
        big = data * (aes.CBC_NP_THRESHOLD // len(data) + 1)
        jvm_big = _jvm_aes(spark, "enc", "AES/CBC/NoPadding", key, big, iv)
        assert aes.cbc_decrypt(key, iv, jvm_big) == big


def test_aes_stream_payload_decrypts_in_jvm(spark):
    """Layout pin: an /AESV2-encrypted stream (IV prefix + CBC + RFC
    2898 padding) must decrypt under SunJCE's AES/CBC/PKCS5Padding —
    a FOREIGN implementation of both the cipher AND the padding."""
    pages = [["segredo um", "segredo dois"]]
    data = px.build_pdf(
        pages, compress=False, encrypt={"revision": 4}
    )
    doc = px._Document(data)
    # object 5 is the first content stream; re-read its RAW bytes
    # (undecrypted) straight from the file
    m = re.search(rb"5 0 obj\n<< /Length (\d+) >>\nstream\n", data)
    assert m is not None
    raw = data[m.end() : m.end() + int(m.group(1))]
    okey = px._std_object_key_aes(doc._enc_key, 5, 0)
    jvm_pt = _jvm_aes(
        spark, "dec", "AES/CBC/PKCS5Padding", okey, raw[16:], raw[:16]
    )
    assert b"segredo um" in jvm_pt
    # and our own decrypt agrees byte-for-byte
    assert doc._decrypt_payload(raw, 5, 0, "aesv2") == jvm_pt


def test_encrypted_aes_roundtrip_matches_plaintext_twin():
    """Revisions 4 (AES-128 /AESV2), 5 and 6 (AES-256 /AESV3): the
    encrypted twins must extract EXACTLY like the plaintext build —
    including multi-page, compressed and uncompressed, and the Type0
    font path (its ToUnicode CMap stream is encrypted too)."""
    pages = [["ola mundo", "linha dois"], ["pagina dois"]]
    plain, n_pages = px.extract_pdf(px.build_pdf(pages))
    for r in (4, 5, 6):
        for compress in (True, False):
            data = px.build_pdf(
                pages, compress=compress, encrypt={"revision": r}
            )
            text, n = px.extract_pdf(data)
            assert (text, n) == (plain, n_pages), (r, compress)
        # deterministic bytes (twice-built identical)
        assert px.build_pdf(pages, encrypt={"revision": r}) == px.build_pdf(
            pages, encrypt={"revision": r}
        )
    # type0 + encryption compose (CJK text through an encrypted CMap)
    cjk = [["你好世界"]]
    want = px.extract_pdf(px.build_pdf(cjk, font="type0"))[0]
    got = px.extract_pdf(
        px.build_pdf(cjk, font="type0", encrypt={"revision": 4})
    )[0]
    assert got == want


def test_encrypted_aes_wrong_password_raises():
    pages = [["conteudo"]]
    for r in (4, 5, 6):
        data = px.build_pdf(
            pages, encrypt={"revision": r, "user_password": "segredo"}
        )
        with pytest.raises(px.PdfPasswordError):
            px.extract_pdf(data)
        with pytest.raises(px.PdfPasswordError):
            px.extract_pdf(data, password="errada")
        assert px.extract_pdf(data, password="segredo")[0] == "conteudo"


def test_encrypted_aes_ciphertext_hides_plaintext():
    pages = [["texto visivel aqui"]]
    ref = px.build_pdf(pages, compress=False)
    assert b"texto visivel aqui" in ref
    for r in (4, 6):
        enc = px.build_pdf(pages, compress=False, encrypt={"revision": r})
        assert b"texto visivel aqui" not in enc


def test_v5_perms_tamper_raises():
    """A corrupted /Perms blob must fail validation against the
    recovered file key (catches a /UE..//Perms mismatch that a
    password check alone would not)."""
    data = px.build_pdf([["x"]], encrypt={"revision": 5})
    m = re.search(rb"/Perms <([0-9a-f]{32})>", data)
    assert m is not None
    flipped = bytearray.fromhex(m.group(1).decode())
    flipped[0] ^= 0xFF
    bad = data.replace(m.group(1), flipped.hex().encode())
    with pytest.raises(px.PdfFormatError, match="/Perms"):
        px.extract_pdf(bad)


def test_aes_payload_corruption_raises_format_error():
    """Truncated or misaligned AES stream payloads are format errors,
    never silent truncation (decoder-hardening rule)."""
    doc = px._Document(px.build_pdf([["x"]], encrypt={"revision": 4}))
    with pytest.raises(px.PdfFormatError, match="length"):
        doc._decrypt_payload(b"short", 5, 0, "aesv2")
    with pytest.raises(px.PdfFormatError, match="length"):
        doc._decrypt_payload(bytes(40), 5, 0, "aesv2")  # not %16
    # valid length, garbage padding
    with pytest.raises(px.PdfFormatError, match="padding"):
        doc._decrypt_payload(bytes(48), 5, 0, "aesv2")
    # empty payload passes through (writers encrypt empty strings as empty)
    assert doc._decrypt_payload(b"", 5, 0, "aesv2") == b""


def test_hash_2b_termination_and_shape():
    """Algorithm 2.B structural pins: 32-byte output, deterministic,
    password/salt sensitivity, and the >=64-round data-dependent
    termination (different salts take different round counts yet all
    terminate)."""
    outs = set()
    for i in range(4):
        salt = bytes([i]) * 8
        h = px._hash_2b(b"pw", salt)
        assert len(h) == 32
        assert h == px._hash_2b(b"pw", salt)
        outs.add(h)
    assert len(outs) == 4
    assert px._hash_2b(b"pw", bytes(8)) != px._hash_2b(b"pw2", bytes(8))
    assert px._hash_2b(b"pw", bytes(8), b"u") != px._hash_2b(b"pw", bytes(8))


# ------------------------------------------- TIFF predictor 2 (r10)
def test_tiff_predictor2_flate_and_lzw_content_streams():
    """ISO 32000 7.4.4.4: /Predictor 2 is horizontal differencing with
    NO per-row filter byte — both Flate and LZW content streams must
    invert it; convention additionally JVM-pinned in
    test_imageio_interop.py (javax.imageio reads an LZW+predictor-2
    TIFF built with the same forward transform)."""
    import zlib

    content = b"BT /F1 12 Tf 72 720 Td (predicted text ok) Tj ET"
    cols = 16
    padded = content + b" " * (-len(content) % cols)
    pred = px._tiff_predict(padded, cols)
    assert pred != padded  # the transform actually did something
    parms = (
        b" /DecodeParms << /Predictor 2 /Columns " +
        str(cols).encode() + b" >>"
    )
    pdf_flate = _wrap_content(
        zlib.compress(pred), filters=b" /Filter /FlateDecode" + parms
    )
    assert px.extract_pdf(pdf_flate)[0] == "predicted text ok"
    pdf_lzw = _wrap_content(
        _lzw_encode(pred), filters=b" /Filter /LZWDecode" + parms
    )
    assert px.extract_pdf(pdf_lzw)[0] == "predicted text ok"


def test_tiff_predictor2_inverse_and_boundaries():
    import pytest

    # forward/inverse are exact inverses, multi-component rows too
    data = bytes((i * 37 + (i >> 3) * 11) & 0xFF for i in range(240))
    for columns, colors in ((16, 1), (20, 3), (240, 1), (1, 4)):
        if 240 % (columns * colors):
            continue
        fwd = px._tiff_predict(data, columns, colors)
        assert px._tiff_unpredict(fwd, columns, colors) == data
    # per-component differencing: component streams are independent
    row = bytes([10, 100, 200, 13, 105, 190])  # 2 px, 3 components
    fwd = px._tiff_predict(row, 2, 3)
    assert fwd == bytes([10, 100, 200, 3, 5, (190 - 200) & 0xFF])
    # ragged data is a format error, never a silent partial row
    with pytest.raises(px.PdfFormatError):
        px._tiff_unpredict(b"12345", 4, 1)
    # sub-byte / 16-bit samples stay a loud boundary
    with pytest.raises(NotImplementedError):
        px._tiff_unpredict(bytes(8), 4, 1, bpc=16)
