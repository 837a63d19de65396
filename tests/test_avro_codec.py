"""Round-trip property tests for the pure-Python Avro codec
(SURVEY.md §5 item 2: empty dados, versao default, unicode)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from teste_carga_avro_vs_json_spark.functions.avro_codec import (
    decode_mensagem,
    encode_mensagem,
)

registro = st.fixed_dictionaries(
    {
        "indice": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "texto": st.text(max_size=120),
        "numero": st.floats(allow_nan=False),  # NaN breaks == comparison only
        "timestamp": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "uuid": st.text(max_size=40),
    }
)

mensagem = st.fixed_dictionaries(
    {
        "id": st.text(max_size=50),
        "timestamp": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "sequencia": st.integers(min_value=0, max_value=2**62),
        "dados": st.lists(registro, max_size=8),
        "versao": st.sampled_from(["1.0", "2.1", ""]),
    }
)


@given(mensagem)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(msg):
    assert decode_mensagem(encode_mensagem(msg)) == msg


def test_empty_dados():
    msg = {"id": "", "timestamp": 0, "sequencia": 0, "dados": [], "versao": "1.0"}
    assert decode_mensagem(encode_mensagem(msg)) == msg


def test_unicode_texto():
    msg = {
        "id": "x",
        "timestamp": 1,
        "sequencia": 2,
        "dados": [
            {"indice": 0, "texto": "çãé☃日本語", "numero": -0.0, "timestamp": -5, "uuid": "u"}
        ],
        "versao": "1.0",
    }
    assert decode_mensagem(encode_mensagem(msg)) == msg


def test_golden_bytes():
    """Hand-derived golden: Avro binary is positional + zigzag varint.

    'ab' -> len 2 => varint 0x04, bytes 0x61 0x62; long 1 -> 0x02;
    long 2 -> 0x04; empty array -> 0x00; '1.0' -> 0x06 '1.0'.
    (Spec: Avro 1.12 'Binary encoding'; matches the generated coder
    /root/reference/.../avro/MensagemCarga.java:604-628.)
    """
    msg = {"id": "ab", "timestamp": 1, "sequencia": 2, "dados": [], "versao": "1.0"}
    assert encode_mensagem(msg) == bytes(
        [0x04, 0x61, 0x62, 0x02, 0x04, 0x00, 0x06, 0x31, 0x2E, 0x30]
    )


def test_negative_zigzag():
    msg = {"id": "", "timestamp": -1, "sequencia": 0, "dados": [], "versao": ""}
    enc = encode_mensagem(msg)
    # zigzag(-1) == 1 -> single byte 0x01 after the empty id (0x00)
    assert enc[1] == 0x01
    assert decode_mensagem(enc) == msg


def test_multiblock_array_decode():
    """Writers may split arrays into multiple blocks; decoder must
    reassemble (Avro spec 'Data Serialization: complex types')."""
    from teste_carga_avro_vs_json_spark.functions.avro_codec import (
        _write_long,
        _write_string,
    )
    import struct as _struct

    buf = bytearray()
    _write_string(buf, "id1")
    _write_long(buf, 10)
    _write_long(buf, 20)
    reg = {"indice": 7, "texto": "t", "numero": 1.5, "timestamp": 3, "uuid": "u"}
    for _ in range(2):  # two blocks of one item each
        _write_long(buf, 1)
        _write_long(buf, reg["indice"])
        _write_string(buf, reg["texto"])
        buf += _struct.pack("<d", reg["numero"])
        _write_long(buf, reg["timestamp"])
        _write_string(buf, reg["uuid"])
    buf.append(0)
    _write_string(buf, "1.0")
    out = decode_mensagem(bytes(buf))
    assert out["dados"] == [reg, reg]


@given(st.lists(mensagem, max_size=12), st.sampled_from(["null", "deflate"]))
@settings(max_examples=50, deadline=None)
def test_ocf_roundtrip_property(msgs, codec):
    from teste_carga_avro_vs_json_spark.functions.avro_ocf import (
        read_ocf,
        write_ocf,
    )

    blob = write_ocf([encode_mensagem(m) for m in msgs], codec=codec,
                     block_records=5)
    assert read_ocf(blob) == msgs


def test_ocf_rejects_bad_magic():
    import pytest

    from teste_carga_avro_vs_json_spark.functions.avro_ocf import read_ocf

    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"PK\x03\x04 not avro")
