"""Vectorized (avro_vec) vs scalar (avro_codec) codec equivalence.

The scalar codec is the reference implementation (golden-byte tested in
test_avro_codec.py); the Arrow-native fast path must be byte-identical
on encode and value-identical on decode — including the full Avro
array-block grammar the scalar decoder handles (multi-block, negative
counts with byte-size prefixes) and Arrow slice offsets.
"""

import struct

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from teste_carga_avro_vs_json_spark.functions import avro_vec
from teste_carga_avro_vs_json_spark.functions.avro_codec import (
    _write_long,
    _write_string,
    decode_mensagem,
    encode_mensagem,
)

MSG_PA = pa.struct(
    [
        pa.field("id", pa.string()),
        pa.field("timestamp", pa.int64()),
        pa.field("sequencia", pa.int64()),
        pa.field(
            "dados",
            pa.list_(
                pa.struct(
                    [
                        pa.field("indice", pa.int32()),
                        pa.field("texto", pa.string()),
                        pa.field("numero", pa.float64()),
                        pa.field("timestamp", pa.int64()),
                        pa.field("uuid", pa.string()),
                    ]
                )
            ),
        ),
        pa.field("versao", pa.string()),
    ]
)

registro = st.fixed_dictionaries(
    {
        "indice": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "texto": st.text(max_size=120),
        "numero": st.floats(allow_nan=False),
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


@given(st.lists(mensagem, max_size=20))
@settings(max_examples=100, deadline=None)
def test_encode_batch_matches_scalar(msgs):
    arr = pa.array(msgs, type=MSG_PA)
    assert avro_vec.encode_batch(arr).to_pylist() == [
        encode_mensagem(m) for m in msgs
    ]


@given(st.lists(mensagem, max_size=20))
@settings(max_examples=100, deadline=None)
def test_decode_batch_matches_scalar(msgs):
    enc = pa.array([encode_mensagem(m) for m in msgs], type=pa.binary())
    assert avro_vec.decode_batch(enc).to_pylist() == msgs


def test_sliced_input_respects_arrow_offsets():
    msgs = [
        {
            "id": f"m{i}",
            "timestamp": i,
            "sequencia": i,
            "dados": [
                {
                    "indice": j,
                    "texto": f"t{i}-{j}",
                    "numero": i + j / 8,
                    "timestamp": -i,
                    "uuid": f"u{j}",
                }
                for j in range(i % 4)
            ],
            "versao": "1.0",
        }
        for i in range(50)
    ]
    arr = pa.array(msgs, type=MSG_PA).slice(7, 31)
    assert avro_vec.encode_batch(arr).to_pylist() == [
        encode_mensagem(m) for m in msgs[7:38]
    ]


def _reg_bytes(buf: bytearray, j: int) -> None:
    _write_long(buf, j)
    _write_string(buf, f"t{j}")
    buf += struct.pack("<d", j * 1.5)
    _write_long(buf, 9)
    _write_string(buf, f"u{j}")


def test_decode_multiblock_and_negative_count():
    """Avro writers may split arrays into blocks and prefix negative
    counts with a byte size (Avro spec 'Data Serialization: arrays');
    the vectorized decoder must agree with the scalar one."""
    buf = bytearray()
    _write_string(buf, "mb")
    _write_long(buf, 7)
    _write_long(buf, 8)
    _write_long(buf, 1)  # block 1: one item
    _reg_bytes(buf, 0)
    blk = bytearray()
    _reg_bytes(blk, 1)
    _reg_bytes(blk, 2)
    _write_long(buf, -2)  # block 2: negative count + byte size
    _write_long(buf, len(blk))
    buf += blk
    _write_long(buf, 0)  # terminator
    _write_string(buf, "9.9")
    plain = encode_mensagem(
        {
            "id": "p",
            "timestamp": 1,
            "sequencia": 2,
            "dados": [],
            "versao": "1.0",
        }
    )
    out = avro_vec.decode_batch(
        pa.array([bytes(buf), plain], type=pa.binary())
    ).to_pylist()
    assert out[0] == decode_mensagem(bytes(buf))
    assert len(out[0]["dados"]) == 3
    assert out[1]["dados"] == []


@pytest.mark.parametrize("n", [0, 1])
def test_tiny_batches(n):
    msgs = [
        {"id": "", "timestamp": 0, "sequencia": 0, "dados": [], "versao": ""}
    ][:n]
    arr = pa.array(msgs, type=MSG_PA)
    assert avro_vec.encode_batch(arr).to_pylist() == [
        encode_mensagem(m) for m in msgs
    ]
    enc = pa.array([encode_mensagem(m) for m in msgs], type=pa.binary())
    assert avro_vec.decode_batch(enc).to_pylist() == msgs


def test_tall_message_batch_dispatches_to_scalar_parser():
    """Batches averaging > _TALL_MSG_BYTES per message take the
    row-serial fallback (the vectorized state machine's per-rank numpy
    cost loses on tall messages — measured 22x at 3 msgs x 8000 regs);
    results must stay value-identical through the same entry point."""
    msgs = [
        {
            "id": f"m{i}",
            "timestamp": i,
            "sequencia": i,
            "dados": [
                {
                    "indice": j,
                    "texto": "x" * 40,
                    "numero": i + j / 8,
                    "timestamp": j,
                    "uuid": f"u{i}-{j}",
                }
                for j in range(700)
            ],
            "versao": "1.0",
        }
        for i in range(3)
    ]
    enc_bytes = [encode_mensagem(m) for m in msgs]
    # guard: this fixture really is on the tall side of the dispatch
    assert sum(len(b) for b in enc_bytes) > 3 * avro_vec._TALL_MSG_BYTES
    enc = pa.array(enc_bytes, type=pa.binary())
    assert avro_vec.decode_batch(enc).to_pylist() == msgs
    # ...and a short batch still takes the vectorized path with the
    # same answer (crossover is behavioral only, never semantic)
    short = pa.array(enc_bytes[:1], type=pa.binary()).slice(0, 1)
    assert avro_vec.decode_batch(short).to_pylist() == msgs[:1]
