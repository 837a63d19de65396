"""Kafka wire-path compression codecs, dependency-free.

The reference supports none/gzip/snappy/lz4/zstd and DEFAULTS to lz4
(/root/reference/src/main/java/br/com/sandbox/kafka/util/
ConfiguracaoKafka.java:112-118), so the r6 connector-less fallback
(io_kafka.read_kafka_tail_n -> wire source) must decode what a real
broker actually serves. This module implements the two formats whose
specs are public and small enough to carry in pure Python:

- **LZ4 frame** (the format Kafka record-batch v2 uses for codec id 3):
  block compress/decompress per the LZ4 block spec (token / literal /
  match copy with overlap), frame wrap/unwrap per the LZ4 frame spec
  (magic 0x184D2204, FLG/BD descriptor, xxHash32 header checksum,
  independent <=64 KiB blocks, end mark). xxHash32 is implemented here
  too (header + content checksums need it).
- **Snappy, xerial-framed** (codec id 2): raw-block compress/decompress
  per the Snappy format description (varint length preamble, literal /
  copy1 / copy2 / copy4 elements), plus the xerial stream framing the
  Java client's SnappyOutputStream writes (magic ``\\x82SNAPPY\\x00``,
  BE version/compat words, BE-length-prefixed chunks).
- **zstd** (codec id 4): no stdlib or hand-rolled path — gated on
  pyarrow's bundled zstd. The frame header is parsed here only to
  recover Frame_Content_Size so pyarrow's size-demanding decompress
  can run; absent a content size the frame is decompressed by doubling
  a size guess (bounded).

Every codec is cross-validated in tests against pyarrow's bundled C
implementations (compress ours -> decompress theirs and vice versa),
so the bytes are the real formats, not a private dialect.

Scale note: these pure-Python paths exist for the no-JVM-connector
fallback and loopback tests. On a cluster the JVM Kafka connector
decompresses batches natively (SCALE.md); nothing here sits in the
100 TB hot path.
"""

from __future__ import annotations

import struct

try:  # pickle-by-value: executors don't need the repo on PYTHONPATH
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


# ------------------------------------------------------------ xxHash32
_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (public algorithm, xxhash.com spec) — the checksum the
    LZ4 frame format mandates for its header and content checks."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        lanes = (n // 16) * 4
        words = struct.unpack_from(f"<{lanes}I", data)
        for j in range(0, lanes, 4):
            v1 = (_rotl32((v1 + words[j] * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + words[j + 1] * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + words[j + 2] * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + words[j + 3] * _P2) & _M32, 13) * _P1) & _M32
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
        i = lanes * 4
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (w,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + w * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ------------------------------------------------------------ LZ4 block
_LZ4_MIN_MATCH = 4
# spec: the last match must start >= 12 bytes before block end, and the
# last 5 bytes are always literals
_LZ4_MFLIMIT = 12


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy single-pass LZ4 block compressor (hash table on 4-byte
    windows). Always emits spec-valid output; ratio is within a few
    percent of the reference compressor on text."""
    n = len(src)
    out = bytearray()
    anchor = 0
    if n >= _LZ4_MFLIMIT + 1:
        table: dict[bytes, int] = {}
        i = 0
        match_limit = n - _LZ4_MFLIMIT
        literal_end = n - 5
        while i <= match_limit:
            h = src[i : i + 4]
            prev = table.get(h)
            table[h] = i
            if prev is not None and i - prev <= 0xFFFF:
                # extend the match forward (never into the last 5 bytes)
                mlen = 4
                while (
                    i + mlen < literal_end
                    and src[prev + mlen] == src[i + mlen]
                ):
                    mlen += 1
                _lz4_emit(out, src, anchor, i, i - prev, mlen)
                i += mlen
                anchor = i
            else:
                i += 1
    # trailing literals (always the final sequence: no match part)
    lit_len = n - anchor
    token = min(lit_len, 15) << 4
    out.append(token)
    if lit_len >= 15:
        _lz4_emit_len(out, lit_len - 15)
    out += src[anchor:]
    return bytes(out)


def _lz4_emit_len(out: bytearray, rest: int) -> None:
    while rest >= 255:
        out.append(255)
        rest -= 255
    out.append(rest)


def _lz4_emit(
    out: bytearray, src: bytes, anchor: int, i: int, offset: int, mlen: int
) -> None:
    lit_len = i - anchor
    m = mlen - _LZ4_MIN_MATCH
    out.append((min(lit_len, 15) << 4) | min(m, 15))
    if lit_len >= 15:
        _lz4_emit_len(out, lit_len - 15)
    out += src[anchor:i]
    out += struct.pack("<H", offset)
    if m >= 15:
        _lz4_emit_len(out, m - 15)


def lz4_block_decompress(src: bytes, max_size: int = 1 << 30) -> bytes:
    """LZ4 block decode (token / literals / offset+match with overlap
    copy). Malformed input raises ValueError; output is capped at
    ``max_size`` so hostile frames can't balloon memory."""
    out = bytearray()
    _lz4_decompress_into(src, out, max_size, 0)
    return bytes(out)


def _lz4_decompress_into(
    src: bytes, out: bytearray, max_size: int, base: int
) -> None:
    """Decode one block appending to ``out``. ``base`` is the index in
    ``out`` where this block starts: 0 for an independent block; for
    LINKED frame blocks (block-independence flag off — what pyarrow and
    lz4 CLI write by default) the already-decoded prior blocks sit
    below ``base`` and matches may reach up to 64 KiB into them."""
    i, n = 0, len(src)
    try:
        while i < n:
            token = src[i]
            i += 1
            lit = token >> 4
            if lit == 15:
                while True:
                    b = src[i]
                    i += 1
                    lit += b
                    if b != 255:
                        break
            if lit:
                if i + lit > n:
                    raise ValueError("literal run past end of block")
                out += src[i : i + lit]
                i += lit
            if i >= n:
                break  # last sequence carries no match
            offset = src[i] | (src[i + 1] << 8)
            i += 2
            if offset == 0 or offset > len(out):
                # offsets below `base` are valid linked-block history,
                # so the bound is the whole accumulated output
                raise ValueError(f"bad match offset {offset}")
            mlen = token & 0xF
            if mlen == 15:
                while True:
                    b = src[i]
                    i += 1
                    mlen += b
                    if b != 255:
                        break
            mlen += _LZ4_MIN_MATCH
            if len(out) + mlen > max_size:
                raise ValueError("decompressed size exceeds cap")
            start = len(out) - offset
            if offset >= mlen:
                out += out[start : start + mlen]
            else:  # overlap: the copied region repeats
                seg = out[start:]
                reps = mlen // offset + 1
                out += (seg * reps)[:mlen]
    except IndexError as e:
        raise ValueError("truncated LZ4 block") from e


# ------------------------------------------------------------ LZ4 frame
_LZ4_MAGIC = 0x184D2204
_LZ4_BLOCK_MAX = 1 << 16  # 64 KiB blocks (BD code 4), Kafka's choice


def lz4_frame_compress(data: bytes) -> bytes:
    """LZ4 frame: FLG = version 01 + independent blocks, BD = 64 KiB
    max block, xxh32 header checksum, per-block compressed-or-stored
    choice, end mark. No content size/checksum (Kafka's writer omits
    them too)."""
    flg = (1 << 6) | (1 << 5)  # version 01, block independence
    bd = 4 << 4  # 64 KiB max block size
    desc = bytes([flg, bd])
    out = bytearray(struct.pack("<I", _LZ4_MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for pos in range(0, len(data), _LZ4_BLOCK_MAX):
        block = data[pos : pos + _LZ4_BLOCK_MAX]
        comp = lz4_block_compress(block)
        if len(comp) < len(block):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # store uncompressed, high bit set
            out += struct.pack("<I", len(block) | 0x80000000)
            out += block
    out += struct.pack("<I", 0)  # end mark
    return bytes(out)


def lz4_frame_decompress(data: bytes, max_size: int = 1 << 30) -> bytes:
    """LZ4 frame decode: header (verifying the xxh32 HC byte), blocks
    (compressed or stored), end mark; skips optional block/content
    checksums and dictionary id per the spec flags."""
    try:
        (magic,) = struct.unpack_from("<I", data, 0)
        if magic != _LZ4_MAGIC:
            raise ValueError(f"not an LZ4 frame (magic {magic:#x})")
        flg, _bd = data[4], data[5]
        if (flg >> 6) != 1:
            raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
        pos = 6
        desc_end = 6
        if flg & 0x08:  # content size
            desc_end += 8
        if flg & 0x01:  # dictionary id
            desc_end += 4
        pos = desc_end
        hc = data[pos]
        pos += 1
        if hc != ((xxh32(data[4:desc_end]) >> 8) & 0xFF):
            raise ValueError("LZ4 frame header checksum mismatch")
        block_checksums = bool(flg & 0x10)
        out = bytearray()
        while True:
            (size,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if size == 0:  # end mark
                break
            stored = bool(size & 0x80000000)
            size &= 0x7FFFFFFF
            block = data[pos : pos + size]
            if len(block) != size:
                raise ValueError("truncated LZ4 frame block")
            pos += size
            if block_checksums:
                (bc,) = struct.unpack_from("<I", data, pos)
                pos += 4
                if bc != xxh32(block):
                    raise ValueError("LZ4 block checksum mismatch")
            if stored:
                out += block
            else:  # linked-block matches may reach into prior blocks
                _lz4_decompress_into(block, out, max_size, len(out))
            if len(out) > max_size:
                raise ValueError("decompressed size exceeds cap")
        if flg & 0x04:  # content checksum
            (cc,) = struct.unpack_from("<I", data, pos)
            if cc != xxh32(bytes(out)):
                raise ValueError("LZ4 content checksum mismatch")
        return bytes(out)
    except (struct.error, IndexError) as e:
        raise ValueError("truncated LZ4 frame") from e


# ------------------------------------------------------------- Snappy
def _uvarint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def snappy_block_compress(src: bytes) -> bytes:
    """Greedy Snappy raw-block compressor: literal + copy-with-2-byte-
    offset elements (copy2 covers every offset the format allows up to
    65535; matches beyond 64 bytes split into multiple copies)."""
    n = len(src)
    out = bytearray()
    _uvarint(out, n)
    anchor = 0
    if n >= 4:
        table: dict[bytes, int] = {}
        i = 0
        while i + 4 <= n:
            h = src[i : i + 4]
            prev = table.get(h)
            table[h] = i
            if prev is not None and i - prev <= 0xFFFF:
                mlen = 4
                while i + mlen < n and src[prev + mlen] == src[i + mlen]:
                    mlen += 1
                _snappy_literal(out, src[anchor:i])
                offset = i - prev
                rest = mlen
                while rest >= 4:
                    # keep the remainder out of 1..3 (too short to copy)
                    chunk = 60 if 64 < rest < 68 else min(rest, 64)
                    # copy2: tag 0b10, len-1 in bits 2-7, LE16 offset
                    out.append(((chunk - 1) << 2) | 0x02)
                    out += struct.pack("<H", offset)
                    rest -= chunk
                # a 1-3 byte tail rejoins the literal stream
                i += mlen - rest
                anchor = i
            else:
                i += 1
    _snappy_literal(out, src[anchor:])
    return bytes(out)


def _snappy_literal(out: bytearray, lit: bytes) -> None:
    pos = 0
    n = len(lit)
    while pos < n:
        chunk = lit[pos : pos + (1 << 24)]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out.append(ln)
        elif ln < (1 << 16):
            out.append(61 << 2)
            out += struct.pack("<H", ln)
        else:
            out.append(62 << 2)
            out += struct.pack("<I", ln)[:3]
        out += chunk
        pos += len(chunk)


def snappy_block_decompress(src: bytes, max_size: int = 1 << 30) -> bytes:
    """Snappy raw-block decode per the format description: varint
    preamble then literal/copy elements; overlap copies repeat."""
    i, n = 0, len(src)
    # varint uncompressed length
    expect = shift = 0
    try:
        while True:
            b = src[i]
            i += 1
            expect |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if expect > max_size:
            raise ValueError("snappy decompressed size exceeds cap")
        out = bytearray()
        while i < n:
            tag = src[i]
            i += 1
            kind = tag & 0x03
            if kind == 0:  # literal
                ln = tag >> 2
                if ln >= 60:
                    extra = ln - 59
                    ln = int.from_bytes(src[i : i + extra], "little")
                    i += extra
                ln += 1
                if i + ln > n:
                    raise ValueError("snappy literal past end")
                out += src[i : i + ln]
                i += ln
                continue
            if kind == 1:  # copy, 11-bit offset, 3-bit len
                ln = ((tag >> 2) & 0x07) + 4
                offset = ((tag >> 5) << 8) | src[i]
                i += 1
            elif kind == 2:  # copy, 2-byte LE offset
                ln = (tag >> 2) + 1
                offset = src[i] | (src[i + 1] << 8)
                i += 2
            else:  # copy, 4-byte LE offset
                ln = (tag >> 2) + 1
                (offset,) = struct.unpack_from("<I", src, i)
                i += 4
            if offset == 0 or offset > len(out):
                raise ValueError(f"bad snappy copy offset {offset}")
            start = len(out) - offset
            if offset >= ln:
                out += out[start : start + ln]
            else:
                seg = out[start:]
                out += (seg * (ln // offset + 1))[:ln]
        if len(out) != expect:
            raise ValueError(
                f"snappy length mismatch: {len(out)} != {expect}"
            )
        return bytes(out)
    except IndexError as e:
        raise ValueError("truncated snappy block") from e


_XERIAL_MAGIC = b"\x82SNAPPY\x00"


def snappy_xerial_compress(data: bytes, chunk: int = 32 << 10) -> bytes:
    """Xerial stream framing (what the Java client's SnappyOutputStream
    writes for Kafka batches): magic + BE version/compat + BE-length-
    prefixed raw snappy chunks of <=32 KiB input each."""
    out = bytearray(_XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)
    for pos in range(0, len(data), chunk):
        block = snappy_block_compress(data[pos : pos + chunk])
        out += struct.pack(">i", len(block))
        out += block
    return bytes(out)


def snappy_xerial_decompress(data: bytes, max_size: int = 1 << 30) -> bytes:
    """Decode xerial-framed snappy; bare raw-block input (some clients
    skip the framing) is handled by falling back to a single block."""
    if not data.startswith(_XERIAL_MAGIC):
        return snappy_block_decompress(data, max_size)
    pos = len(_XERIAL_MAGIC) + 8  # skip version/compat
    out = bytearray()
    try:
        while pos < len(data):
            (ln,) = struct.unpack_from(">i", data, pos)
            pos += 4
            if ln < 0 or pos + ln > len(data):
                raise ValueError("truncated xerial chunk")
            out += snappy_block_decompress(
                data[pos : pos + ln], max_size - len(out)
            )
            pos += ln
        return bytes(out)
    except struct.error as e:
        raise ValueError("truncated xerial frame") from e


# -------------------------------------------------------------- zstd
def zstd_compress(data: bytes) -> bytes:
    """zstd: pyarrow's bundled libzstd when importable (the fast path —
    real entropy coding), else the stdlib STORE-MODE encoder in
    ``zstd_stdlib`` (spec-valid frame of raw blocks + xxh64 checksum;
    any conformant zstd decodes it). The r7 "zstd needs pyarrow"
    boundary is closed — both directions always work."""
    try:
        import pyarrow as pa
    except ImportError:
        from teste_carga_avro_vs_json_spark.sources import zstd_stdlib

        return zstd_stdlib.compress(data)
    return pa.Codec("zstd").compress(data, asbytes=True)


def _zstd_content_size(data: bytes) -> int | None:
    """Parse a zstd frame header (RFC 8878 §3.1.1) far enough to read
    Frame_Content_Size, if present."""
    if len(data) < 5 or struct.unpack_from("<I", data, 0)[0] != 0xFD2FB528:
        return None
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[fhd & 0x03]  # dictionary id field
    try:
        if fcs_flag == 0:
            return data[pos] if single_segment else None
        if fcs_flag == 1:
            return struct.unpack_from("<H", data, pos)[0] + 256
        if fcs_flag == 2:
            return struct.unpack_from("<I", data, pos)[0]
        return struct.unpack_from("<Q", data, pos)[0]
    except (struct.error, IndexError):
        return None


def zstd_decompress(data: bytes, max_size: int = 1 << 30) -> bytes:
    """zstd via pyarrow (fast path). pyarrow demands the decompressed
    size, so read Frame_Content_Size from the frame header; frames
    without one (some streaming writers) fall back to a doubling size
    guess. Without pyarrow: the full pure-stdlib RFC 8878 decoder
    (``zstd_stdlib.decompress`` — Huffman/FSE, pinned against libzstd
    output across levels 1-22 in pytest)."""
    try:
        import pyarrow as pa
    except ImportError:
        from teste_carga_avro_vs_json_spark.sources import zstd_stdlib

        return zstd_stdlib.decompress(data, max_size)
    codec = pa.Codec("zstd")
    size = _zstd_content_size(data)
    if size is not None:
        if size > max_size:
            raise ValueError("zstd decompressed size exceeds cap")
        return codec.decompress(data, size, asbytes=True)
    guess = 1 << 16
    while guess <= max_size:
        try:
            return codec.decompress(data, guess, asbytes=True)
        except Exception:  # noqa: BLE001 - buffer-too-small surfaces variously
            guess <<= 2
    raise ValueError("zstd frame without content size exceeds cap")


# ------------------------------------------------- Kafka codec registry
# attributes bits 0-2 of a v2 record batch -> (compress, decompress)
KAFKA_CODECS: dict[int, str] = {0: "none", 1: "gzip", 2: "snappy", 3: "lz4", 4: "zstd"}
KAFKA_CODEC_IDS = {v: k for k, v in KAFKA_CODECS.items()}


def compress(codec: str, data: bytes) -> bytes:
    if codec == "gzip":
        import gzip

        return gzip.compress(data)
    if codec == "snappy":
        return snappy_xerial_compress(data)
    if codec == "lz4":
        return lz4_frame_compress(data)
    if codec == "zstd":
        return zstd_compress(data)
    raise NotImplementedError(f"unsupported compression codec {codec!r}")


def decompress(codec: str, data: bytes) -> bytes:
    if codec == "gzip":
        import gzip

        return gzip.decompress(data)
    if codec == "snappy":
        return snappy_xerial_decompress(data)
    if codec == "lz4":
        return lz4_frame_decompress(data)
    if codec == "zstd":
        return zstd_decompress(data)
    raise NotImplementedError(f"unsupported compression codec {codec!r}")
