"""PDF → text extraction — the crawl-ingest stage after HTML and WARC
(r8 VERDICT order #7): PDFs are the most common non-HTML payload in a
web crawl, and the pipeline could not read them. The reference engine
has no text operators (SURVEY.md §2.2); this is extension surface.

Pure-stdlib subset of ISO 32000 (zlib IS the stdlib), same engine
shape as :mod:`html_extract`: ONE Arrow-batched pandas-UDF projection
per document — scan-local, zero shuffle, no partitioning demands, so
it parallelizes embarrassingly at 100 TB.

Supported (enough for the dominant text-bearing crawl PDFs and for
exact round-trip pins over :func:`build_pdf`):

- classic cross-reference TABLES with /Prev incremental-update chains
  (newest section wins per object number), PDF 1.5 cross-reference
  STREAMS (/W-packed rows behind Flate + PNG predictors, /Index
  subsections, /Prev chains, hybrid /XRefStm) and /Type /ObjStm
  object streams (type-2 entries) — the layout modern crawl PDFs
  actually use;
- FlateDecode, LZWDecode (the TIFF-variant LZW with EarlyChange,
  pinned against the ISO 32000 worked example) and ASCIIHexDecode
  stream filters (single or chained);
- the page tree walk (/Root → /Pages → /Kids, cycle-guarded);
- text operators: BT/ET, Tj, TJ (kerning-aware: a displacement ≤
  ``TJ_SPACE_THRESHOLD`` thousandths of an em inserts a space), the
  quote operators ' and ", line moves Td/TD/T*/Tm (each starts a new
  output line when text is pending);
- literal strings (all escapes, octal, balanced parens, continuation
  lines) and hex strings, decoded as Latin-1 (≈ PDFDocEncoding for
  the printable range) for simple fonts;
- Type0 composite fonts with /Identity-H(V) encoding + a /ToUnicode
  CMap (bfchar + both bfrange forms, UTF-16BE destinations incl.
  surrogate pairs) — the layout modern writers with embedded subset
  fonts emit, which is to say essentially all current crawl PDFs and
  all CJK; ``Tf`` switches the active font decoder mid-stream, and
  unmapped CIDs surface as U+FFFD (visible, never silently dropped).

Encrypted files: the FULL standard security handler — RC4 at
revisions 2/3 (/V 1/2, r10), AES-128 at revision 4 (/V 4 crypt
filters: /AESV2, plus /V2-RC4 and /Identity per-class routing via
/StmF //StrF), and AES-256 at revisions 5/6 (/V 5 /AESV3, including
the ISO 32000-2 Algorithm 2.B hardened hash for R6). Key derivation
per ISO 32000 §7.6 Algorithms 1-6 / 2.A-2.B, /U-authenticated BEFORE
any object is touched (wrong password raises
:class:`PdfPasswordError`, a PdfFormatError, so the Spark error
column absorbs it); the empty user password — the common crawl case
— is the default; for V5 the /Perms blob is additionally validated
against the recovered file key. The RC4 primitive is
cross-implementation pinned against the JVM's ARCFOUR cipher, AES
comes from ``functions/aes_stdlib.py`` (FIPS-197 vectors +
javax.crypto pins, both directions), and ``build_pdf(encrypt=...)``
is the exact-round-trip builder twin for every revision.

Documented boundaries (raise, never guess): non-Standard security
handlers, public-key (/Recipients) encryption,
DCT/JBIG2 filters and sub-byte/16-bit samples under the TIFF
predictor (8-bit predictor-2 rows ARE decoded — pinned against the
JDK TIFF reader),
and Type0 fonts WITHOUT a ToUnicode CMap or with a non-Identity
encoding (their strings are CID sequences whose meaning lives in an
embedded CMap we cannot reconstruct; extracting them as bytes would
be silently wrong, so those pages raise ``NotImplementedError``).

Decoder-hardening rule (tests/test_fuzz_decoders.py — this module is
in the fuzz table): arbitrary bytes raise :class:`PdfFormatError` or
``NotImplementedError`` only; inflate output is capped BEFORE
allocation (``MAX_STREAM_BYTES``), object/page counts and page-tree
depth are capped, and every offset/length read from the file is
bounds-checked.

No SQL oracle: DuckDB has no PDF parser — pinned by exact round-trips
over :func:`build_pdf` goldens (the documented convention for
non-relational codecs).
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


class PdfFormatError(ValueError):
    """Malformed or out-of-subset PDF input."""


class PdfPasswordError(PdfFormatError):
    """Encrypted document whose user password did not authenticate."""


#: inflate bomb cap — applied per stream, BEFORE allocation
MAX_STREAM_BYTES = 64 << 20
MAX_OBJECTS = 200_000
MAX_PAGES = 50_000
MAX_TREE_DEPTH = 64
#: TJ displacement (thousandths of em, negative = rightward gap) at or
#: below which a space is inserted — the pdfminer-class heuristic,
#: fixed and documented so extraction stays deterministic.
TJ_SPACE_THRESHOLD = -180

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Name(str):
    """A PDF name object (distinct from a string object)."""


class _Ref(tuple):
    """Indirect reference (num, gen)."""


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos
        self.n = len(data)

    def skip_ws(self) -> None:
        while self.p < self.n:
            c = self.d[self.p]
            if c in _WS:
                self.p += 1
            elif c == 0x25:  # % comment to EOL
                while self.p < self.n and self.d[self.p] not in b"\r\n":
                    self.p += 1
            else:
                return

    def _regular_run(self) -> bytes:
        start = self.p
        while (
            self.p < self.n
            and self.d[self.p] not in _WS
            and self.d[self.p] not in _DELIM
        ):
            self.p += 1
        if self.p == start:
            raise PdfFormatError(
                f"lexer stuck at byte {self.p} (0x{self.d[self.p]:02x})"
            )
        return self.d[start : self.p]

    def _name(self) -> _Name:
        self.p += 1  # "/"
        start = self.p
        while (
            self.p < self.n
            and self.d[self.p] not in _WS
            and self.d[self.p] not in _DELIM
        ):
            self.p += 1
        raw = self.d[start : self.p]
        # #xx hex escapes in names (ISO 32000 §7.3.5)
        if b"#" in raw:
            out = bytearray()
            i = 0
            while i < len(raw):
                if raw[i : i + 1] == b"#" and i + 2 < len(raw) + 1:
                    try:
                        out.append(int(raw[i + 1 : i + 3], 16))
                        i += 3
                        continue
                    except ValueError:
                        pass
                out.append(raw[i])
                i += 1
            raw = bytes(out)
        return _Name(raw.decode("latin-1"))

    def _literal_string(self) -> bytes:
        self.p += 1  # "("
        out = bytearray()
        depth = 1
        while self.p < self.n:
            c = self.d[self.p]
            if c == 0x5C:  # backslash
                self.p += 1
                if self.p >= self.n:
                    break
                e = self.d[self.p]
                if e in b"nrtbf":
                    out.append(
                        {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e]
                    )
                    self.p += 1
                elif e in b"()\\":
                    out.append(e)
                    self.p += 1
                elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                    oct_digits = bytearray()
                    while (
                        len(oct_digits) < 3
                        and self.p < self.n
                        and 0x30 <= self.d[self.p] <= 0x37
                    ):
                        oct_digits.append(self.d[self.p])
                        self.p += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.p += 1
                    if (
                        e == 0x0D
                        and self.p < self.n
                        and self.d[self.p] == 0x0A
                    ):
                        self.p += 1
                else:
                    out.append(e)
                    self.p += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.p += 1
            elif c == 0x29:
                depth -= 1
                self.p += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.p += 1
        raise PdfFormatError("unterminated literal string")

    def _hex_string(self) -> bytes:
        self.p += 1  # "<"
        digits = bytearray()
        while self.p < self.n and self.d[self.p] != 0x3E:
            c = self.d[self.p]
            if c not in _WS:
                digits.append(c)
            self.p += 1
        if self.p >= self.n:
            raise PdfFormatError("unterminated hex string")
        self.p += 1  # ">"
        if len(digits) % 2:
            digits.append(0x30)
        try:
            return bytes.fromhex(digits.decode("ascii"))
        except (UnicodeDecodeError, ValueError) as e:
            raise PdfFormatError(f"bad hex string: {e}") from e

    def value(self, depth: int = 0):
        """One object value (scalar / name / string / array / dict /
        indirect reference)."""
        if depth > 96:
            raise PdfFormatError("object nesting too deep")
        self.skip_ws()
        if self.p >= self.n:
            raise PdfFormatError("unexpected end of data")
        c = self.d[self.p]
        if c == 0x2F:
            return self._name()
        if c == 0x28:
            return self._literal_string()
        if c == 0x3C:
            if self.d[self.p + 1 : self.p + 2] == b"<":
                self.p += 2
                obj: dict = {}
                while True:
                    self.skip_ws()
                    if self.d[self.p : self.p + 2] == b">>":
                        self.p += 2
                        return obj
                    if self.p >= self.n:
                        raise PdfFormatError("unterminated dictionary")
                    if self.d[self.p] != 0x2F:
                        raise PdfFormatError("dictionary key is not a name")
                    key = self._name()
                    obj[str(key)] = self.value(depth + 1)
            return self._hex_string()
        if c == 0x5B:
            self.p += 1
            arr = []
            while True:
                self.skip_ws()
                if self.p >= self.n:
                    raise PdfFormatError("unterminated array")
                if self.d[self.p] == 0x5D:
                    self.p += 1
                    return arr
                arr.append(self.value(depth + 1))
        run = self._regular_run()
        if run in (b"true", b"false"):
            return run == b"true"
        if run == b"null":
            return None
        # number — or the start of "num gen R" / "num gen obj"
        try:
            if b"." in run or b"e" in run or b"E" in run:
                num = float(run)
                return num
            num = int(run)
        except ValueError as e:
            raise PdfFormatError(f"unexpected token {run[:20]!r}") from e
        save = self.p
        try:
            self.skip_ws()
            gen = int(self._regular_run())
            self.skip_ws()
            if self._regular_run() == b"R":
                return _Ref((num, gen))
        except (PdfFormatError, ValueError):
            pass
        self.p = save  # not "num gen R" — plain number, backtrack
        return num


_OBJ_HEADER_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


# -------------------------------------------- standard security handler
# ISO 32000 §7.6 /Filter /Standard, ALL revisions:
#   R2/R3 (/V 1/2)  — RC4, Algorithms 1-6 (the classic layout);
#   R4    (/V 4)    — crypt filters: /AESV2 (AES-128-CBC, per-object
#                     key salted with b"sAlT"), /V2 (RC4 in crypt-
#                     filter clothing) or /Identity, routed per class
#                     via /StmF //StrF;
#   R5/R6 (/V 5)    — AES-256-CBC with the FILE key directly (no
#                     per-object derivation); R6 authenticates via the
#                     ISO 32000-2 Algorithm 2.B hardened hash, R5 (the
#                     deprecated Adobe ExtensionLevel 3 form) via
#                     plain SHA-256.
# Most crawl /Encrypt files carry an EMPTY user password (encryption
# only gates editing) — that is the default. AES comes from
# functions/aes_stdlib.py (FIPS-197 + javax.crypto pinned).

from ..functions import aes_stdlib as _aes

#: Algorithm 2 step a: the 32-byte password pad (ISO 32000-1 Table 3.2)
_PDF_PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa0108"
    "2e2e00b6d0683e802f0ca9fe6453697a"
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (the cipher the standard handler names ARC4)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(
    password: bytes, o_entry: bytes, p: int, id0: bytes, r: int,
    length_bits: int, metadata_extra: bytes = b"",
) -> bytes:
    """Algorithm 2: the file encryption key. Note the ASYMMETRY with
    Algorithm 3: here the 50 extra R>=3 rounds hash only the first
    key-length bytes of the previous digest. ``metadata_extra`` is the
    R>=4 /EncryptMetadata-false marker (four 0xFF bytes appended
    after the ID)."""
    import hashlib

    key_len = 5 if r == 2 else length_bits // 8
    h = hashlib.md5()
    h.update((password + _PDF_PAD)[:32])
    h.update(o_entry[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    h.update(metadata_extra)
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_len]).digest()
    return digest[:key_len]


def _std_owner_entry(
    owner_pw: bytes, user_pw: bytes, r: int, length_bits: int
) -> bytes:
    """Algorithm 3: the /O entry (RC4 of the padded USER password under
    a key derived from the owner password; R3 re-hashes the FULL digest
    50 times and applies 19 key-XOR-i RC4 rounds)."""
    import hashlib

    key_len = 5 if r == 2 else length_bits // 8
    digest = hashlib.md5((owner_pw + _PDF_PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:key_len]
    o = _rc4(key, (user_pw + _PDF_PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def _std_user_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R3): the /U entry. R3 stores a 16-byte
    value + 16 bytes of padding; only the first 16 compare."""
    import hashlib

    if r == 2:
        return _rc4(file_key, _PDF_PAD)
    u = _rc4(file_key, hashlib.md5(_PDF_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


def _std_object_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: per-object key — MD5(file key + 3 LE bytes of the
    object number + 2 LE bytes of the generation), truncated to
    min(key_len + 5, 16)."""
    import hashlib

    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _std_object_key_aes(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1 for /AESV2: the per-object key additionally salts
    the MD5 with the four bytes b"sAlT" (ISO 32000-1 §7.6.2 step b)."""
    import hashlib

    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + b"sAlT"
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


import functools


@functools.lru_cache(maxsize=256)
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 §7.6.4.3.4 Algorithm 2.B — the R6 hardened password
    hash: iterated SHA-256/384/512 selected by the previous AES-CBC
    output, at least 64 rounds, data-dependent termination. This is a
    deliberate slow-KDF (~2-8 KB CBC per round x >=64 rounds), so an
    R6 document open costs ~0.5 s per derivation — inherent to the
    format, paid once per document, never per object; the lru_cache
    collapses repeat opens of same-password corpora (and builder+
    extractor twins) to one derivation per (password, salt)."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    n = 0
    while True:
        n += 1
        k1 = (password + k + udata) * 64
        e = _aes.cbc_encrypt(k[:16], k[16:32], k1)
        # first 16 bytes of E as a big-endian integer, mod 3
        mod = int.from_bytes(e[:16], "big") % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](
            e
        ).digest()
        if n >= 64 and e[-1] <= n - 32:
            break
    return k[:32]


def _aes_unpad(pt: bytes) -> bytes:
    """RFC 2898-style block padding (ISO 32000-1 §7.6.2: 1-16 bytes,
    each equal to the pad length). Invalid padding is a format error,
    never a silent truncation."""
    if not pt:
        raise PdfFormatError("empty AES plaintext")
    n = pt[-1]
    if not 1 <= n <= 16 or pt[-n:] != bytes([n]) * n:
        raise PdfFormatError("bad AES padding")
    return pt[:-n]


class _Document:
    """Parsed PDF: xref offsets, trailer, lazy object cache."""

    def __init__(self, data: bytes, password: str = ""):
        if not data.startswith(b"%PDF-"):
            raise PdfFormatError("missing %PDF- header")
        self.data = data
        self.offsets: dict[int, int] = {}
        #: objects living in object streams: num -> (objstm_num, index)
        self._in_objstm: dict[int, tuple[int, int]] = {}
        self._objstm_cache: dict[int, tuple[bytes, list[tuple[int, int]], int]] = {}
        self.trailer: dict = {}
        self._cache: dict[int, tuple[object, bytes | None]] = {}
        #: file encryption key once the standard handler authenticates
        self._enc_key: bytes | None = None
        #: per-class crypt-filter methods, each one of
        #: "rc4" | "aesv2" | "aesv3" | "identity"
        self._cfm_stm: str = "rc4"
        self._cfm_str: str = "rc4"
        self._parse_xref_chain()
        if "Encrypt" in self.trailer:
            self._setup_encryption(password)

    def _setup_encryption(self, password: str) -> None:
        """Standard security handler, all revisions: derive the file
        key from the user password and AUTHENTICATE it against /U
        before touching any object — wrong passwords must fail
        loudly, never decrypt to garbage text."""
        enc = self.resolve(self.trailer.get("Encrypt"))
        if not isinstance(enc, dict):
            raise PdfFormatError("/Encrypt is not a dictionary")
        if str(self.resolve(enc.get("Filter", ""))) != "Standard":
            raise NotImplementedError(
                "non-Standard security handlers are out of scope"
            )
        v = int(self.resolve(enc.get("V", 0)) or 0)
        r = int(self.resolve(enc.get("R", 0)) or 0)
        o_entry = self.resolve(enc.get("O"))
        u_entry = self.resolve(enc.get("U"))
        if not isinstance(o_entry, bytes) or not isinstance(u_entry, bytes):
            raise PdfFormatError("/Encrypt missing /O or /U strings")
        p = int(self.resolve(enc.get("P", -1)))
        ids = self.resolve(self.trailer.get("ID")) or []
        id0 = ids[0] if isinstance(ids, list) and ids else b""
        if not isinstance(id0, bytes):
            id0 = b""
        if v in (1, 2) and r in (2, 3):
            self._setup_rc4_classic(enc, o_entry, u_entry, p, id0, r,
                                    password)
        elif v == 4 and r == 4:
            self._setup_v4(enc, o_entry, u_entry, p, id0, password)
        elif v == 5 and r in (5, 6):
            self._setup_v5(enc, u_entry, r, password)
        else:
            raise NotImplementedError(
                f"/Encrypt V={v} R={r} is out of scope (Standard handler "
                "R2-R6 supported; public-key handlers are a boundary)"
            )

    def _setup_rc4_classic(
        self, enc: dict, o_entry: bytes, u_entry: bytes, p: int,
        id0: bytes, r: int, password: str,
    ) -> None:
        """R2/R3: the whole file under one RC4 Algorithm-1 scheme."""
        length = int(self.resolve(enc.get("Length", 40)) or 40)
        if r == 2:
            length = 40
        if length % 8 or not 40 <= length <= 128:
            raise PdfFormatError(f"bad /Encrypt /Length {length}")
        key = _std_file_key(
            password.encode("latin-1"), o_entry, p, id0, r, length
        )
        expect = _std_user_entry(key, id0, r)
        got, want = u_entry[:16], expect[:16]
        if r == 2:
            got, want = u_entry[:32], expect[:32]
        if got != want:
            raise PdfPasswordError(
                "user password did not authenticate against /U"
            )
        self._enc_key = key
        self._cfm_stm = self._cfm_str = "rc4"

    def _parse_crypt_filters(
        self, enc: dict, allowed: tuple[str, ...]
    ) -> tuple[str, str]:
        """/CF + /StmF //StrF routing (ISO 32000-1 §7.6.5): resolve
        each class's named crypt filter to its /CFM method. The
        default filter name is Identity (pass-through)."""
        cf = self.resolve(enc.get("CF")) or {}
        if not isinstance(cf, dict):
            raise PdfFormatError("/CF is not a dictionary")
        cfm_map = {"V2": "rc4", "AESV2": "aesv2", "AESV3": "aesv3",
                   "None": "identity"}

        def method_of(name: str) -> str:
            if name == "Identity":
                return "identity"
            f = self.resolve(cf.get(name))
            if not isinstance(f, dict):
                raise PdfFormatError(
                    f"crypt filter {name!r} is not defined in /CF"
                )
            m = str(self.resolve(f.get("CFM", "None")))
            got = cfm_map.get(m)
            if got is None or got not in allowed:
                raise NotImplementedError(
                    f"crypt filter method {m!r} is out of scope here"
                )
            return got

        stmf = str(self.resolve(enc.get("StmF", "Identity")) or "Identity")
        strf = str(self.resolve(enc.get("StrF", "Identity")) or "Identity")
        return method_of(stmf), method_of(strf)

    def _setup_v4(
        self, enc: dict, o_entry: bytes, u_entry: bytes, p: int,
        id0: bytes, password: str,
    ) -> None:
        """R4 (/V 4): same MD5/RC4 key derivation as R3 plus crypt
        filters — /AESV2 is the common real-world case."""
        length = int(self.resolve(enc.get("Length", 128)) or 128)
        if length % 8 or not 40 <= length <= 128:
            raise PdfFormatError(f"bad /Encrypt /Length {length}")
        self._cfm_stm, self._cfm_str = self._parse_crypt_filters(
            enc, allowed=("rc4", "aesv2", "identity")
        )
        encrypt_metadata = self.resolve(enc.get("EncryptMetadata"))
        extra = b"\xff\xff\xff\xff" if encrypt_metadata is False else b""
        key = _std_file_key(
            password.encode("latin-1"), o_entry, p, id0, 4, length,
            metadata_extra=extra,
        )
        if u_entry[:16] != _std_user_entry(key, id0, 4)[:16]:
            raise PdfPasswordError(
                "user password did not authenticate against /U"
            )
        self._enc_key = key

    def _setup_v5(
        self, enc: dict, u_entry: bytes, r: int, password: str
    ) -> None:
        """R5/R6 (/V 5, AES-256): /U = hash(32) + validation salt(8) +
        key salt(8); the file key is the AES-256-CBC(iv=0) decryption
        of /UE under a hash of (password + key salt). R6 uses the
        Algorithm 2.B hardened hash, R5 plain SHA-256. The /Perms blob
        is validated against the recovered key (its "adb" signature +
        /P echo), catching a corrupted /UE that a wrong-password check
        alone would miss."""
        import hashlib

        if len(u_entry) < 48:
            raise PdfFormatError("/U must be 48 bytes for /V 5")
        ue = self.resolve(enc.get("UE"))
        if not isinstance(ue, bytes) or len(ue) != 32:
            raise PdfFormatError("/UE must be a 32-byte string for /V 5")
        self._cfm_stm, self._cfm_str = self._parse_crypt_filters(
            enc, allowed=("aesv3", "identity")
        )
        pwd = password.encode("utf-8")[:127]
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if r == 5:
            h = hashlib.sha256(pwd + vsalt).digest()
        else:
            h = _hash_2b(pwd, vsalt)
        if h != u_entry[:32]:
            raise PdfPasswordError(
                "user password did not authenticate against /U"
            )
        ik = (
            hashlib.sha256(pwd + ksalt).digest()
            if r == 5
            else _hash_2b(pwd, ksalt)
        )
        file_key = _aes.cbc_decrypt(ik, bytes(16), ue)
        perms = self.resolve(enc.get("Perms"))
        if isinstance(perms, bytes) and len(perms) == 16:
            blob = _aes.ecb_decrypt(file_key, perms)
            if blob[9:12] != b"adb":
                raise PdfFormatError(
                    "/Perms failed to validate against the file key"
                )
        self._enc_key = file_key

    def _decrypt_payload(
        self, data: bytes, num: int, gen: int, cfm: str
    ) -> bytes:
        """One string or stream through the object's crypt filter.
        AES payloads are IV(16) + CBC ciphertext + RFC 2898 padding;
        /AESV2 derives a per-object key (Algorithm 1 + "sAlT"),
        /AESV3 uses the file key directly."""
        if cfm == "identity" or self._enc_key is None:
            return data
        if cfm == "rc4":
            return _rc4(_std_object_key(self._enc_key, num, gen), data)
        if cfm == "aesv2":
            key = _std_object_key_aes(self._enc_key, num, gen)
        else:  # aesv3
            key = self._enc_key
        if data == b"":
            return b""
        if len(data) < 32 or len(data) % 16:
            raise PdfFormatError("bad AES payload length")
        return _aes_unpad(_aes.cbc_decrypt(key, data[:16], data[16:]))

    def _decrypt_value(self, value, num: int, gen: int):
        """Strings inside a directly-stored object go through the
        STRING crypt filter (/StrF); names/numbers/refs are not
        encrypted."""
        if isinstance(value, bytes):
            return self._decrypt_payload(value, num, gen, self._cfm_str)
        if isinstance(value, list):
            return [self._decrypt_value(v, num, gen) for v in value]
        if isinstance(value, dict):
            return {
                k: self._decrypt_value(v, num, gen)
                for k, v in value.items()
            }
        return value

    # -- xref
    def _parse_xref_chain(self) -> None:
        tail = self.data[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfFormatError("startxref not found")
        offset = int(m.group(1))
        seen_sections = set()
        while True:
            if offset in seen_sections:
                raise PdfFormatError("xref /Prev cycle")
            seen_sections.add(offset)
            if len(seen_sections) > 64:
                raise PdfFormatError("xref chain too long")
            if offset < 0 or offset >= len(self.data):
                raise PdfFormatError("xref offset out of bounds")
            lx = _Lexer(self.data, offset)
            lx.skip_ws()
            if self.data[lx.p : lx.p + 4] != b"xref":
                if _OBJ_HEADER_RE.match(self.data, lx.p):
                    # PDF 1.5 cross-reference STREAM section
                    trailer = self._parse_xref_stream_at(lx.p)
                    for k, v in trailer.items():
                        self.trailer.setdefault(k, v)
                    prev = trailer.get("Prev")
                    if prev is None:
                        return
                    if not isinstance(prev, int):
                        raise PdfFormatError("non-integer /Prev")
                    offset = prev
                    continue
                raise PdfFormatError("xref table not found at startxref")
            lx.p += 4
            while True:
                lx.skip_ws()
                if self.data[lx.p : lx.p + 7] == b"trailer":
                    lx.p += 7
                    break
                first = lx._regular_run()
                lx.skip_ws()
                count = lx._regular_run()
                try:
                    first_i, count_i = int(first), int(count)
                except ValueError as e:
                    raise PdfFormatError("bad xref subsection header") from e
                if count_i < 0 or first_i < 0:
                    raise PdfFormatError("negative xref subsection")
                if first_i + count_i > MAX_OBJECTS:
                    raise PdfFormatError("xref object count exceeds cap")
                for i in range(count_i):
                    lx.skip_ws()
                    entry = self.data[lx.p : lx.p + 18]
                    if len(entry) < 18:
                        raise PdfFormatError("truncated xref entry")
                    try:
                        off = int(entry[0:10])
                    except ValueError as e:
                        raise PdfFormatError("bad xref entry") from e
                    kind = entry[17:18]
                    num = first_i + i
                    # newest section wins (we walk newest -> oldest)
                    if kind == b"n" and num not in self.offsets:
                        self.offsets[num] = off
                    lx.p += 18
            trailer = lx.value()
            if not isinstance(trailer, dict):
                raise PdfFormatError("trailer is not a dictionary")
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            xref_stm = trailer.get("XRefStm")
            if isinstance(xref_stm, int):
                # hybrid-reference file (ISO 32000 §7.5.8.4): the
                # stream section takes precedence over /Prev but we
                # fill first-wins, so parse it before following Prev
                self._parse_xref_stream_at(xref_stm)
            prev = trailer.get("Prev")
            if prev is None:
                return
            if not isinstance(prev, int):
                raise PdfFormatError("non-integer /Prev")
            offset = prev

    # -- objects
    def resolve(self, value, depth: int = 0):
        while isinstance(value, _Ref):
            if depth > 64:
                raise PdfFormatError("reference chain too deep")
            value = self.get_object(value[0])[0]
            depth += 1
        return value

    def get_object(self, num: int) -> tuple[object, bytes | None]:
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            loc = self._in_objstm.get(num)
            if loc is not None:
                value = self._load_from_objstm(num, *loc)
                self._cache[num] = (value, None)
                return self._cache[num]
            # a missing object is null per the spec
            self._cache[num] = (None, None)
            return self._cache[num]
        _num, value, stream = self._parse_object_at(off, expect_num=num)
        self._cache[num] = (value, stream)
        return self._cache[num]

    def _parse_object_at(
        self, off: int, expect_num: int | None = None
    ) -> tuple[int, object, bytes | None]:
        if off < 0 or off >= len(self.data):
            raise PdfFormatError(f"object offset {off} out of bounds")
        m = _OBJ_HEADER_RE.match(self.data, off) or _OBJ_HEADER_RE.match(
            self.data, off + self._ws_len(off)
        )
        if m is None or (
            expect_num is not None and int(m.group(1)) != expect_num
        ):
            raise PdfFormatError(f"object header mismatch at {off}")
        lx = _Lexer(self.data, m.end())
        value = lx.value()
        lx.skip_ws()
        stream = None
        if self.data[lx.p : lx.p + 6] == b"stream":
            lx.p += 6
            if self.data[lx.p : lx.p + 2] == b"\r\n":
                lx.p += 2
            elif self.data[lx.p : lx.p + 1] in (b"\n", b"\r"):
                lx.p += 1
            if not isinstance(value, dict):
                raise PdfFormatError("stream without a dictionary")
            length = self.resolve(value.get("Length"))
            if not isinstance(length, int) or length < 0:
                raise PdfFormatError("bad stream /Length")
            if lx.p + length > len(self.data):
                raise PdfFormatError("stream overruns file")
            stream = self.data[lx.p : lx.p + length]
        num, gen = int(m.group(1)), int(m.group(2))
        if self._enc_key is not None and not (
            isinstance(value, dict) and str(value.get("Type", "")) == "XRef"
        ):
            # strings and stream bytes of directly-stored objects are
            # encrypted under their class's crypt filter (the XRef
            # stream is exempt by spec; ObjStm MEMBERS are covered by
            # their container's encryption, handled in
            # _load_from_objstm by NOT re-decrypting)
            value = self._decrypt_value(value, num, gen)
            if stream is not None:
                stream = self._decrypt_payload(
                    stream, num, gen, self._cfm_stm
                )
        return num, value, stream

    def _parse_xref_stream_at(self, off: int) -> dict:
        """One PDF 1.5 cross-reference stream section (ISO 32000
        §7.5.8): /W-packed big-endian entry rows, usually behind
        Flate + a PNG Up predictor. Returns the stream dictionary
        (which doubles as the trailer). First-wins per object number,
        matching the classic-table chain walk."""
        _num, d, raw = self._parse_object_at(off)
        if not isinstance(d, dict) or str(d.get("Type", "")) != "XRef":
            raise PdfFormatError("startxref does not point at an XRef")
        if raw is None:
            raise PdfFormatError("XRef object has no stream")
        data = self._decode_stream_data(d, raw)
        w_raw = self.resolve(d.get("W"))
        if not isinstance(w_raw, list) or len(w_raw) != 3:
            raise PdfFormatError("bad XRef /W")
        w = [int(self.resolve(x)) for x in w_raw]
        if any(x < 0 or x > 8 for x in w) or sum(w) == 0:
            raise PdfFormatError("bad XRef /W widths")
        size = self.resolve(d.get("Size"))
        if not isinstance(size, int) or size < 0 or size > MAX_OBJECTS:
            raise PdfFormatError("bad XRef /Size")
        index_raw = self.resolve(d.get("Index")) or [0, size]
        index = [int(self.resolve(x)) for x in index_raw]
        if len(index) % 2:
            raise PdfFormatError("odd XRef /Index")
        entry_len = sum(w)
        pos = 0
        for i in range(0, len(index), 2):
            first, count = index[i], index[i + 1]
            if first < 0 or count < 0 or first + count > MAX_OBJECTS:
                raise PdfFormatError("XRef /Index out of bounds")
            for num in range(first, first + count):
                row = data[pos : pos + entry_len]
                if len(row) < entry_len:
                    raise PdfFormatError("truncated XRef stream")
                pos += entry_len
                fields = []
                o = 0
                for width in w:
                    fields.append(
                        int.from_bytes(row[o : o + width], "big")
                        if width
                        else None
                    )
                    o += width
                etype = 1 if fields[0] is None else fields[0]
                known = (
                    num in self.offsets or num in self._in_objstm
                )
                if known:
                    continue  # newest section already placed it
                if etype == 1 and fields[1] is not None:
                    self.offsets[num] = fields[1]
                elif etype == 2 and fields[1] is not None:
                    self._in_objstm[num] = (
                        fields[1],
                        fields[2] or 0,
                    )
                # type 0 (free) and unknown types: skip
        return d

    def _load_from_objstm(self, num: int, stm_num: int, idx: int):
        """Object from a /Type /ObjStm container (ISO 32000 §7.5.7):
        N (objnum, offset) header pairs, then the bodies starting at
        /First. Objects in streams have no obj/endobj wrapper."""
        if stm_num == num:
            raise PdfFormatError("object stream containing itself")
        cached = self._objstm_cache.get(stm_num)
        if cached is None:
            d, raw = self.get_object(stm_num)
            if (
                not isinstance(d, dict)
                or str(d.get("Type", "")) != "ObjStm"
                or raw is None
            ):
                raise PdfFormatError(f"object {stm_num} is not an ObjStm")
            data = self._decode_stream_data(d, raw)
            n = self.resolve(d.get("N"))
            first = self.resolve(d.get("First"))
            if (
                not isinstance(n, int)
                or not isinstance(first, int)
                or n < 0
                or n > MAX_OBJECTS
                or first < 0
                or first > len(data)
            ):
                raise PdfFormatError("bad ObjStm /N or /First")
            lx = _Lexer(data[:first])
            pairs = []
            for _ in range(n):
                lx.skip_ws()
                objnum = int(lx._regular_run())
                lx.skip_ws()
                rel = int(lx._regular_run())
                pairs.append((objnum, rel))
            cached = (data, pairs, first)
            self._objstm_cache[stm_num] = cached
        data, pairs, first = cached
        if idx < len(pairs) and pairs[idx][0] == num:
            rel = pairs[idx][1]
        else:  # tolerant: index drifted, search by object number
            matches = [r for (on, r) in pairs if on == num]
            if not matches:
                raise PdfFormatError(
                    f"object {num} not present in ObjStm {stm_num}"
                )
            rel = matches[0]
        if first + rel > len(data):
            raise PdfFormatError("ObjStm offset out of bounds")
        return _Lexer(data, first + rel).value()

    def _ws_len(self, off: int) -> int:
        i = off
        while i < len(self.data) and self.data[i] in _WS:
            i += 1
        return i - off

    def decoded_stream(self, ref_or_dict) -> bytes:
        if isinstance(ref_or_dict, _Ref):
            d, raw = self.get_object(ref_or_dict[0])
        else:
            raise PdfFormatError("content stream must be indirect")
        if raw is None:
            raise PdfFormatError("expected a stream object")
        return self._decode_stream_data(d, raw)

    def _decode_stream_data(self, d: dict, raw: bytes) -> bytes:
        """Apply the /Filter chain (+ aligned /DecodeParms) to stream
        bytes — shared by content streams, XRef streams and object
        streams."""
        filters = self.resolve(d.get("Filter"))
        if filters is None:
            chain: list[str] = []
        elif isinstance(filters, _Name):
            chain = [str(filters)]
        elif isinstance(filters, list):
            chain = [str(self.resolve(f)) for f in filters]
        else:
            raise PdfFormatError("bad /Filter")
        parms_raw = self.resolve(
            d.get("DecodeParms", d.get("DP"))
        )
        if isinstance(parms_raw, list):
            parms_list = [self.resolve(x) for x in parms_raw]
        else:
            parms_list = [parms_raw] + [None] * (len(chain) - 1)
        parms_list += [None] * (len(chain) - len(parms_list))
        out = raw
        for f, parms in zip(chain, parms_list):
            parms = parms if isinstance(parms, dict) else {}
            if f == "FlateDecode":
                dec = zlib.decompressobj()
                try:
                    out = dec.decompress(out, MAX_STREAM_BYTES)
                except zlib.error as e:
                    raise PdfFormatError(f"bad Flate stream: {e}") from e
                if dec.unconsumed_tail:
                    raise PdfFormatError("stream inflate exceeds cap")
                out = self._apply_predictor(out, parms)
            elif f == "LZWDecode":
                early = int(self.resolve(parms.get("EarlyChange", 1)))
                out = _lzw_decode(out, early)
                out = self._apply_predictor(out, parms)
            elif f == "ASCIIHexDecode":
                body = out.split(b">", 1)[0]
                digits = bytes(c for c in body if c not in _WS)
                if len(digits) % 2:
                    digits += b"0"
                try:
                    out = bytes.fromhex(digits.decode("ascii"))
                except (UnicodeDecodeError, ValueError) as e:
                    raise PdfFormatError("bad ASCIIHex stream") from e
            else:
                raise NotImplementedError(
                    f"stream filter {f} is out of scope "
                    "(documented boundary)"
                )
        return out

    def _apply_predictor(self, data: bytes, parms: dict) -> bytes:
        predictor = int(self.resolve(parms.get("Predictor", 1)) or 1)
        if predictor == 1:
            return data
        columns = int(self.resolve(parms.get("Columns", 1)) or 1)
        colors = int(self.resolve(parms.get("Colors", 1)) or 1)
        bpc = int(self.resolve(parms.get("BitsPerComponent", 8)) or 8)
        if predictor == 2:
            return _tiff_unpredict(data, columns, colors, bpc)
        if predictor < 10 or predictor > 15:
            raise PdfFormatError(f"unknown /Predictor {predictor}")
        return _png_unpredict(data, columns, colors, bpc)


def _tiff_unpredict(
    data: bytes, columns: int, colors: int = 1, bpc: int = 8
) -> bytes:
    """TIFF predictor 2 (ISO 32000 7.4.4.4 → TIFF 6.0 §14, horizontal
    differencing): each sample stores the delta from the previous
    sample of the SAME color component in the row; rows are exactly
    ``columns * colors`` samples with NO per-row filter byte (the
    difference from the PNG scheme). 8-bit samples only — the shape
    PDFs actually use; sub-byte and 16-bit samples remain a documented
    boundary. Convention pinned against the JDK TIFF reader
    (tests/test_imageio_interop.py: javax.imageio decodes an
    LZW+predictor-2 TIFF built with this forward transform)."""
    if bpc != 8:
        raise NotImplementedError(
            "TIFF predictor 2 with BitsPerComponent != 8 is out of "
            "scope (documented boundary)"
        )
    rowlen = columns * colors
    if rowlen <= 0:
        raise PdfFormatError("bad predictor Columns")
    if len(data) % rowlen:
        raise PdfFormatError("predicted stream not a whole row count")
    out = bytearray(data)
    for start in range(0, len(out), rowlen):
        for i in range(start + colors, start + rowlen):
            out[i] = (out[i] + out[i - colors]) & 0xFF
    return bytes(out)


def _tiff_predict(
    data: bytes, columns: int, colors: int = 1
) -> bytes:
    """Forward horizontal differencing (the builder/test twin of
    :func:`_tiff_unpredict`)."""
    rowlen = columns * colors
    out = bytearray(data)
    for start in range(0, len(data), rowlen):
        for i in range(start + rowlen - 1, start + colors - 1, -1):
            out[i] = (data[i] - data[i - colors]) & 0xFF
    return bytes(out)


def _png_unpredict(
    data: bytes, columns: int, colors: int = 1, bpc: int = 8
) -> bytes:
    """PNG predictors (DecodeParms /Predictor >= 10) — the row-filter
    scheme ISO 32000 borrows from PNG; cross-reference streams are
    almost always Flate+Up(2)-predicted. Byte-aligned samples only
    (bpc 8/16); each row = 1 filter byte + columns*colors*bpc/8
    bytes, filters None/Sub/Up/Average/Paeth per the PNG spec."""
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if rowlen <= 0:
        raise PdfFormatError("bad predictor Columns")
    if len(data) % (rowlen + 1):
        raise PdfFormatError("predicted stream not a whole row count")
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos < len(data):
        ftype = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        pos += 1 + rowlen
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise PdfFormatError(f"unknown PNG row filter {ftype}")
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (ISO 32000 §7.4.4 = the TIFF variant, NOT GIF's):
    MSB-first code packing, 256 = ClearTable, 257 = EOD, code width
    grows 9→12 bits; ``early`` (EarlyChange, default 1 per the spec)
    widens one code early. Distinct from multimodal's GIF LZW, which
    packs LSB-first with data-dependent code offsets — sharing one
    implementation would entangle two pinned codecs."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    width = 9
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            bits -= width
            code = (acc >> bits) & ((1 << width) - 1)
            if code == 256:
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise PdfFormatError("LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK
                table.append(entry)
            else:
                raise PdfFormatError("LZW code out of range")
            out += entry
            if len(out) > MAX_STREAM_BYTES:
                raise PdfFormatError("LZW inflate exceeds cap")
            prev = entry
            # width switch (the classic TIFF-LZW off-by-one): with
            # early=1 the width grows once the table holds
            # (1<<width)-1 entries (511/1023/2047) — this exact
            # threshold is pinned against the JDK TIFF writer's LZW
            # in test_imageio_interop.py, not chosen from spec memory
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)  # missing EOD: tolerate (crawl PDFs do this)


# ------------------------------------------------------- page walk
def _walk_pages(doc: _Document) -> list[dict]:
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise PdfFormatError("missing /Root catalog")
    pages_ref = root.get("Pages")
    out: list[dict] = []
    seen: set[tuple] = set()

    def walk(node_ref, depth: int) -> None:
        if depth > MAX_TREE_DEPTH:
            raise PdfFormatError("page tree too deep")
        if isinstance(node_ref, _Ref):
            if tuple(node_ref) in seen:
                raise PdfFormatError("page tree cycle")
            seen.add(tuple(node_ref))
        node = doc.resolve(node_ref)
        if not isinstance(node, dict):
            raise PdfFormatError("page tree node is not a dictionary")
        ntype = str(node.get("Type", ""))
        if ntype == "Pages" or (ntype == "" and "Kids" in node):
            kids = doc.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise PdfFormatError("/Kids is not an array")
            for kid in kids:
                walk(kid, depth + 1)
        elif ntype == "Page":
            if len(out) >= MAX_PAGES:
                raise PdfFormatError("page count exceeds cap")
            out.append(node)
        else:
            raise PdfFormatError(f"unexpected page tree node {ntype!r}")

    walk(pages_ref, 0)
    return out


class _FontDecoder:
    """How one font's string bytes become text.

    ``simple`` — Latin-1 bytes (Type1/TrueType with standard
    encodings). ``cid2`` — 2-byte CIDs through a ToUnicode CMap
    (Type0 / Identity-H, the layout modern PDF writers with embedded
    subset fonts emit — incl. all CJK); unmapped CIDs become U+FFFD
    so coverage gaps are VISIBLE in the output, never silently
    skipped."""

    __slots__ = ("kind", "cmap")

    def __init__(self, kind: str, cmap: dict[int, str] | None = None):
        self.kind = kind
        self.cmap = cmap or {}

    def decode(self, raw: bytes) -> str:
        if self.kind == "simple":
            return raw.decode("latin-1")
        out = []
        for i in range(0, len(raw) - 1, 2):
            cid = (raw[i] << 8) | raw[i + 1]
            out.append(self.cmap.get(cid, "\ufffd"))
        return "".join(out)


_MAX_CMAP_RANGE = 1 << 16


def _parse_tounicode_cmap(data: bytes) -> dict[int, str]:
    """The ToUnicode CMap subset every writer emits (ISO 32000
    §9.10.3 / Adobe CMap spec): ``beginbfchar`` pairs and
    ``beginbfrange`` triples (incrementing-destination and explicit-
    array forms). Destinations are UTF-16BE (surrogate pairs allowed);
    codespace declarations are skipped — Identity-H CIDs are 2-byte
    by construction."""
    lx = _Lexer(data)
    cmap: dict[int, str] = {}

    def hexint(b: bytes) -> int:
        return int.from_bytes(b, "big")

    def dst(b: bytes) -> str:
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError as e:
            raise PdfFormatError(f"bad ToUnicode destination: {e}") from e

    mode = None
    while True:
        lx.skip_ws()
        if lx.p >= lx.n:
            break
        c = lx.d[lx.p]
        if c == 0x3C and lx.d[lx.p + 1 : lx.p + 2] != b"<":
            token = lx._hex_string()
        elif c in _DELIM:
            try:
                lx.value()  # arrays/dicts/names outside bf blocks
            except PdfFormatError:
                lx.p += 1
            continue
        else:
            word = lx._regular_run()
            if word == b"beginbfchar":
                mode = "char"
            elif word == b"beginbfrange":
                mode = "range"
            elif word in (b"endbfchar", b"endbfrange"):
                mode = None
            continue
        if mode == "char":
            lx.skip_ws()
            cmap[hexint(token)] = dst(lx._hex_string())
        elif mode == "range":
            lx.skip_ws()
            hi = hexint(lx._hex_string())
            lo = hexint(token)
            if hi < lo or hi - lo >= _MAX_CMAP_RANGE:
                raise PdfFormatError("bad bfrange bounds")
            lx.skip_ws()
            if lx.d[lx.p] == 0x5B:  # explicit destination array
                arr = lx.value()
                if not isinstance(arr, list) or len(arr) != hi - lo + 1:
                    raise PdfFormatError("bfrange array length mismatch")
                for k, d in enumerate(arr):
                    if not isinstance(d, bytes):
                        raise PdfFormatError("bfrange array non-string")
                    cmap[lo + k] = dst(d)
            else:
                base = lx._hex_string()
                base_cp = hexint(base)
                for k in range(hi - lo + 1):
                    # incrementing form increments the LAST code unit
                    cmap[lo + k] = dst(
                        (base_cp + k).to_bytes(len(base), "big")
                    )
    return cmap


def _page_fonts(doc: _Document, page: dict) -> dict[str, _FontDecoder]:
    """Per-page font name → decoder. Simple fonts decode Latin-1;
    Type0 requires Identity-H/V + a ToUnicode CMap (else the
    documented NotImplementedError — extracting CIDs as bytes would
    be silently wrong)."""
    out: dict[str, _FontDecoder] = {}
    res = doc.resolve(page.get("Resources"))
    if not isinstance(res, dict):
        return out
    fonts = doc.resolve(res.get("Font"))
    if not isinstance(fonts, dict):
        return out
    for name, fref in fonts.items():
        font = doc.resolve(fref)
        if not isinstance(font, dict):
            continue
        if str(font.get("Subtype", "")) != "Type0":
            out[str(name)] = _FontDecoder("simple")
            continue
        enc = font.get("Encoding")
        enc_name = str(doc.resolve(enc)) if isinstance(
            enc, (_Name, _Ref)
        ) else ""
        if enc_name not in ("Identity-H", "Identity-V"):
            raise NotImplementedError(
                f"Type0 encoding {enc_name or '<embedded CMap>'} is out "
                "of scope (only Identity-H/V with ToUnicode)"
            )
        tu = font.get("ToUnicode")
        if not isinstance(tu, _Ref):
            raise NotImplementedError(
                "Type0 font without a ToUnicode CMap: CIDs have no "
                "recoverable text meaning (documented boundary)"
            )
        cmap = _parse_tounicode_cmap(doc.decoded_stream(tu))
        out[str(name)] = _FontDecoder("cid2", cmap)
    return out


# ----------------------------------------------------- content text
def _content_text(
    stream: bytes, fonts: dict[str, _FontDecoder] | None = None
) -> str:
    """Text operators → lines (see the module docstring contract).
    ``fonts`` maps resource names to decoders; the ``Tf`` operator
    switches the active one (fonts not in the map — or no map at all —
    decode Latin-1, the simple-font behavior)."""
    fonts = fonts or {}
    lx = _Lexer(stream)
    operands: list = []
    lines: list[str] = []
    cur: list[str] = []
    simple = _FontDecoder("simple")
    active = [simple]  # list so emit() sees Tf updates

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def emit(raw) -> None:
        if isinstance(raw, bytes):
            cur.append(active[0].decode(raw))

    while True:
        lx.skip_ws()
        if lx.p >= lx.n:
            break
        c = lx.d[lx.p]
        if c in b"/(<[" or (0x30 <= c <= 0x39) or c in b"+-.":
            try:
                operands.append(lx.value())
            except PdfFormatError:
                lx.p += 1  # tolerate junk between ops (crawl PDFs)
                operands.clear()
            continue
        op = lx._regular_run()
        if op == b"Tj":
            if operands:
                emit(operands[-1])
        elif op == b"TJ":
            if operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        emit(el)
                    elif (
                        isinstance(el, (int, float))
                        and el <= TJ_SPACE_THRESHOLD
                    ):
                        cur.append(" ")
        elif op == b"'":
            newline()
            if operands:
                emit(operands[-1])
        elif op == b'"':
            newline()
            if operands:
                emit(operands[-1])
        elif op == b"Tf":
            if operands and isinstance(operands[0], _Name):
                active[0] = fonts.get(str(operands[0]), simple)
        elif op in (b"Td", b"TD", b"T*", b"Tm"):
            newline()
        elif op == b"ET":
            newline()
        operands.clear()
    newline()
    text_lines = []
    for ln in lines:
        ln = ln.strip()
        if ln:
            text_lines.append(ln)
    return "\n".join(text_lines)


# ------------------------------------------------------- public API
def extract_pdf(data: bytes, password: str = "") -> tuple[str, int]:
    """Pure-Python core: (text, n_pages). Raises PdfFormatError /
    NotImplementedError only (fuzz-table contract). ``password`` is
    the standard-security-handler user password (RC4 R2/R3, AES-128
    R4, AES-256 R5/R6) — the default empty string IS the common crawl
    case (files encrypted only to gate editing authenticate with an
    empty user password); a wrong password raises
    :class:`PdfPasswordError`."""
    try:
        doc = _Document(data, password=password)
        pages = _walk_pages(doc)
        page_texts = []
        for page in pages:
            fonts = _page_fonts(doc, page)
            contents = page.get("Contents")
            if contents is None:
                page_texts.append("")
                continue
            resolved = contents
            if isinstance(resolved, _Ref):
                val = doc.resolve(resolved)
                streams = (
                    [doc.decoded_stream(r) for r in val]
                    if isinstance(val, list)
                    else [doc.decoded_stream(resolved)]
                )
            elif isinstance(resolved, list):
                streams = [doc.decoded_stream(r) for r in resolved]
            else:
                raise PdfFormatError("bad /Contents")
            page_texts.append(_content_text(b"\n".join(streams), fonts))
        return "\n".join(t for t in page_texts if t), len(pages)
    except (PdfFormatError, NotImplementedError):
        raise
    except (
        IndexError,
        KeyError,
        ValueError,
        TypeError,
        AttributeError,
        OverflowError,
        RecursionError,
        zlib.error,
    ) as e:
        raise PdfFormatError(f"malformed PDF: {e!r}") from e


def extract_text_pdf(frame: DataFrame, pdf_col: str = "pdf") -> DataFrame:
    """doc_id + (text, n_pages, error) per document — one Arrow-batched
    projection, shuffle-free (the :func:`html_extract.extract_text`
    shape). Malformed documents land with ``text=NULL`` and the error
    class in ``error`` instead of failing the stage — at crawl scale
    malformed input is the common case (no-silent-caps: the caller can
    count and report them)."""

    @F.pandas_udf(
        "struct<text: string, n_pages: int, error: string>"
    )
    def ex(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for raw in batch:
                try:
                    if raw is None:
                        raise PdfFormatError("null document")
                    text, n_pages = extract_pdf(bytes(raw))
                    rows.append(
                        {"text": text, "n_pages": n_pages, "error": None}
                    )
                except (PdfFormatError, NotImplementedError) as e:
                    rows.append(
                        {
                            "text": None,
                            "n_pages": 0,
                            "error": type(e).__name__,
                        }
                    )
            yield pd.DataFrame(rows)

    return frame.select("doc_id", ex(F.col(pdf_col)).alias("e")).select(
        "doc_id", "e.text", "e.n_pages", "e.error"
    )


# ------------------------------------------------------------ synth
def _escape_literal(s: str) -> bytes:
    out = s.encode("latin-1", "replace")
    return (
        out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def build_pdf(
    pages: list[list[str]],
    compress: bool = True,
    layout: str = "classic",
    font: str = "type1",
    encrypt: dict | None = None,
) -> bytes:
    """Deterministic minimal PDF: one shared Helvetica font, one
    content stream per page holding each line as ``(line) Tj T*``
    under a 14-unit leading. Extraction must recover EXACTLY the
    line structure (lines joined by newlines, pages concatenated) —
    the round-trip pin. ``compress`` routes the content streams
    through FlateDecode (zlib is deterministic at a fixed level).

    ``layout`` selects the cross-reference representation so every
    reader path has a builder twin:

    - ``classic`` — PDF 1.4 xref table + trailer;
    - ``xref_stream`` — a PDF 1.5 /Type /XRef stream (W=[1,4,2]
      big-endian rows; Flate + PNG Up predictor when ``compress``);
    - ``objstm`` — additionally packs every non-stream object
      (catalog, page tree, pages, font) into a /Type /ObjStm
      container referenced by type-2 entries.

    ``encrypt`` (classic layout only) emits a standard-security-
    handler file (the builder twin for the decrypt paths):
    ``{"revision": 2|3|4|5|6, "user_password": "",
    "owner_password": "dono", "length": 40|128}`` — revisions 2/3 are
    RC4 under Algorithm-1 object keys, revision 4 is /V 4 with an
    /AESV2 StdCF crypt filter (AES-128-CBC, "sAlT"ed object keys),
    revisions 5/6 are /V 5 /AESV3 (AES-256 under the file key; R6
    derives /U //O via the Algorithm 2.B hardened hash, R5 via plain
    SHA-256) with /UE //OE //Perms emitted. Everything is
    deterministic (IVs, salts and the file key are digests of the
    page content — never random), /ID fixed, /P -1. Extraction with
    the right password must round-trip EXACTLY like the plaintext
    twin.
    """
    if layout not in ("classic", "xref_stream", "objstm"):
        raise ValueError(f"unknown layout {layout!r}")
    if font not in ("type1", "type0"):
        raise ValueError(f"unknown font {font!r}")
    if encrypt is not None and layout != "classic":
        raise ValueError("encrypt is only supported for the classic layout")
    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    # layout: 1 catalog, 2 pages, 3 font, then (page, contents) pairs
    # (type0 adds ToUnicode + descendant objects after the contents)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>".encode()
    )
    cid_of: dict[str, int] = {}
    if font == "type1":
        objects[3] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
    else:
        # CIDs assigned in order of first appearance (NOT codepoints:
        # that is exactly how subset embedders behave, and it keeps
        # astral chars representable in 2 bytes)
        for lines in pages:
            for line in lines:
                for ch in line:
                    cid_of.setdefault(ch, len(cid_of) + 1)
        if len(cid_of) >= 0xFFFF:
            raise ValueError("too many distinct characters for 2-byte CIDs")
        tou_num = 4 + 2 * n_pages
        desc_num = tou_num + 1
        objects[3] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            f"/Encoding /Identity-H /DescendantFonts [{desc_num} 0 R] "
            f"/ToUnicode {tou_num} 0 R >>".encode()
        )
        objects[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        cmap = bytearray(
            b"/CIDInit /ProcSet findresource begin 12 dict begin "
            b"begincmap /CMapName /Synth def /CMapType 2 def\n"
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        )
        items = sorted(cid_of.items(), key=lambda kv: kv[1])
        for chunk_at in range(0, len(items), 100):
            chunk = items[chunk_at : chunk_at + 100]
            cmap += f"{len(chunk)} beginbfchar\n".encode()
            for ch, cid in chunk:
                dst = ch.encode("utf-16-be").hex().upper()
                cmap += f"<{cid:04X}> <{dst}>\n".encode()
            cmap += b"endbfchar\n"
        cmap += b"endcmap end end\n"
        tou = bytes(cmap)
        if compress:
            tou_c = zlib.compress(tou, 9)
            objects[tou_num] = (
                f"<< /Length {len(tou_c)} /Filter /FlateDecode >>".encode()
            )
            tou = tou_c
        else:
            objects[tou_num] = f"<< /Length {len(tou)} >>".encode()
    streams: dict[int, bytes] = {}
    for i, lines in enumerate(pages):
        page_num, content_num = 4 + 2 * i, 5 + 2 * i
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {content_num} 0 R >>".encode()
        )
        body = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for line in lines:
            if font == "type1":
                body += b"(" + _escape_literal(line) + b") Tj T*\n"
            else:
                hexed = "".join(f"{cid_of[ch]:04X}" for ch in line)
                body += b"<" + hexed.encode() + b"> Tj T*\n"
        body += b"ET"
        raw = bytes(body)
        if compress:
            raw = zlib.compress(raw, 9)
            streams[content_num] = raw
            objects[content_num] = (
                f"<< /Length {len(raw)} /Filter /FlateDecode >>".encode()
            )
        else:
            streams[content_num] = raw
            objects[content_num] = f"<< /Length {len(raw)} >>".encode()
    if font == "type0":
        streams[tou_num] = tou

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    if layout == "classic":
        trailer_extra = b""
        if encrypt is not None:
            import hashlib

            r = int(encrypt.get("revision", 3))
            if r not in (2, 3, 4, 5, 6):
                raise ValueError("encrypt revision must be 2..6")
            enc_codec = "latin-1" if r <= 4 else "utf-8"
            user_pw = str(encrypt.get("user_password", "")).encode(
                enc_codec
            )
            owner_pw = str(
                encrypt.get("owner_password", "dono")
            ).encode(enc_codec) or user_pw
            # deterministic /ID (never wall-clock/random): digest of
            # the page content — both array members identical
            id0 = hashlib.md5(
                b"spark-graft-pdf-id:" + repr(pages).encode()
            ).digest()
            p_flags = -1
            enc_num = max(objects) + 1

            def aes_wrap(key: bytes, num: int, payload: bytes) -> bytes:
                # IV + CBC + RFC 2898 padding; the IV is DETERMINISTIC
                # (digest of object number + payload — decryption
                # treats it as opaque data, randomness buys nothing in
                # a builder twin and would break byte-stable goldens)
                pad = 16 - len(payload) % 16
                iv = hashlib.md5(
                    b"spark-graft-aes-iv:%d:" % num
                    + hashlib.md5(payload).digest()
                ).digest()
                return iv + _aes.cbc_encrypt(
                    key, iv, payload + bytes([pad]) * pad
                )

            def fix_stream_lengths() -> None:
                # AES grows streams (IV + padding) AFTER their dicts
                # were written — patch each /Length to the ciphertext
                # size (RC4 is length-preserving and skips this)
                for num in streams:
                    objects[num] = re.sub(
                        rb"/Length \d+",
                        b"/Length %d" % len(streams[num]),
                        objects[num],
                        count=1,
                    )

            if r <= 4:
                length = int(
                    encrypt.get("length", 40 if r == 2 else 128)
                )
                o_entry = _std_owner_entry(owner_pw, user_pw, r, length)
                file_key = _std_file_key(
                    user_pw, o_entry, p_flags, id0, r, length
                )
                u_entry = _std_user_entry(file_key, id0, r)
                # encrypt every stream under its Algorithm-1 object
                # key (encryption is the OUTERMOST layer, applied to
                # the filter-encoded bytes)
                if r == 4:
                    for num in streams:
                        streams[num] = aes_wrap(
                            _std_object_key_aes(file_key, num, 0),
                            num,
                            streams[num],
                        )
                    fix_stream_lengths()
                    objects[enc_num] = (
                        f"<< /Filter /Standard /V 4 /R 4 /Length {length} "
                        f"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                        f"/StmF /StdCF /StrF /StdCF "
                        f"/O <{o_entry.hex()}> /U <{u_entry.hex()}> "
                        f"/P {p_flags} >>".encode()
                    )
                else:
                    for num in streams:
                        streams[num] = _rc4(
                            _std_object_key(file_key, num, 0),
                            streams[num],
                        )
                    v = 1 if r == 2 else 2
                    length_part = f" /Length {length}" if r == 3 else ""
                    objects[enc_num] = (
                        f"<< /Filter /Standard /V {v} /R {r}{length_part} "
                        f"/O <{o_entry.hex()}> /U <{u_entry.hex()}> "
                        f"/P {p_flags} >>".encode()
                    )
            else:
                # V5 (AES-256): deterministic 32-byte file key + salts
                file_key = hashlib.sha256(
                    b"spark-graft-filekey:" + repr(pages).encode()
                ).digest()
                seed = hashlib.md5(
                    b"spark-graft-salts:" + repr(pages).encode()
                ).digest()
                vsalt, ksalt = seed[:8], seed[8:16]
                oseed = hashlib.md5(
                    b"spark-graft-osalts:" + repr(pages).encode()
                ).digest()
                ovsalt, oksalt = oseed[:8], oseed[8:16]
                if r == 5:
                    uh = hashlib.sha256(user_pw + vsalt).digest()
                    ik = hashlib.sha256(user_pw + ksalt).digest()
                else:
                    uh = _hash_2b(user_pw, vsalt)
                    ik = _hash_2b(user_pw, ksalt)
                u_entry = uh + vsalt + ksalt
                ue = _aes.cbc_encrypt(ik, bytes(16), file_key)
                if r == 5:
                    oh = hashlib.sha256(
                        owner_pw + ovsalt + u_entry
                    ).digest()
                    oik = hashlib.sha256(
                        owner_pw + oksalt + u_entry
                    ).digest()
                else:
                    oh = _hash_2b(owner_pw, ovsalt, u_entry)
                    oik = _hash_2b(owner_pw, oksalt, u_entry)
                o_entry = oh + ovsalt + oksalt
                oe = _aes.cbc_encrypt(oik, bytes(16), file_key)
                perms = _aes.ecb_encrypt(
                    file_key,
                    (p_flags & 0xFFFFFFFF).to_bytes(4, "little")
                    + b"\xff\xff\xff\xff"
                    + b"T"      # EncryptMetadata true
                    + b"adb"    # the spec's signature bytes
                    + b"sprk",  # 4 filler bytes (spec: arbitrary)
                )
                for num in streams:
                    streams[num] = aes_wrap(file_key, num, streams[num])
                fix_stream_lengths()
                objects[enc_num] = (
                    f"<< /Filter /Standard /V 5 /R {r} /Length 256 "
                    f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                    f"/StmF /StdCF /StrF /StdCF "
                    f"/O <{o_entry.hex()}> /U <{u_entry.hex()}> "
                    f"/OE <{oe.hex()}> /UE <{ue.hex()}> "
                    f"/Perms <{perms.hex()}> /P {p_flags} >>".encode()
                )
            trailer_extra = (
                f" /Encrypt {enc_num} 0 R "
                f"/ID [<{id0.hex()}> <{id0.hex()}>]".encode()
            )
        offsets: dict[int, int] = {}
        for num in sorted(objects):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + objects[num]
            if num in streams:
                out += b"\nstream\n" + streams[num] + b"\nendstream"
            out += b"\nendobj\n"
        xref_at = len(out)
        n_obj = max(objects) + 1
        out += f"xref\n0 {n_obj}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, n_obj):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {n_obj} /Root 1 0 R".encode()
            + trailer_extra
            + f" >>\nstartxref\n{xref_at}\n%%EOF\n".encode()
        )
        return bytes(out)

    # ---- PDF 1.5 layouts
    out[5:8] = b"1.5"
    in_objstm: dict[int, int] = {}   # num -> index within the ObjStm
    top_level = dict(objects)
    if layout == "objstm":
        packed = sorted(n for n in objects if n not in streams)
        objstm_num = max(objects) + 1
        header = bytearray()
        bodies = bytearray()
        rels = []
        for n in packed:
            rels.append(len(bodies))
            bodies += objects[n] + b"\n"
        for n, rel in zip(packed, rels):
            header += f"{n} {rel} ".encode()
        payload = bytes(header) + bytes(bodies)
        first = len(header)
        if compress:
            comp = zlib.compress(payload, 9)
            stm_dict = (
                f"<< /Type /ObjStm /N {len(packed)} /First {first} "
                f"/Length {len(comp)} /Filter /FlateDecode >>"
            ).encode()
            streams[objstm_num] = comp
        else:
            stm_dict = (
                f"<< /Type /ObjStm /N {len(packed)} /First {first} "
                f"/Length {len(payload)} >>"
            ).encode()
            streams[objstm_num] = payload
        top_level = {
            n: o for n, o in objects.items() if n in streams
        }
        top_level[objstm_num] = stm_dict
        in_objstm = {n: i for i, n in enumerate(packed)}

    xref_num = max(top_level) + 1
    offsets = {}
    for num in sorted(top_level):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + top_level[num]
        if num in streams:
            out += b"\nstream\n" + streams[num] + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    size = xref_num + 1
    # W = [1, 4, 2] rows for objects 0..xref_num
    rows = []
    rows.append((0, 0, 65535))  # the free-list head
    objstm_container = max(top_level) if layout == "objstm" else None
    for num in range(1, size):
        if num == xref_num:
            rows.append((1, xref_at, 0))
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        elif num in in_objstm:
            rows.append((2, objstm_container, in_objstm[num]))
        else:
            rows.append((0, 0, 0))
    entry = b"".join(
        t.to_bytes(1, "big") + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in rows
    )
    filt = b""
    if compress:
        # PNG Up predictor over 7-byte rows, then Flate — the layout
        # real writers emit for xref streams
        rowlen = 7
        pred = bytearray()
        prev = bytes(rowlen)
        for i in range(0, len(entry), rowlen):
            row = entry[i : i + rowlen]
            pred.append(2)
            pred += bytes((row[j] - prev[j]) & 0xFF for j in range(rowlen))
            prev = row
        entry = zlib.compress(bytes(pred), 9)
        filt = (
            b" /Filter /FlateDecode"
            b" /DecodeParms << /Predictor 12 /Columns 7 >>"
        )
    xref_dict = (
        f"<< /Type /XRef /Size {size} /W [1 4 2] /Root 1 0 R "
        f"/Length {len(entry)}".encode() + filt + b" >>"
    )
    out += f"{xref_num} 0 obj\n".encode() + xref_dict
    out += b"\nstream\n" + entry + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def synth_pdf(
    docs: DataFrame, text_col: str = "text", compress: bool = True
) -> DataFrame:
    """One deterministic PDF per fixture doc: the doc's text split
    into 8-word lines, 40 lines per page. Extraction must recover the
    exact line structure — the round-trip pin (test-only surface, so
    the build runs in the same Arrow-batched projection class as the
    extractor rather than JVM-side: PDF xref tables need byte offsets,
    which string expressions cannot compute)."""

    @F.pandas_udf("binary")
    def mk(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            built = []
            for text in batch:
                words = (text or "").split()
                lines = [
                    " ".join(words[i : i + 8])
                    for i in range(0, max(len(words), 1), 8)
                ]
                pages = [
                    lines[i : i + 40] for i in range(0, len(lines), 40)
                ] or [[""]]
                built.append(build_pdf(pages, compress=compress))
            yield pd.Series(built)

    return docs.select("doc_id", mk(F.col(text_col)).alias("pdf"))
