"""Pure-Python Zstandard (RFC 8878) frame codec for the Avro layer.

Upstream flexcalc has no Avro/zstd surface (reference mount empty all
rounds; SURVEY §0 fallback) — this exists because the Avro spec names
``zstandard`` as one of its six object-container codecs and the repo's
Avro source/sink (avrocodec.py) implements the full spec surface.

Scope and verification posture (the round-10 snappy/avro precedent —
"check pyspark/jars FIRST"):

- **Decoder: the full RFC 8878 decompression grammar** — frame headers,
  raw/RLE/compressed blocks, all four literals block types (raw, RLE,
  Huffman-compressed 1-stream and 4-stream, treeless reuse), FSE table
  descriptions (predefined / RLE / FSE-compressed / repeat modes for
  all three sequence alphabets), interleaved-2-state FSE weight
  decoding for Huffman tree descriptions, sequence execution with the
  three repeat offsets and the literals-length-0 twist, xxh64 content
  checksums, multi-frame concatenation, and skippable frames.
- **Encoder: LZ77 + Huffman literals + predefined-FSE sequences** —
  bounded hash chains pick the longest candidate with one-step-lazy
  parsing (``level=1`` drops to a single-slot greedy matcher for ~5x
  the throughput), repeat-offset codes are emitted when the offset
  matches the decoder's rep history, literals are canonical-Huffman
  coded (length-limited to 11 bits, direct 4-bit tree description,
  4-stream layout) with RLE/raw fallbacks, and the three sequence
  alphabets use the RFC's predefined FSE distributions via the
  classic backward-state-assignment encoder (expressed directly
  against the shared decode tables). Blocks fall back to raw/RLE
  whenever the compressed form would not win (``store=True`` forces
  that path), so every output is unconditionally valid zstd.
  Measured on the fixture documents as JSONL: 0.318 of raw at the
  default level vs the reference encoder's 0.235 at its level 1 —
  1.35x the bytes, with identical decode-side semantics. Tree
  descriptions use direct 4-bit weights up to the headerByte's
  128-weight cap and FSE-compressed weights past it (the UTF-8 /
  high-byte alphabet case), each self-checked through the shared
  decoder before emission.
- **Cross-implementation verification**: Spark's classpath ships the
  official zstd-jni (zstd-jni-1.5.7-6.jar, used for shuffle/parquet
  compression), so tests/test_zstd.py round-trips BOTH directions
  against ``com.github.luben.zstd.Zstd`` via py4j — real frames at
  levels 1/3/9/19/22 (which exercise every literals/sequence mode
  above) must decode byte-exactly, and our frames (LZ-compressed,
  level-1, and store-mode) must decompress under the reference
  implementation, checksums included. This is the same standard
  avrocodec/snappycodec are held to, and strictly stronger than a
  lockstep encoder/decoder pair.

Out of scope, each raising a typed error at the raise site:
dictionaries (``Dictionary_ID != 0`` — content-addressed dict storage
is an application concern the Avro container never uses) and window
sizes are not enforced (frames decode into one in-memory buffer; the
Avro layer bounds block sizes upstream).

Corrupt or truncated input raises ``ValueError`` (the repo-wide codec
contract — callers degrade PER ROW, never per batch).
"""

from __future__ import annotations

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

_BLOCK_MAX = 128 * 1024

# --- RFC 8878 §3.1.1.3.2.1.1: sequence code-to-value tables -----------------

_LL_BASE_BITS: list[tuple[int, int]] = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]

_ML_BASE_BITS: list[tuple[int, int]] = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15),
    (65539, 16),
]

# --- RFC 8878 §3.1.1.3.2.2: predefined FSE distributions --------------------

_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
     2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2] + [1] * 37 + [-1] * 7,
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, -1, -1, -1, -1, -1],
    5,
)

for _dist, _al in (_LL_DEFAULT, _ML_DEFAULT, _OF_DEFAULT):
    assert sum(abs(p) for p in _dist) == 1 << _al

_MAX_ACCURACY = {"ll": 9, "of": 8, "ml": 9, "weights": 6}
_HUF_MAX_TABLELOG = 11


# ---------------------------------------------------------------------------
# xxh64 (public XXH64 specification; content-checksum field = low 32 bits)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` (64-bit). Spec test vector pinned in tests;
    every checksummed frame from zstd-jni cross-verifies it again."""
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        while i + 32 <= n:
            a1 = (_rotl((a1 + int.from_bytes(data[i:i + 8], "little") * _P2)
                        & _M64, 31) * _P1) & _M64
            a2 = (_rotl((a2 + int.from_bytes(data[i + 8:i + 16], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            a3 = (_rotl((a3 + int.from_bytes(data[i + 16:i + 24], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            a4 = (_rotl((a4 + int.from_bytes(data[i + 24:i + 32], "little")
                         * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) \
            & _M64
        for a in (a1, a2, a3, a4):
            h = (h ^ (_rotl((a * _P2) & _M64, 31) * _P1) & _M64) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M64,
                    31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# bit readers
# ---------------------------------------------------------------------------


class _ForwardBits:
    """LSB-first forward reader (FSE table descriptions, §4.1.1)."""

    __slots__ = ("data", "pos", "limit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.limit = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.limit:
            raise ValueError("zstd: truncated FSE table description")
        p = self.pos
        v = (int.from_bytes(self.data[p >> 3:(p + n + 7) >> 3], "little")
             >> (p & 7)) & ((1 << n) - 1)
        self.pos = p + n
        return v

    def peek(self, n: int) -> int:
        """Peek up to ``n`` bits, zero-padding past the end (readNCount
        peeks a full field before deciding how many bits it used)."""
        if n == 0:
            return 0
        p = self.pos
        avail = self.limit - p
        m = min(n, max(avail, 0))
        if m <= 0:
            return 0
        return (int.from_bytes(self.data[p >> 3:(p + m + 7) >> 3], "little")
                >> (p & 7)) & ((1 << m) - 1)

    def skip(self, n: int) -> None:
        if self.pos + n > self.limit:
            raise ValueError("zstd: truncated FSE table description")
        self.pos += n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackwardBits:
    """MSB-anchored backward reader (Huffman/FSE bitstreams, §3.1.1.4):
    the last byte's highest set bit is the sentinel; reads consume the
    bits immediately below the cursor. Overreads zero-pad LOW bits
    (the reference decoder's tail behavior) and flag ``overflowed``."""

    __slots__ = ("data", "bits")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: bitstream missing sentinel bit")
        self.data = data
        self.bits = 8 * (len(data) - 1) + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.bits - n
        self.bits = pos
        if pos >= 0:
            return (int.from_bytes(
                self.data[pos >> 3:(pos + n + 7) >> 3], "little")
                >> (pos & 7)) & ((1 << n) - 1)
        m = n + pos  # valid high bits that remain
        if m <= 0:
            return 0
        return ((int.from_bytes(self.data[:(m + 7) >> 3], "little")
                 & ((1 << m) - 1)) << -pos)

    @property
    def overflowed(self) -> bool:
        return self.bits < 0


# ---------------------------------------------------------------------------
# FSE (§4.1): table description -> decode table -> interleaved decoding
# ---------------------------------------------------------------------------


def _fse_read_ncount(
    br: _ForwardBits, max_symbols: int, max_accuracy: int
) -> tuple[list[int], int]:
    """Read a normalized-count table description; returns (counts,
    accuracy_log). Mirrors RFC 8878 §4.1.1's variable-size fields and
    the 2-bit zero-run repeat flags."""
    al = br.read(4) + 5
    if al > max_accuracy:
        raise ValueError(f"zstd: accuracy log {al} > max {max_accuracy}")
    remaining = (1 << al) + 1
    threshold = 1 << al
    nbits = al + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1:
        if len(counts) > max_symbols:
            raise ValueError("zstd: FSE table has too many symbols")
        if prev_zero:
            while True:
                flag = br.read(2)
                if flag == 3:
                    counts.extend((0, 0, 0))
                else:
                    counts.extend((0,) * flag)
                    break
                if len(counts) > max_symbols:
                    raise ValueError("zstd: FSE zero run overruns alphabet")
            prev_zero = False
            continue
        max_low = (2 * threshold - 1) - remaining
        low = br.peek(nbits - 1)
        if low < max_low:
            br.skip(nbits - 1)
            value = low
        else:
            value = br.peek(nbits)
            br.skip(nbits)
            if value >= threshold:
                value -= max_low
        count = value - 1  # -1 encodes the "less than 1" probability
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: FSE normalized counts do not sum to 1<<AL")
    if len(counts) > max_symbols:
        raise ValueError("zstd: FSE table has too many symbols")
    return counts, al


def _fse_build_dtable(
    counts: list[int], al: int
) -> list[tuple[int, int, int]]:
    """Normalized counts -> decode table of (symbol, nb_bits, base_state)
    per RFC 8878 §4.1.1's spread-and-number construction."""
    size = 1 << al
    syms = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            syms[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        for _ in range(c if c > 0 else 0):
            syms[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not close")
    nxt = [1 if c == -1 else c for c in counts]
    table: list[tuple[int, int, int]] = []
    for i in range(size):
        s = syms[i]
        state = nxt[s]
        nxt[s] += 1
        nb = al - (state.bit_length() - 1)
        table.append((s, nb, (state << nb) - size))
    return table


def _fse_decode_interleaved(
    table: list[tuple[int, int, int]], al: int, stream: bytes
) -> list[int]:
    """Two-state interleaved FSE decoding of a backward bitstream
    (§4.2.1.2, Huffman weights). Emits symbols until the stream is
    exhausted, matching the reference tail loop: once a state update
    overruns the stream, the OTHER state flushes its symbol and
    decoding stops."""
    br = _BackwardBits(stream)
    s1 = br.read(al)
    s2 = br.read(al)
    if br.overflowed:
        raise ValueError("zstd: FSE weight stream too short for init")
    out: list[int] = []
    while True:
        sym, nb, base = table[s1]
        out.append(sym)
        s1 = base + br.read(nb)
        if br.overflowed:
            out.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        out.append(sym)
        s2 = base + br.read(nb)
        if br.overflowed:
            out.append(table[s1][0])
            break
        if len(out) > 255:
            raise ValueError("zstd: more than 255 Huffman weights")
    if len(out) > 255:
        raise ValueError("zstd: more than 255 Huffman weights")
    return out


# ---------------------------------------------------------------------------
# Huffman literals (§4.2)
# ---------------------------------------------------------------------------


def _huf_build_dtable(weights: list[int]) -> tuple[list[tuple[int, int]],
                                                   int]:
    """Weights (last one implicit, already appended) -> flat decode
    table of (symbol, nb_bits) indexed by the next ``table_log`` peeked
    bits. Canonical layout: symbols fill ranges of size 1<<(w-1) in
    (weight, symbol) ascending order."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: Huffman weights are all zero")
    table_log = total.bit_length() - 1
    if (1 << table_log) != total:
        raise ValueError("zstd: Huffman weights do not sum to a power of 2")
    if table_log > _HUF_MAX_TABLELOG:
        raise ValueError("zstd: Huffman table log exceeds 11")
    size = 1 << table_log
    table: list[tuple[int, int]] = [(-1, 0)] * size
    pos = 0
    for w in range(1, table_log + 2):
        span = 1 << (w - 1)
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            nb = table_log + 1 - w
            for _ in range(span):
                table[pos] = (sym, nb)
                pos += 1
    if pos != size:
        raise ValueError("zstd: Huffman table not fully populated")
    return table, table_log


def _huf_read_weights(data: bytes, pos: int) -> tuple[list[int], int]:
    """Huffman tree description (§4.2.1): headerByte >= 128 -> direct
    4-bit weights; < 128 -> FSE-compressed weights of that byte size.
    Returns (weights incl. the deduced last symbol, new pos)."""
    if pos >= len(data):
        raise ValueError("zstd: truncated Huffman tree description")
    hb = data[pos]
    pos += 1
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) >> 1
        if pos + nbytes > len(data):
            raise ValueError("zstd: truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = data[pos + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        pos += nbytes
    else:
        if pos + hb > len(data):
            raise ValueError("zstd: truncated FSE Huffman weights")
        region = bytes(data[pos:pos + hb])
        fb = _ForwardBits(region)
        counts, al = _fse_read_ncount(fb, 255, _MAX_ACCURACY["weights"])
        table = _fse_build_dtable(counts, al)
        weights = _fse_decode_interleaved(table, al,
                                          region[fb.bytes_consumed():])
        pos += hb
    # deduce the final symbol's weight (§4.2.1.3)
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: explicit Huffman weights are all zero")
    nextp = 1 << total.bit_length()
    rest = nextp - total
    if rest & (rest - 1):
        raise ValueError("zstd: Huffman weight remainder not a power of 2")
    weights.append(rest.bit_length())
    if any(w > _HUF_MAX_TABLELOG + 1 for w in weights):
        raise ValueError("zstd: Huffman weight exceeds maximum")
    return weights, pos


def _huf_decode_stream(
    table: list[tuple[int, int]], table_log: int, stream: bytes, n_out: int
) -> bytearray:
    br = _BackwardBits(stream)
    out = bytearray(n_out)
    bits = br.bits
    data = br.data
    mask = (1 << table_log) - 1
    for i in range(n_out):
        pos = bits - table_log
        if pos >= 0:
            idx = (int.from_bytes(
                data[pos >> 3:(pos + table_log + 7) >> 3], "little")
                >> (pos & 7)) & mask
        else:
            m = table_log + pos
            if m <= 0:
                raise ValueError("zstd: Huffman stream exhausted early")
            idx = ((int.from_bytes(data[:(m + 7) >> 3], "little")
                    & ((1 << m) - 1)) << -pos)
        sym, nb = table[idx]
        if sym < 0:
            raise ValueError("zstd: invalid Huffman code")
        out[i] = sym
        bits -= nb
        if bits < 0:
            # a valid stream lands on EXACTLY zero after the final
            # symbol, so going negative is corruption at any position
            raise ValueError("zstd: Huffman stream exhausted early")
    if bits != 0:
        raise ValueError("zstd: Huffman stream not fully consumed")
    return out


# ---------------------------------------------------------------------------
# frame decoding
# ---------------------------------------------------------------------------


def _decode_literals(
    block: memoryview, pos: int, huf_state: dict
) -> tuple[bytes, int]:
    """Literals section (§3.1.1.3.1) -> (regenerated literals, new pos).
    ``huf_state`` carries the frame's last Huffman table for treeless
    blocks."""
    if pos >= len(block):
        raise ValueError("zstd: missing literals section")
    b0 = block[pos]
    lb_type = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if lb_type <= 1:  # raw / RLE
        if size_fmt & 1 == 0:
            reg, hdr = b0 >> 3, 1
        elif size_fmt == 1:
            if pos + 2 > len(block):
                raise ValueError("zstd: truncated literals header")
            reg, hdr = (int.from_bytes(block[pos:pos + 2], "little") >> 4, 2)
        else:
            if pos + 3 > len(block):
                raise ValueError("zstd: truncated literals header")
            reg, hdr = (int.from_bytes(block[pos:pos + 3], "little") >> 4, 3)
        pos += hdr
        if lb_type == 0:
            if pos + reg > len(block):
                raise ValueError("zstd: truncated raw literals")
            lits = bytes(block[pos:pos + reg])
            return lits, pos + reg
        if pos + 1 > len(block):
            raise ValueError("zstd: truncated RLE literal byte")
        return bytes([block[pos]]) * reg, pos + 1

    # compressed (2) / treeless (3)
    if size_fmt == 0:
        n_streams, hdr, fbits = 1, 3, 10
    elif size_fmt == 1:
        n_streams, hdr, fbits = 4, 3, 10
    elif size_fmt == 2:
        n_streams, hdr, fbits = 4, 4, 14
    else:
        n_streams, hdr, fbits = 4, 5, 18
    if pos + hdr > len(block):
        raise ValueError("zstd: truncated literals header")
    le = int.from_bytes(block[pos:pos + hdr], "little")
    reg = (le >> 4) & ((1 << fbits) - 1)
    comp = (le >> (4 + fbits)) & ((1 << fbits) - 1)
    pos += hdr
    if pos + comp > len(block):
        raise ValueError("zstd: truncated compressed literals")
    region = memoryview(block[pos:pos + comp])
    pos += comp
    rpos = 0
    if lb_type == 2:
        weights, rpos = _huf_read_weights(region, 0)
        huf_state["table"] = _huf_build_dtable(weights)
    if huf_state.get("table") is None:
        raise ValueError("zstd: treeless literals with no previous table")
    table, table_log = huf_state["table"]
    if n_streams == 1:
        lits = _huf_decode_stream(table, table_log,
                                  bytes(region[rpos:]), reg)
        return bytes(lits), pos
    if rpos + 6 > len(region):
        raise ValueError("zstd: truncated 4-stream jump table")
    s1 = int.from_bytes(region[rpos:rpos + 2], "little")
    s2 = int.from_bytes(region[rpos + 2:rpos + 4], "little")
    s3 = int.from_bytes(region[rpos + 4:rpos + 6], "little")
    rpos += 6
    share = (reg + 3) >> 2
    sizes = [s1, s2, s3, len(region) - rpos - s1 - s2 - s3]
    outs = [share, share, share, reg - 3 * share]
    if sizes[3] < 0 or outs[3] < 0:
        raise ValueError("zstd: 4-stream sizes inconsistent")
    lits = bytearray()
    for sz, n_out in zip(sizes, outs):
        lits += _huf_decode_stream(table, table_log,
                                   bytes(region[rpos:rpos + sz]), n_out)
        rpos += sz
    return bytes(lits), pos


def _read_seq_table(
    block: memoryview, pos: int, mode: int, kind: str,
    default: tuple[list[int], int], state: dict
) -> tuple[tuple[list[tuple[int, int, int]], int], int]:
    """One sequence alphabet's table per its 2-bit compression mode.
    Returns ((dtable, accuracy_log), new_pos)."""
    max_sym = {"ll": 35, "of": 31, "ml": 52}[kind]
    if mode == 0:  # predefined
        counts, al = default
        key = ("pre", kind)
        if key not in state:
            state[key] = (_fse_build_dtable(counts, al), al)
        table = state[key]
    elif mode == 1:  # RLE: 1 byte = the only symbol, 0-bit updates
        if pos >= len(block):
            raise ValueError("zstd: truncated RLE sequence table")
        sym = block[pos]
        pos += 1
        if sym > max_sym:
            raise ValueError(f"zstd: RLE {kind} symbol out of range")
        table = ([(sym, 0, 0)], 0)
    elif mode == 2:  # FSE-compressed description
        fb = _ForwardBits(bytes(block[pos:]))
        counts, al = _fse_read_ncount(fb, max_sym + 1,
                                      _MAX_ACCURACY[kind])
        pos += fb.bytes_consumed()
        table = (_fse_build_dtable(counts, al), al)
    else:  # repeat
        table = state.get(("rep", kind))
        if table is None:
            raise ValueError(f"zstd: repeat {kind} table with no previous")
    state[("rep", kind)] = table
    return table, pos


def _decode_block(
    block: memoryview, out: bytearray, huf_state: dict, seq_state: dict,
    rep: list[int], limit: int,
) -> None:
    """One compressed block (§3.1.1.3) appended onto the frame output.

    ``limit`` is the absolute cap on ``len(out)`` (block start +
    min(Block_Maximum_Size, remaining frame/caller budget)), enforced
    INSIDE the sequence loop: a crafted block (RLE sequence tables with
    0-bit updates, ML code 52) regenerates ~131 KiB per sequence x
    ~65k sequences ~= 8.5 GB from <= 128 KiB of input, so a check that
    only runs after the block returns is not a bomb bound at all
    (ADVICE r12: 3 KB input materialized 136 MB before the frame-level
    check fired). Per-sequence enforcement overshoots by at most one
    sequence (~1.2 MiB: literals run + one match)."""
    lits, pos = _decode_literals(block, pos=0, huf_state=huf_state)
    if pos >= len(block):
        raise ValueError("zstd: missing sequences section")
    b0 = block[pos]
    pos += 1
    if b0 < 128:
        n_seq = b0
    elif b0 < 255:
        if pos >= len(block):
            raise ValueError("zstd: truncated sequence count")
        n_seq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        if pos + 2 > len(block):
            raise ValueError("zstd: truncated sequence count")
        n_seq = int.from_bytes(block[pos:pos + 2], "little") + 0x7F00
        pos += 2
    if n_seq == 0:
        if pos != len(block):
            raise ValueError("zstd: trailing bytes after empty sequences")
        out += lits
        if len(out) > limit:
            raise ValueError("zstd: block output exceeds bound "
                             "mid-decode")
        return
    if pos >= len(block):
        raise ValueError("zstd: missing symbol compression modes")
    scm = block[pos]
    pos += 1
    if scm & 3:
        raise ValueError("zstd: reserved symbol-compression-mode bits set")
    (ll_tab, ll_al), pos = _read_seq_table(
        block, pos, (scm >> 6) & 3, "ll", _LL_DEFAULT, seq_state)
    (of_tab, of_al), pos = _read_seq_table(
        block, pos, (scm >> 4) & 3, "of", _OF_DEFAULT, seq_state)
    (ml_tab, ml_al), pos = _read_seq_table(
        block, pos, (scm >> 2) & 3, "ml", _ML_DEFAULT, seq_state)

    br = _BackwardBits(bytes(block[pos:]))
    s_ll = br.read(ll_al)
    s_of = br.read(of_al)
    s_ml = br.read(ml_al)
    if br.overflowed:
        raise ValueError("zstd: sequence bitstream too short for init")
    # hot loop: bit reads are inlined on local state (method-call
    # overhead measured ~2x of decode wall at shard scale); each
    # multi-field group is extracted in ONE int.from_bytes window —
    # earlier-read fields sit in the higher bits of a backward stream
    data = br.data
    bits = br.bits
    fb = int.from_bytes
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_tab[s_of][0]
        ml_code = ml_tab[s_ml][0]
        ll_code = ll_tab[s_ll][0]
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        ml_base, ml_bits = _ML_BASE_BITS[ml_code]
        ll_base, ll_bits = _LL_BASE_BITS[ll_code]
        n = of_code + ml_bits + ll_bits
        bits -= n
        if bits < 0:
            raise ValueError("zstd: sequence bitstream exhausted early")
        if n:
            grp = (fb(data[bits >> 3:(bits + n + 7) >> 3], "little")
                   >> (bits & 7)) & ((1 << n) - 1)
            ll = ll_base + (grp & ((1 << ll_bits) - 1))
            grp >>= ll_bits
            ml = ml_base + (grp & ((1 << ml_bits) - 1))
            of_value = (1 << of_code) + (grp >> ml_bits)
        else:
            ll, ml, of_value = ll_base, ml_base, 1 << of_code
        # repeat-offset resolution (§3.1.1.5), incl. the ll==0 twist
        if of_value > 3:
            offset = of_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                offset = rep[0] - 1
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if offset <= 0:
            raise ValueError("zstd: zero match offset")
        if lit_pos + ll > len(lits):
            raise ValueError("zstd: literals overrun")
        out += lits[lit_pos:lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond decoded history "
                             "(dictionaries unsupported)")
        if ml:
            start = len(out) - offset
            if offset >= ml:
                out += out[start:start + ml]
            else:
                # overlapping copy: byte-sequential semantics == the
                # period-offset pattern replicated, O(ml/offset) slice
                # ops instead of ml Python-level appends
                seg = bytes(out[start:])
                out += (seg * (ml // offset + 1))[:ml]
        if len(out) > limit:
            raise ValueError("zstd: block output exceeds bound "
                             "mid-decode")
        if i != n_seq - 1:
            e1 = ll_tab[s_ll]
            e2 = ml_tab[s_ml]
            e3 = of_tab[s_of]
            n = e1[1] + e2[1] + e3[1]
            bits -= n
            if bits < 0:
                raise ValueError("zstd: sequence bitstream exhausted "
                                 "early")
            if n:
                grp = (fb(data[bits >> 3:(bits + n + 7) >> 3], "little")
                       >> (bits & 7)) & ((1 << n) - 1)
                s_of = e3[2] + (grp & ((1 << e3[1]) - 1))
                grp >>= e3[1]
                s_ml = e2[2] + (grp & ((1 << e2[1]) - 1))
                s_ll = e1[2] + (grp >> e2[1])
            else:
                s_ll, s_ml, s_of = e1[2], e2[2], e3[2]
    if bits != 0:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    out += lits[lit_pos:]
    if len(out) > limit:
        raise ValueError("zstd: block output exceeds bound mid-decode")


def _decode_frame(
    data: memoryview, pos: int, max_output: int | None = None
) -> tuple[bytearray, int]:
    if pos + 6 > len(data):
        raise ValueError("zstd: truncated frame header")
    fhd = data[pos + 4]
    pos += 5
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    if (fhd >> 3) & 1:
        raise ValueError("zstd: reserved frame-header bit set")
    checksum_flag = (fhd >> 2) & 1
    did_flag = fhd & 3
    window_size = None
    if not single_segment:
        wd = data[pos]  # window descriptor (whole frame decodes in memory)
        pos += 1
        wbase = 1 << (10 + (wd >> 3))
        window_size = wbase + (wbase >> 3) * (wd & 7)
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if pos + did_size > len(data):
            raise ValueError("zstd: truncated dictionary id")
        if int.from_bytes(data[pos:pos + did_size], "little") != 0:
            raise ValueError("zstd: dictionaries unsupported")
        pos += did_size
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        if pos + fcs_size > len(data):
            raise ValueError("zstd: truncated frame content size")
        fcs = int.from_bytes(data[pos:pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    if single_segment:
        window_size = fcs  # RFC 8878 3.1.1.1.2: Window_Size = FCS
    # RFC 8878 3.1.1.2.3-4: no block regenerates more than
    # min(Window_Size, 128 KiB). Enforcing it per block (and capping at
    # the declared FCS as soon as it is exceeded, not at frame end)
    # fails crafted/corrupt FCS-bearing frames at the offending block.
    # A no-FCS frame (legal streaming output) is only LINEARLY bounded
    # by these per-block caps (<= 32768x input: >= 4 bytes in per
    # <= 128 KiB block out), so callers decoding untrusted bytes pass
    # max_output for a hard ceiling — the format itself permits a 1 MiB
    # stream that regenerates 32 GiB.
    block_max = min(window_size, 131072)  # single-segment always has FCS
    hard_cap = fcs if max_output is None else (
        max_output if fcs is None else min(fcs, max_output))

    out = bytearray()
    huf_state: dict = {"table": None}
    seq_state: dict = {}
    rep = [1, 4, 8]
    while True:
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated block header")
        bh = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype != 3 and bsize > block_max:
            raise ValueError("zstd: block exceeds Block_Maximum_Size")
        before = len(out)
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise ValueError("zstd: truncated raw block")
            out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: bsize = regenerated size, 1 content byte
            if pos + 1 > len(data):
                raise ValueError("zstd: truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if pos + bsize > len(data):
                raise ValueError("zstd: truncated compressed block")
            limit = before + block_max
            if hard_cap is not None and hard_cap < limit:
                limit = hard_cap
            _decode_block(data[pos:pos + bsize], out, huf_state,
                          seq_state, rep, limit)
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if len(out) - before > block_max:
            raise ValueError("zstd: block regenerates past "
                             "Block_Maximum_Size")
        if hard_cap is not None and len(out) > hard_cap:
            if fcs is not None and len(out) > fcs:
                raise ValueError("zstd: output exceeds declared frame "
                                 "content size")
            raise ValueError("zstd: output exceeds caller max_output "
                             "bound")
        if last:
            break
    if fcs is not None and len(out) != fcs:
        raise ValueError("zstd: frame content size mismatch")
    if checksum_flag:
        if pos + 4 > len(data):
            raise ValueError("zstd: truncated content checksum")
        want = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if xxh64(bytes(out)) & 0xFFFFFFFF != want:
            raise ValueError("zstd: content checksum mismatch")
    return out, pos


def untrusted_max_output(n_in: int) -> int:
    """The repo's one untrusted-bytes output ceiling: 512x the
    compressed input (text lands ~3-10x; 512x covers any real corpus
    ratio) with a 1 GiB floor so tiny-but-dense payloads stay
    decodable. Shared by every decompressor fed attacker-controllable
    bytes (jsonl.zst shards, Avro block codecs) so the policy can't
    silently diverge per call site."""
    return max(1 << 30, 512 * n_in)


def bounded_decompress(
    d, payload: bytes, cap: int, what: str, allow_trailing: bool = False
) -> bytes:
    """Run an incremental stdlib decompressor (zlib.decompressobj /
    bz2.BZ2Decompressor / lzma.LZMADecompressor — all share the
    decompress(data, max_length)/eof/unused_data protocol) to
    completion under an output cap. Raises ValueError past the cap, on
    a truncated stream (eof never reached — the one-shot module-level
    functions raised here too; an incremental decompressor silently
    returns the partial prefix instead, which is how two truncation
    guards got dropped when this pattern was hand-copied per codec),
    and on trailing data after the stream unless ``allow_trailing``
    (callers walking concatenated streams read ``d.unused_data``)."""
    out = d.decompress(payload, cap + 1)
    if len(out) > cap:
        raise ValueError(f"{what} exceeds output bound")
    if not d.eof:
        raise ValueError(f"{what} truncated")
    if not allow_trailing and d.unused_data:
        raise ValueError(f"{what} has trailing data")
    return out


def decompress(data: bytes, max_output: int | None = None) -> bytes:
    """Decode a sequence of zstd frames (skippable frames skipped).

    ``max_output`` caps the CUMULATIVE regenerated size mid-decode
    (ValueError past it). FCS-bearing frames are always capped at their
    declared size; pass ``max_output`` when decoding untrusted bytes
    because a no-FCS streaming frame is otherwise only bounded by the
    format's ~32768x-per-input-byte legal expansion."""
    mv = memoryview(data)
    out = bytearray()
    pos = 0
    if not data:
        raise ValueError("zstd: empty input")
    while pos < len(mv):
        if pos + 4 > len(mv):
            raise ValueError("zstd: truncated frame magic")
        magic = int.from_bytes(mv[pos:pos + 4], "little")
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            if pos + 8 > len(mv):
                raise ValueError("zstd: truncated skippable frame")
            sz = int.from_bytes(mv[pos + 4:pos + 8], "little")
            if pos + 8 + sz > len(mv):
                raise ValueError("zstd: truncated skippable frame body")
            pos += 8 + sz
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError("zstd: bad frame magic")
        remaining = None if max_output is None else max_output - len(out)
        frame, pos = _decode_frame(mv, pos, remaining)
        out += frame
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder: greedy LZ77 + predefined-FSE sequences (raw literals), with
# raw/RLE store blocks as the incompressible fallback
# ---------------------------------------------------------------------------


def _fse_build_etable(
    counts: list[int], al: int
) -> dict[int, list[tuple[int, int, int]]]:
    """Encode table: symbol -> its decode-table cells as (state,
    nb_bits, base_state), state-ascending. Encoding walks the sequence
    chain BACKWARD picking, for each symbol, the unique state whose
    transition window [base, base + 2^nb) contains the already-chosen
    next state (the classic FSE encoder, expressed directly against
    the decode table so both sides share one table construction)."""
    table = _fse_build_dtable(counts, al)
    by_sym: dict[int, list[tuple[int, int, int]]] = {}
    for state, (s, nb, base) in enumerate(table):
        by_sym.setdefault(s, []).append((state, nb, base))
    return by_sym


def _fse_pick_state(
    etable: dict[int, list[tuple[int, int, int]]], sym: int, nxt: int
) -> tuple[int, int, int]:
    """The state for ``sym`` that can transition to decoder state
    ``nxt``: base <= nxt < base + 2^nb. Exactly one exists."""
    for state, nb, base in etable[sym]:
        if base <= nxt < base + (1 << nb):
            return state, nb, nxt - base
    raise AssertionError("FSE encode: no state reaches target")


_LL_ETABLE = _fse_build_etable(*_LL_DEFAULT)
_OF_ETABLE = _fse_build_etable(*_OF_DEFAULT)
_ML_ETABLE = _fse_build_etable(*_ML_DEFAULT)


def _ll_code(ll: int) -> tuple[int, int, int]:
    """Literal length -> (code, extra_bits, extra_value)."""
    if ll < 16:
        return ll, 0, 0
    for code in range(len(_LL_BASE_BITS) - 1, 15, -1):
        base, bits = _LL_BASE_BITS[code]
        if ll >= base:
            return code, bits, ll - base
    raise AssertionError


def _ml_code(ml: int) -> tuple[int, int, int]:
    if ml < 35:
        return ml - 3, 0, 0
    for code in range(len(_ML_BASE_BITS) - 1, 31, -1):
        base, bits = _ML_BASE_BITS[code]
        if ml >= base:
            return code, bits, ml - base
    raise AssertionError


def _pack_backward(fields: list[tuple[int, int]]) -> bytes:
    """Serialize (value, nb_bits) fields into a backward bitstream:
    field 0 sits immediately below the sentinel bit, later fields
    below it — exactly the order a _BackwardBits reader consumes.
    O(1) byte-ops per field (no big-int shifting)."""
    total = sum(nb for _, nb in fields)
    out = bytearray((total + 8) >> 3)
    out[total >> 3] |= 1 << (total & 7)  # sentinel
    pos = total
    for val, nb in fields:
        if nb == 0:
            continue
        pos -= nb
        v = val << (pos & 7)
        idx = pos >> 3
        while v:
            out[idx] |= v & 0xFF
            v >>= 8
            idx += 1
    return bytes(out)


def _huf_assign_weights(freq: dict[int, int]) -> list[int] | None:
    """Length-limited (<= 11 bit) canonical Huffman weights for the
    present literal alphabet, positional through the highest present
    symbol. None only for degenerate inputs (< 2 distinct symbols —
    the RLE literals path — or an unsatisfiable Kraft promotion); the
    caller picks the tree-description FORM (direct 4-bit weights vs
    FSE-compressed) by alphabet reach. Lengths come from a standard
    Huffman heap, clamped to 11 with a Kraft-restoring fixup; weights
    w = table_log + 1 - nbBits."""
    import heapq

    if len(freq) < 2:
        return None    # single-symbol literals take the RLE block path
    max_sym = max(freq)
    heap = [(f, i, ("leaf", s)) for i, (s, f) in enumerate(freq.items())]
    heapq.heapify(heap)
    i = len(heap)
    while len(heap) > 1:
        fa, _, a = heapq.heappop(heap)
        fb, _, b = heapq.heappop(heap)
        heapq.heappush(heap, (fa + fb, i, ("node", a, b)))
        i += 1
    depths: dict[int, int] = {}
    stack = [(heap[0][2], 0)]
    while stack:
        node, d = stack.pop()
        if node[0] == "leaf":
            depths[node[1]] = max(d, 1)
        else:
            stack.append((node[1], d + 1))
            stack.append((node[2], d + 1))
    # clamp to 11 and restore Kraft equality (sum 2^-len == 1):
    # overlong leaves move up to 11, then the deepest short leaves are
    # demoted one level at a time until the sum is exact again
    LIMIT = _HUF_MAX_TABLELOG
    for s in depths:
        if depths[s] > LIMIT:
            depths[s] = LIMIT
    unit = 1 << LIMIT  # work in 2^-LIMIT units
    kraft = sum(unit >> d for d in depths.values())
    while kraft > unit:
        # demote a deepest-but-not-at-limit leaf by one level
        cand = max(
            (s for s, d in depths.items() if d < LIMIT),
            key=lambda s: (depths[s], -freq[s]),
        )
        kraft -= unit >> depths[cand]
        depths[cand] += 1
        kraft += unit >> depths[cand]
    while kraft < unit:
        # promote the shallowest candidate whose promotion still fits
        cand = min(
            (s for s, d in depths.items()
             if kraft - (unit >> d) + (unit >> (d - 1)) <= unit
             and d > 1),
            key=lambda s: depths[s],
            default=None,
        )
        if cand is None:
            return None
        kraft -= unit >> depths[cand]
        depths[cand] -= 1
        kraft += unit >> depths[cand]
    table_log = max(depths.values())
    weights = [0] * (max_sym + 1)
    for s, d in depths.items():
        weights[s] = table_log + 1 - d
    return weights


class _ForwardBitWriter:
    """LSB-first forward writer — the inverse of _ForwardBits."""

    __slots__ = ("acc", "bits", "out")

    def __init__(self):
        self.acc = 0
        self.bits = 0
        self.out = bytearray()

    def write(self, value: int, nb: int) -> None:
        self.acc |= value << self.bits
        self.bits += nb
        while self.bits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.bits -= 8

    def finish(self) -> bytes:
        if self.bits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _fse_write_ncount(counts: list[int], al: int) -> bytes:
    """Serialize normalized counts as an FSE table description — the
    exact inverse of _fse_read_ncount's variable-width state machine
    (short field when value < max_low, +max_low bias past threshold,
    2-bit zero-run flags)."""
    if sum(abs(c) for c in counts) != 1 << al:
        # A mis-normalized table would make the loop below never reach
        # remaining <= 1; must survive python -O, so not an assert.
        raise ValueError("zstd: ncount writer needs normalized counts "
                         f"summing to {1 << al}")
    w = _ForwardBitWriter()
    w.write(al - 5, 4)
    remaining = (1 << al) + 1
    threshold = 1 << al
    nbits = al + 1
    i = 0
    while remaining > 1:
        c = counts[i] if i < len(counts) else 0
        i += 1
        value = c + 1
        max_low = (2 * threshold - 1) - remaining
        if value < max_low:
            w.write(value, nbits - 1)
        elif value < threshold:
            w.write(value, nbits)
        else:
            w.write(value + max_low, nbits)
        remaining -= -c if c < 0 else c
        if remaining <= 1:
            break
        if c == 0:
            # count the zero run that follows and emit 2-bit flags
            run = 0
            while i + run < len(counts) and counts[i + run] == 0:
                run += 1
            r = run
            while r >= 3:
                w.write(3, 2)
                r -= 3
            w.write(r, 2)
            i += run
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
    return w.finish()


def _huf_fse_weights(weights_series: list[int]) -> bytes | None:
    """FSE-compressed Huffman tree description (headerByte < 128):
    normalized weight distribution + interleaved-2-state backward
    stream, laid out so _fse_decode_interleaved's termination emits
    exactly this series. None when the series can't take this form
    (fewer than 2 items or a single distinct weight value)."""
    n = len(weights_series)
    if n < 2 or len(set(weights_series)) < 2:
        return None
    al = 6
    size = 1 << al
    max_w = max(weights_series)
    freq = [0] * (max_w + 1)
    for v in weights_series:
        freq[v] += 1
    # largest-remainder normalization to 2^al, every present value >= 1
    counts = [0] * (max_w + 1)
    shares = [(f * size / n, v) for v, f in enumerate(freq) if f]
    for share, v in shares:
        counts[v] = max(1, int(share))
    diff = size - sum(counts)
    order = sorted(shares, key=lambda t: t[0] - int(t[0]), reverse=True)
    k = 0
    while diff != 0:
        _, v = order[k % len(order)]
        if diff > 0:
            counts[v] += 1
            diff -= 1
        elif counts[v] > 1:
            counts[v] -= 1
            diff += 1
        k += 1
        if k > 10 * size:
            return None
    desc = _fse_write_ncount(counts, al)
    etab = _fse_build_etable(counts, al)
    # split emissions into the two alternating chains: e_k even -> s1
    chain1 = weights_series[0::2]
    chain2 = weights_series[1::2]

    def assign(chain: list[int], tail_needs_bits: bool):
        states = [0] * len(chain)
        trans: list[tuple[int, int]] = [(0, 0)] * (len(chain) - 1)
        cand = etab[chain[-1]]
        if tail_needs_bits:
            cand = [e for e in cand if e[1] >= 1] or cand
        states[-1] = cand[0][0]
        for j in range(len(chain) - 2, -1, -1):
            st, nb, delta = _fse_pick_state(etab, chain[j], states[j + 1])
            states[j] = st
            trans[j] = (delta, nb)
        return states[0], trans

    # e_{n-2}'s update read must OVERFLOW (nb >= 1) so the decoder
    # stops after exactly n emissions; e_{n-2} is the tail of its chain
    tail2_in_chain1 = (n - 2) % 2 == 0
    s1_0, t1 = assign(chain1, tail_needs_bits=tail2_in_chain1)
    s2_0, t2 = assign(chain2, tail_needs_bits=not tail2_in_chain1)
    # genuine reads in stream order: init1, init2, r_0 .. r_{n-3};
    # r_k updates e_k's chain (k even -> chain1 transition k//2)
    fields: list[tuple[int, int]] = [(s1_0, al), (s2_0, al)]
    for k2 in range(n - 2):
        if k2 % 2 == 0:
            fields.append(t1[k2 // 2])
        else:
            fields.append(t2[k2 // 2])
    stream = _pack_backward(fields)
    blob = desc + stream
    if len(blob) >= 128:  # headerByte must stay < 128
        return None
    # self-check THE FULL BLOB through the shared reader (ncount
    # description AND interleaved stream — checking only the stream
    # would let an ncount-writer bug ship; r11 review finding). Cheap:
    # the tree description is < 128 bytes.
    full = bytes([len(blob)]) + blob
    try:
        decoded, _ = _huf_read_weights(full, 0)
    except ValueError:
        return None
    if decoded[:-1] != weights_series:
        return None
    return full


def _huf_encode_literals(lits: bytes) -> bytes | None:
    """Huffman-compressed literals section (4-stream, direct-weight
    tree description), or None when raw literals are smaller. The
    produced section is exactly what _decode_literals reads back."""
    n = len(lits)
    if n < 64:
        return None
    from collections import Counter

    freq: dict[int, int] = dict(Counter(lits))  # C-speed byte census
    weights = _huf_assign_weights(freq)
    if weights is None:
        return None
    table, table_log = _huf_build_dtable(list(weights))
    # canonical codes straight off the decode-table fill: symbol s
    # with weight w occupies cells [pos, pos + 2^(w-1)), so its code
    # is pos >> (w-1)
    codes: dict[int, tuple[int, int]] = {}
    pos = 0
    for w in range(1, table_log + 2):
        span = 1 << (w - 1)
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            codes[sym] = (pos >> (w - 1), table_log + 1 - w)
            pos += span
    # tree description: direct 4-bit weights when the series fits the
    # headerByte's 128-weight cap, FSE-compressed weights otherwise
    # (the UTF-8/high-byte alphabet case)
    series = weights[:-1]  # last weight is deduced by the reader
    if len(series) <= 128:
        desc = bytearray([127 + len(series)])
        for i in range(0, len(series), 2):
            hi = series[i] << 4
            lo = series[i + 1] if i + 1 < len(series) else 0
            desc.append(hi | lo)
        desc = bytes(desc)
    else:
        desc = _huf_fse_weights(series)
        if desc is None:
            return None
    est = sum(f * codes[s][1] for s, f in freq.items()) // 8
    if est + len(desc) + 6 + 8 >= n:
        return None
    # 4 streams
    share = (n + 3) >> 2
    streams = []
    for k in range(4):
        part = lits[k * share:(k + 1) * share] if k < 3 else \
            lits[3 * share:]
        if not part:
            return None  # stream 4 empty only when n < 4 (filtered)
        streams.append(_pack_backward([codes[b] for b in part]))
    if max(len(s) for s in streams[:3]) > 0xFFFF:
        return None  # jump-table fields are uint16
    jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
    payload = bytes(desc) + jump + b"".join(streams)
    comp = len(payload)
    # literals section header: type=2 (compressed); pick the smallest
    # size format whose field widths hold (reg, comp)
    if n < 1024 and comp < 1024:
        hdr = (2 | (0b01 << 2) | (n << 4)
               | (comp << 14)).to_bytes(3, "little")
    elif n < 16384 and comp < 16384:
        hdr = (2 | (0b10 << 2) | (n << 4)
               | (comp << 18)).to_bytes(4, "little")
    else:
        hdr = (2 | (0b11 << 2) | (n << 4)
               | (comp << 22)).to_bytes(5, "little")
    section = bytes(hdr) + payload
    return section if len(section) < n + 3 else None


_CHAIN = 8  # candidates kept per 4-byte hash


def _extend(chunk: bytes, cand: int, i: int, n: int) -> int:
    """Match length of chunk[cand:] vs chunk[i:], 16-byte strides."""
    ml = 4
    limit = n - i
    while ml + 16 <= limit and (
        chunk[cand + ml:cand + ml + 16] == chunk[i + ml:i + ml + 16]
    ):
        ml += 16
    while ml < limit and chunk[cand + ml] == chunk[i + ml]:
        ml += 1
    return ml


def _best_match(chunk, tab, key, i, n) -> tuple[int, int]:
    """(match_len, candidate_pos) of the longest candidate on the
    chain (ties: most recent = smallest offset), or (0, 0)."""
    best_ml, best_c = 0, 0
    for cand in reversed(tab.get(key, ())):
        if cand >= i:  # the chain already holds position i itself
            continue
        # no probe re-check needed: chains are keyed by the exact
        # 4-byte value, so every candidate matches by construction.
        # Gallop check: a candidate can only beat the current best if
        # it also matches at offset best_ml — one byte compare prunes
        # the full extension for most losers
        if best_ml:
            if i + best_ml >= n:
                break  # nothing can extend past the block end
            if chunk[cand + best_ml] != chunk[i + best_ml]:
                continue
        ml = _extend(chunk, cand, i, n)
        if ml > best_ml:
            best_ml, best_c = ml, cand
    return best_ml, best_c


def _find_sequences(
    chunk: bytes, level: int = 3
) -> list[tuple[int, int, int]]:
    """LZ77 over one block: (literal_run, offset, match_len) triples;
    a trailing literal run is returned as (run, 0, 0). Min match 4,
    bounded hash CHAINS of 4-byte prefixes picking the longest
    candidate, one-step-lazy commit (take the match at i+1 when it
    beats i's), in-block offsets only (the format allows cross-block
    history; staying inside the block keeps the matcher single-pass).
    ``level <= 1`` drops to a single-slot greedy matcher (~5x the
    throughput for ~20% more bytes — the zstd speed/ratio dial)."""
    n = len(chunk)
    if level <= 1:
        # single-slot greedy fast path: inline dict ops, no helper
        # calls (the chain machinery's per-position overhead costs
        # ~9x at this level — measured r11)
        seqs1: list[tuple[int, int, int]] = []
        last4: dict[int, int] = {}
        lit_start = 0
        i = 0
        fb = int.from_bytes
        while i + 4 <= n:
            key = fb(chunk[i:i + 4], "little")
            cand = last4.get(key)
            last4[key] = i
            if cand is not None:
                ml = _extend(chunk, cand, i, n)
                seqs1.append((i - lit_start, i - cand, ml))
                step = 1 if ml <= 32 else ml // 16
                for j in range(i + 1, i + ml, step):
                    if j + 4 <= n:
                        last4[fb(chunk[j:j + 4], "little")] = j
                i += ml
                lit_start = i
            else:
                i += 1
        if lit_start < n:
            seqs1.append((n - lit_start, 0, 0))
        return seqs1
    chain_max = _CHAIN
    lazy = True
    seqs: list[tuple[int, int, int]] = []
    tab: dict[int, list[int]] = {}

    def index(j: int) -> int:
        key = int.from_bytes(chunk[j:j + 4], "little")
        chain = tab.setdefault(key, [])
        chain.append(j)
        if len(chain) > chain_max:
            del chain[0]
        return key

    lit_start = 0
    i = 0
    while i + 4 <= n:
        key = index(i)
        ml, cand = _best_match(chunk, tab, key, i, n)
        if not ml:
            i += 1
            continue
        probed_next = False
        if lazy and i + 5 <= n:
            # a longer match starting one later wins
            key2 = index(i + 1)
            probed_next = True
            ml2, cand2 = _best_match(chunk, tab, key2, i + 1, n)
            if ml2 > ml + 1:
                i += 1
                ml, cand = ml2, cand2
                probed_next = False  # new i+1 is unindexed
        seqs.append((i - lit_start, i - cand, ml))
        # index a few positions inside the match so later runs still
        # see recent history without a full per-byte walk (skipping a
        # position the declined lazy probe already indexed — a
        # duplicate would evict a genuine older chain candidate)
        step = 1 if ml <= 32 else ml // 16
        for j in range(i + 1, i + ml, step):
            if j + 4 <= n and not (probed_next and j == i + 1):
                index(j)
        i += ml
        lit_start = i
    if lit_start < n:
        seqs.append((n - lit_start, 0, 0))
    return seqs


def _encode_block_lz(
    chunk: bytes, level: int = 3, frame_rep: list[int] | None = None
) -> bytes | None:
    """One compressed block (Huffman/RLE/raw literals + predefined-FSE
    sequences), or None when the result would not beat the raw block.
    ``frame_rep`` is the FRAME's repeat-offset history (RFC 8878
    carries it across blocks, not per block — r11 review finding);
    it is mutated only when a block is actually emitted."""
    triples = _find_sequences(chunk, level)
    seqs = [t for t in triples if t[2] > 0]
    if not seqs:
        # no matches: a Huffman-literals-only block can still win
        huf = _huf_encode_literals(chunk)
        if huf is None:
            return None
        blk = huf + b"\x00"  # Number_of_Sequences = 0
        return blk if len(blk) < len(chunk) else None
    # literals = concatenation of the runs, in order
    lits = bytearray()
    pos = 0
    for run, off, ml in triples:
        lits += chunk[pos:pos + run]
        pos += run + ml
    # per-sequence codes; a trailing literal run needs no sequence —
    # the decoder appends leftover literals after the last one
    ll_codes, of_codes, ml_codes = [], [], []
    extras: list[list[tuple[int, int]]] = []  # per seq: read-order fields
    # work on a COPY of the frame history: a raw-block fallback after
    # this point must leave the caller's rep state untouched (the
    # decoder's rep only advances inside EMITTED compressed blocks)
    rep = list(frame_rep) if frame_rep is not None else [1, 4, 8]
    for run, off, ml in seqs:
        lc, lb, lv = _ll_code(run)
        # prefer a repeat-offset code (0-1 extra bits vs ~log2(off)):
        # simulate the decoder's ov -> offset mapping, ll==0 twist incl.
        of_value = 0
        for ov in (1, 2, 3):
            idx = ov - 1 + (1 if run == 0 else 0)
            got = (rep[0], rep[1], rep[2], rep[0] - 1)[idx]
            if got == off and got > 0:
                of_value = ov
                if idx == 1:
                    rep[0], rep[1] = rep[1], rep[0]
                elif idx == 2:
                    rep[0], rep[1], rep[2] = rep[2], rep[0], rep[1]
                elif idx == 3:
                    rep[0], rep[1], rep[2] = rep[0] - 1, rep[0], rep[1]
                break
        if not of_value:
            of_value = off + 3
            rep[0], rep[1], rep[2] = off, rep[0], rep[1]
        oc = of_value.bit_length() - 1
        ov_extra = of_value - (1 << oc)
        mc, mb, mv = _ml_code(ml)
        if oc > 28:  # predefined OF alphabet tops out at code 28
            return None
        ll_codes.append(lc)
        of_codes.append(oc)
        ml_codes.append(mc)
        extras.append([(ov_extra, oc), (mv, mb), (lv, lb)])
    n_seq = len(seqs)
    # FSE state chains, assigned backward (X_i -> X_{i+1} windows)
    def chain(codes: list[int], etab) -> tuple[int, list[tuple[int, int]]]:
        states = [0] * n_seq
        bits: list[tuple[int, int]] = [(0, 0)] * (n_seq - 1)
        states[-1] = etab[codes[-1]][0][0]
        for i in range(n_seq - 2, -1, -1):
            st, nb, delta = _fse_pick_state(etab, codes[i], states[i + 1])
            states[i] = st
            bits[i] = (delta, nb)
        return states[0], bits

    ll0, ll_bits = chain(ll_codes, _LL_ETABLE)
    of0, of_bits = chain(of_codes, _OF_ETABLE)
    ml0, ml_bits = chain(ml_codes, _ML_ETABLE)
    # bitstream fields in DECODER read order
    fields: list[tuple[int, int]] = [
        (ll0, _LL_DEFAULT[1]), (of0, _OF_DEFAULT[1]), (ml0, _ML_DEFAULT[1]),
    ]
    for i in range(n_seq):
        fields += extras[i]
        if i != n_seq - 1:
            fields.append(ll_bits[i])
            fields.append(ml_bits[i])
            fields.append(of_bits[i])
    stream = _pack_backward(fields)

    out = bytearray()
    nl = len(lits)
    huf = _huf_encode_literals(bytes(lits))
    if huf is not None:
        out += huf
    elif nl >= 2 and lits.count(lits[0]) == nl:
        # RLE literals: one byte regenerated nl times
        if nl < 32:
            out.append(1 | (nl << 3))
        elif nl < 4096:
            out += ((nl << 4) | 0b0101).to_bytes(2, "little")
        else:
            out += ((nl << 4) | 0b1101).to_bytes(3, "little")
        out.append(lits[0])
    else:
        # raw literals section header
        if nl < 32:
            out.append(nl << 3)
        elif nl < 4096:
            out += ((nl << 4) | 0b0100).to_bytes(2, "little")
        else:
            out += ((nl << 4) | 0b1100).to_bytes(3, "little")
        out += lits
    if n_seq < 128:
        out.append(n_seq)
    elif n_seq < 0x7F00:
        out.append((n_seq >> 8) + 128)
        out.append(n_seq & 0xFF)
    else:
        out.append(255)
        out += (n_seq - 0x7F00).to_bytes(2, "little")
    out.append(0x00)  # all three alphabets: predefined mode
    out += stream
    if len(out) >= len(chunk):
        return None
    if frame_rep is not None:  # block accepted: commit the history
        frame_rep[:] = rep
    return bytes(out)


def compress(
    data: bytes, checksum: bool = True, store: bool = False,
    level: int = 3,
) -> bytes:
    """Encode ``data`` as one zstd frame: LZ77 + Huffman literals +
    predefined-FSE compressed blocks where they win, raw/RLE blocks
    otherwise (always with ``store=True``), exact content size
    declared, xxh64 content checksum by default — decodable by every
    conforming implementation (round-tripped against zstd-jni in
    tests). ``level`` is the speed/ratio dial: 1 = single-slot greedy
    matcher, >= 2 adds hash chains + lazy parsing."""
    n = len(data)
    if n < 256:
        fcs_flag, fcs_bytes = 0, n.to_bytes(1, "little")
    elif n < 65536 + 256:
        fcs_flag, fcs_bytes = 1, (n - 256).to_bytes(2, "little")
    elif n < 1 << 32:
        fcs_flag, fcs_bytes = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs_bytes = 3, n.to_bytes(8, "little")
    out = bytearray(ZSTD_MAGIC.to_bytes(4, "little"))
    if n <= 1 << 20:
        # Single_Segment: window = content size, tiny and universal
        out.append((fcs_flag << 6) | (1 << 5)
                   | ((1 if checksum else 0) << 2))
        out += fcs_bytes
    else:
        # big frames declare a 128 KiB window (matches are in-block,
        # blocks are <= 128 KiB, so that bound is honest) instead of
        # Single_Segment's window=content — a multi-GB single-segment
        # frame would exceed default decoder window limits (libzstd
        # caps at 128 MiB by default; RFC 8878 only requires 8 MiB)
        assert fcs_flag >= 1  # n > 1 MiB, so the FCS field exists
        out.append((fcs_flag << 6) | ((1 if checksum else 0) << 2))
        out.append(7 << 3)  # window descriptor: 2^(10+7) = 128 KiB
        out += fcs_bytes
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, raw, size 0
    else:
        pos = 0
        frame_rep = [1, 4, 8]  # rep history is per FRAME (RFC 8878)
        while pos < n:
            chunk = data[pos:pos + _BLOCK_MAX]
            pos += len(chunk)
            last = 1 if pos >= n else 0
            if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
                out += (last | (1 << 1)
                        | (len(chunk) << 3)).to_bytes(3, "little")
                out.append(chunk[0])
                continue
            lz = None if store else _encode_block_lz(chunk, level,
                                                     frame_rep)
            if lz is not None:
                out += (last | (2 << 1)
                        | (len(lz) << 3)).to_bytes(3, "little")
                out += lz
            else:
                out += (last | (len(chunk) << 3)).to_bytes(3, "little")
                out += chunk
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
