"""Pure-Python/numpy baseline JPEG (ITU-T T.81) decoder.

Closes the last stubbed image format in the binary-ingest layer
(``binaryfiles.DECODERS``): baseline sequential DCT, 8-bit precision,
1-component (grayscale) or 3-component (YCbCr, any of 4:4:4 / 4:2:2 /
4:2:0 sampling), restart markers included. The decoder returns the
**luma plane at full resolution** under the single-plane
``(h, w, dtype, px)`` decoder contract that the CT / preview / feature
consumers use (chroma blocks are entropy-decoded to keep the bitstream
in sync, then discarded — mean-intensity, thumbnails and registration
all operate on luma). Out-of-scope variants raise
``NotImplementedError`` (progressive SOF2, arithmetic coding, 12-bit
precision, >3 components) so the multimodal feature path degrades to
NOT_DECODABLE rows instead of failing the batch; corrupt bytes raise
``ValueError``, matching the malformed-TIFF contract.

Spec-conformance verification is offline-bounded the same way the TIFF
LZW codec documents: no reference JPEG library exists in this
container, so the test-only encoder (tests/test_jpeg.py) is derived to
stay in lockstep with this decoder, round-trips cross every structural
feature (sampling modes, restart intervals, odd dimensions, 0xFF byte
stuffing), and the shared constants are pinned against independent
constructions of their published definitions (zigzag by anti-diagonal
walk, the DCT-II basis by direct cosine evaluation + orthonormality,
huffman by the canonical-code recurrence of T.81 Annex C).

Reference cite (mount empty, SURVEY §0): the reference's ingest reads
camera/preview imagery via imageio; this is the offline-pure analogue
for its most common container format.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZIGZAG[k] = linear (row-major) index of the k-th
# coefficient in scan order (T.81 Figure A.6). Pinned by an independent
# anti-diagonal construction in tests/test_jpeg.py.
ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

_UNZIGZAG = np.argsort(np.array(ZIGZAG))  # scan position for each linear idx


def dct_basis() -> np.ndarray:
    """The 8x8 orthonormal DCT-II basis matrix C with
    C[u, x] = alpha(u)/2 * cos((2x+1) u pi / 16); forward DCT of a
    block B is C @ B @ C.T, inverse is C.T @ B @ C. Shared with the
    test-only encoder so the transform pair is exact."""
    c = np.zeros((8, 8))
    for u in range(8):
        alpha = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = alpha * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_DCT = dct_basis()


def build_huffman(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman decode table from a DHT payload: ``bits[i]`` =
    number of codes of length i+1, ``vals`` = symbols in code order.
    Returns {(length, code): symbol} — the T.81 Annex C recurrence
    (codes of each length are consecutive; doubling when the length
    grows)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("JPEG DHT: more codes than symbols")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-stuffing marker (leaves it for the
    caller via ``marker``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:            # stuffed 0xFF data byte
                self.pos += 2
            else:                      # a real marker mid-MCU = corrupt
                raise ValueError(
                    f"JPEG entropy data ran into marker 0xFF{nxt:02X}"
                )
        else:
            self.pos += 1
        # only called at nbits == 0, so REPLACE the accumulator — an
        # |=-append would grow it one byte per scan byte and make the
        # decode quadratic in stream size (measured: minutes on a
        # few-hundred-KB photo)
        self.acc = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG huffman decode: no code matched in 16 bits")

    def align_restart(self, expect: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("JPEG restart marker missing")
        got = self.data[self.pos + 1]
        if got != 0xD0 + expect:
            raise ValueError(
                f"JPEG restart marker out of sequence: 0xFF{got:02X}"
            )
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.12 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(content: bytes, meta: dict) -> tuple[int, int, str, bytes]:
    """Baseline JPEG -> (h, w, 'uint8', luma plane bytes). See module
    docstring for the supported envelope. Corrupt bytes raise ValueError
    (struct/index errors from truncated segments are normalized here);
    out-of-envelope variants raise NotImplementedError."""
    try:
        return _decode_markers(content)
    except (struct.error, IndexError) as e:
        raise ValueError(f"JPEG truncated/corrupt: {e}") from e


def _decode_markers(content: bytes) -> tuple[int, int, str, bytes]:
    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}      # id -> 64 quant values, scan order
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None                        # (h, w, comps) from SOF0/1
    restart_interval = 0
    n = len(content)

    while pos + 2 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        while pos + 1 < n and content[pos + 1] == 0xFF:
            pos += 1                    # fill bytes before a marker (B.1.1.2)
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:              # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                    # standalone markers
        if pos + 2 > n:
            raise ValueError("JPEG segment header truncated")
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        body = content[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment body truncated")
        if marker == 0xDB:              # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                if prec == 0:
                    tab = np.frombuffer(
                        body[i : i + 64], dtype=np.uint8
                    ).astype(np.int32)
                    i += 64
                else:
                    tab = np.frombuffer(
                        body[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                if tab.size != 64:
                    raise ValueError("JPEG DQT table truncated")
                qt[tid] = tab
        elif marker in (0xC0, 0xC1):    # SOF0 baseline / SOF1 ext. seq.
            prec, fh, fw, nc = struct.unpack(">BHHB", body[0:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG {prec}-bit precision not supported offline "
                    "(baseline 8-bit only; plug Pillow into DECODERS)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {nc} components not supported (1 gray / "
                    "3 YCbCr)"
                )
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported offline; baseline "
                "sequential only (plug Pillow into DECODERS)"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (hierarchical/"
                "arithmetic/lossless) not supported offline"
            )
        elif marker == 0xC4:            # DHT
            i = 0
            while i < len(body):
                tclass, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("JPEG DHT truncated")
                (dc_tabs if tclass == 0 else ac_tabs)[tid] = build_huffman(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xDD:            # DRI
            (restart_interval,) = struct.unpack(">H", body[0:2])
        elif marker == 0xDA:            # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tabs = body[1 + si * 2], body[2 + si * 2]
                scan.append((cs, tabs >> 4, tabs & 0x0F))
            return _decode_scan(
                content, pos + seglen, frame, scan, qt, dc_tabs, ac_tabs,
                restart_interval,
            )
        # APPn / COM / everything else: skip
        pos += seglen
    raise ValueError("JPEG: no SOS scan found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan: list,
    qt: dict,
    dc_tabs: dict,
    ac_tabs: dict,
    restart_interval: int,
) -> tuple[int, int, str, bytes]:
    fh, fw, comps = frame
    if len(scan) != len(comps):
        raise NotImplementedError(
            "JPEG non-interleaved multi-scan not supported (baseline "
            "interleaved scan only)"
        )
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    order = []                           # (comp_idx, dc_table, ac_table)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        if td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("JPEG scan references missing huffman table")
        order.append((by_id[cs], dc_tabs[td], ac_tabs[ta]))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("JPEG invalid sampling factors")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    luma = comps[0]
    if luma["h"] != hmax or luma["v"] != vmax:
        raise NotImplementedError(
            "JPEG with subsampled first component not supported (luma "
            "must carry the max sampling factor)"
        )
    if luma["tq"] not in qt:
        raise ValueError("JPEG luma quant table missing")
    lq = qt[luma["tq"]]                  # scan-order quant values

    lb_x = mcux * luma["h"]              # luma blocks per row
    lb_y = mcuy * luma["v"]
    coeffs = np.zeros((lb_y * lb_x, 64), dtype=np.int32)

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                reader.align_restart(rst_n)
                rst_n = (rst_n + 1) % 8
                preds = [0] * len(comps)
            for ci, dct_tab, act_tab in order:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(
                            reader, dct_tab, act_tab, preds, ci
                        )
                        if ci == 0:
                            gx = mx * luma["h"] + bx
                            gy = my * luma["v"] + by
                            coeffs[gy * lb_x + gx] = blk
            mcu_count += 1

    # Dequantize (scan order), inverse zigzag, batch IDCT, level shift.
    deq = (coeffs * lq[np.newaxis, :]).astype(np.float64)
    blocks = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
    pix = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT)
    pix = np.clip(np.round(pix) + 128.0, 0, 255).astype(np.uint8)

    out = np.zeros((lb_y * 8, lb_x * 8), dtype=np.uint8)
    for i in range(pix.shape[0]):
        gy, gx = divmod(i, lb_x)
        out[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] = pix[i]
    return fh, fw, "uint8", out[:fh, :fw].tobytes()


def _decode_block(
    reader: _BitReader, dc_tab: dict, ac_tab: dict, preds: list, ci: int
) -> np.ndarray:
    """One 8x8 block in zigzag/scan order (T.81 F.2.2)."""
    blk = np.zeros(64, dtype=np.int32)
    s = reader.decode_symbol(dc_tab)
    if s > 11:
        raise ValueError(f"JPEG DC magnitude category {s} invalid")
    diff = _extend(reader.receive(s), s)
    preds[ci] += diff
    blk[0] = preds[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                  # ZRL: 16 zeros
                k += 16
                continue
            break                        # EOB
        k += r
        if k >= 64:
            raise ValueError("JPEG AC run overflows block")
        blk[k] = _extend(reader.receive(s), s)
        k += 1
    return blk
