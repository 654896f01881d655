"""Pure-Python/numpy baseline JPEG (ITU-T T.81) decoder.

Closes the last stubbed image format in the binary-ingest layer
(``binaryfiles.DECODERS``): baseline sequential DCT **and progressive
(SOF2, huffman — spectral selection + successive approximation, the
variant real scraped corpora actually contain after baseline)**, at
**8- or 12-bit precision** (12-bit is the medical/scientific archive
variant: level shift 2048, DC categories to 15, uint16 plane out),
1-component (grayscale) or 3-component (YCbCr, any of
4:4:4 / 4:2:2 / 4:2:0 sampling), restart markers included. The decoder
returns the **luma plane at full resolution** under the single-plane
``(h, w, dtype, px)`` decoder contract that the CT / preview / feature
consumers use (in baseline, chroma blocks are entropy-decoded to keep
the bitstream in sync, then discarded; in progressive, chroma-only
scans are independent entropy segments and are skipped at byte level —
mean-intensity, thumbnails and registration all operate on luma).
**Lossless (SOF3, T.81 Annex H)** also decodes — the DICOM/medical
form: huffman-coded predictor differences (all 7 predictors,
modulo-2^16, point transform), single-component, 2..16-bit, exact by
construction. Out-of-scope variants raise ``NotImplementedError``
(arithmetic coding, hierarchical, >3 components) so the
multimodal feature path degrades to NOT_DECODABLE rows instead of
failing the batch; corrupt bytes raise ``ValueError``, matching the
malformed-TIFF contract.

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
    """Baseline or progressive JPEG -> (h, w, 'uint8'|'uint16', luma
    plane bytes — uint16 for 12-bit precision frames). See module
    docstring for the supported envelope. Corrupt
    bytes raise ValueError (struct/index errors from truncated segments
    are normalized here); out-of-envelope variants raise
    NotImplementedError."""
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
    frame = None                # (h, w, comps, prec) from SOF0/1/2/3
    progressive = False
    lossless = False
    prog: _ProgState | None = None
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1 seq, 2 prog,
            #                                         3 lossless (Annex H)
            prec, fh, fw, nc = struct.unpack(">BHHB", body[0:6])
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(
                        f"JPEG lossless precision {prec} outside 2..16"
                    )
                if nc != 1:
                    raise NotImplementedError(
                        "JPEG lossless with >1 component not supported "
                        "(single-plane grayscale only — the DICOM form)"
                    )
            elif prec not in (8, 12):
                raise NotImplementedError(
                    f"JPEG {prec}-bit precision not supported (T.81 DCT "
                    "modes are 8- or 12-bit; plug Pillow into DECODERS)"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {nc} components not supported (1 gray / "
                    "3 YCbCr)"
                )
            if fh == 0 or fw == 0:
                raise ValueError("JPEG zero frame dimension")
            # Bulk-ingest DoS guard: the luma coefficient grid is
            # allocated from the SOF dims BEFORE any entropy decode, so
            # one bit-flipped dimension byte in a corrupt file would
            # otherwise trigger a multi-GB np.zeros (65535x65535 -> 17
            # GB) and OOM the executor instead of raising the
            # documented ValueError. 2^28 px (256 Mpx, ~1 GB of int32
            # coefficients) is far above any real photographic JPEG;
            # plug a streaming decoder in for genuine gigapixel scans.
            if fh * fw > (1 << 28):
                raise ValueError(
                    f"JPEG frame {fw}x{fh} exceeds the 2^28-px decode "
                    "bound (corrupt header, or use a streaming decoder)"
                )
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = (fh, fw, comps, prec)
            progressive = marker == 0xC2
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (hierarchical/"
                "arithmetic) not supported offline"
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
            ss, se = body[1 + ns * 2], body[2 + ns * 2]
            ahal = body[3 + ns * 2]
            ah, al = ahal >> 4, ahal & 0x0F
            if lossless:
                return _decode_lossless_scan(
                    content, pos + seglen, frame, scan, dc_tabs,
                    restart_interval, predictor=ss, pt=al,
                )
            if not progressive:
                return _decode_scan(
                    content, pos + seglen, frame, scan, qt, dc_tabs,
                    ac_tabs, restart_interval,
                )
            if prog is None:
                prog = _ProgState(frame)
            pos = _decode_prog_scan(
                content, pos + seglen, prog, scan, ss, se, ah, al,
                dc_tabs, ac_tabs, restart_interval,
            )
            continue
        # APPn / COM / everything else: skip
        pos += seglen
    if progressive and prog is not None and prog.any_scan:
        return _prog_finish(prog, qt)
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
    fh, fw, comps, prec = frame
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
                            reader, dct_tab, act_tab, preds, ci,
                            11 if prec == 8 else 15,
                        )
                        if ci == 0:
                            gx = mx * luma["h"] + bx
                            gy = my * luma["v"] + by
                            coeffs[gy * lb_x + gx] = blk
            mcu_count += 1

    return fh, fw, ("uint8" if prec == 8 else "uint16"), _idct_plane(
        coeffs, lq, lb_x, lb_y, fh, fw, prec
    )


def _idct_plane(
    coeffs: np.ndarray, lq: np.ndarray, lb_x: int, lb_y: int,
    fh: int, fw: int, prec: int = 8,
) -> bytes:
    """Dequantize (scan order), inverse zigzag, batch IDCT, level shift,
    assemble the block grid, crop to frame dims. Shared by the baseline
    and progressive paths — the accumulated progressive coefficients are
    exactly the baseline quantized coefficients once every scan has been
    applied."""
    deq = (coeffs * lq[np.newaxis, :]).astype(np.float64)
    blocks = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
    pix = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT)
    shift = float(1 << (prec - 1))       # 128 (8-bit) / 2048 (12-bit)
    dt = np.uint8 if prec == 8 else np.uint16
    pix = np.clip(np.round(pix) + shift, 0, (1 << prec) - 1).astype(dt)

    out = np.zeros((lb_y * 8, lb_x * 8), dtype=dt)
    for i in range(pix.shape[0]):
        gy, gx = divmod(i, lb_x)
        out[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] = pix[i]
    return out[:fh, :fw].tobytes()


def _decode_block(
    reader: _BitReader, dc_tab: dict, ac_tab: dict, preds: list, ci: int,
    dc_max: int = 11,
) -> np.ndarray:
    """One 8x8 block in zigzag/scan order (T.81 F.2.2). ``dc_max`` is
    the largest legal DC magnitude category (11 at 8-bit, 15 at
    12-bit precision)."""
    blk = np.zeros(64, dtype=np.int32)
    s = reader.decode_symbol(dc_tab)
    if s > dc_max:
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


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G, huffman coding only.
#
# A progressive file carries the SAME quantized coefficients as a
# baseline file, delivered across multiple scans: DC first/refine scans
# (successive approximation, point transform Al) and per-component AC
# band scans (spectral selection Ss..Se, first/refine). Coefficients
# accumulate in _ProgState; after EOI one dequantize+IDCT pass (shared
# _idct_plane) produces the luma plane. Scans containing no luma are
# skipped at byte level (scans are independent entropy segments), so
# chroma costs nothing beyond the interleaved-DC scan. The refine-scan
# algorithms are ports of the published reference implementation of
# Annex G (libjpeg decode_mcu_DC/AC_refine); the lockstep test encoder
# (tests/test_jpeg.py) exercises spectral selection, successive
# approximation, restart intervals, and EOB-run coding.
# ---------------------------------------------------------------------------


class _ProgState:
    """Per-component coefficient accumulators for a progressive frame."""

    def __init__(self, frame: tuple):
        fh, fw, comps, prec = frame
        self.frame = frame
        self.prec = prec
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
            raise ValueError("JPEG invalid sampling factors")
        if comps[0]["h"] != hmax or comps[0]["v"] != vmax:
            raise NotImplementedError(
                "JPEG with subsampled first component not supported (luma "
                "must carry the max sampling factor)"
            )
        self.mcux = -(-fw // (8 * hmax))
        self.mcuy = -(-fh // (8 * vmax))
        self.bx_pad: list[int] = []
        self.by_pad: list[int] = []
        self.bx_true: list[int] = []
        self.by_true: list[int] = []
        self.coeffs: list[np.ndarray] = []
        for c in comps:
            cw = -(-fw * c["h"] // hmax)     # ceil(fw * h / hmax)
            ch = -(-fh * c["v"] // vmax)
            self.bx_pad.append(self.mcux * c["h"])
            self.by_pad.append(self.mcuy * c["v"])
            self.bx_true.append(-(-cw // 8))
            self.by_true.append(-(-ch // 8))
            self.coeffs.append(
                np.zeros((self.by_pad[-1] * self.bx_pad[-1], 64),
                         dtype=np.int32)
            )
        self.any_scan = False


def _skip_entropy(data: bytes, pos: int) -> int:
    """Byte-scan past an entropy-coded segment to the next true marker
    (skipping stuffed 0xFF00 and restart markers) — used for scans that
    carry no luma, whose coefficients the single-plane contract never
    consumes."""
    n = len(data)
    i = pos
    while i + 1 < n:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    raise ValueError("JPEG: entropy data ran off the end of the file")


def _decode_prog_scan(
    data: bytes,
    pos: int,
    prog: _ProgState,
    scan: list,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_tabs: dict,
    ac_tabs: dict,
    restart_interval: int,
) -> int:
    """Decode one progressive scan into ``prog``; returns the position
    of the next marker."""
    fh, fw, comps, prec = prog.frame
    prog.any_scan = True
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    sel = []                              # (comp_idx, td, ta)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"JPEG scan references unknown component {cs}")
        sel.append((by_id[cs], td, ta))
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("JPEG progressive DC scan must have Se=0")
    if not is_dc and len(sel) != 1:
        raise ValueError("JPEG progressive AC scan must be single-component")
    if not (0 <= al <= 13) or (ah and ah != al + 1):
        raise ValueError("JPEG invalid successive-approximation Ah/Al")
    if all(ci != 0 for ci, _, _ in sel):
        return _skip_entropy(data, pos)   # no luma: nothing we keep

    for ci, td, ta in sel:
        if is_dc and ah == 0 and td not in dc_tabs:
            raise ValueError("JPEG scan references missing huffman table")
        # AC REFINE scans also huffman-decode (run/size symbols), so the
        # table check cannot be gated on ah == 0 — a refine scan with a
        # missing DHT must raise the documented ValueError, not KeyError
        # (r10 review finding); only DC refine reads raw bits tablelessly
        if not is_dc and ta not in ac_tabs:
            raise ValueError("JPEG scan references missing huffman table")

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    state = {"eobrun": 0}
    p1, m1 = 1 << al, -1 << al

    dc_max = 11 if prec == 8 else 15

    def dc_first(coef: np.ndarray, ci: int, td: int) -> None:
        s = reader.decode_symbol(dc_tabs[td])
        if s > dc_max:
            raise ValueError(f"JPEG DC magnitude category {s} invalid")
        preds[ci] += _extend(reader.receive(s), s)
        coef[0] = preds[ci] << al

    def dc_refine(coef: np.ndarray) -> None:
        if reader.read_bit():
            coef[0] |= p1

    def ac_first(coef: np.ndarray, ta: int) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        tab = ac_tabs[ta]
        while k <= se:
            rs = reader.decode_symbol(tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:               # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run overflows band")
            coef[k] = _extend(reader.receive(s), s) << al
            k += 1

    def ac_refine(coef: np.ndarray, ta: int) -> None:
        # the published Annex G reference algorithm (libjpeg
        # decode_mcu_AC_refine): new coefficients arrive as +-1<<Al;
        # already-nonzero coefficients take one correction bit each as
        # they are crossed — including for the rest of the band once an
        # EOB run starts
        k = ss
        tab = ac_tabs[ta]
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode_symbol(tab)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "JPEG AC refine: new coefficient size must be 1"
                        )
                    val = p1 if reader.read_bit() else m1
                else:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.receive(r)
                        break             # EOB path below finishes the block
                    # r == 15: skip 16 zero-history coefficients
                while k <= se:
                    if coef[k] != 0:
                        if reader.read_bit() and (coef[k] & p1) == 0:
                            coef[k] += p1 if coef[k] >= 0 else m1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("JPEG AC refine run overflows band")
                    coef[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if coef[k] != 0:
                    if reader.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                k += 1
            state["eobrun"] -= 1

    def do_unit(units_done: int, rst_n: int) -> int:
        """Restart-interval bookkeeping shared by both geometries."""
        if (
            restart_interval
            and units_done
            and units_done % restart_interval == 0
        ):
            reader.align_restart(rst_n)
            for i in range(len(preds)):
                preds[i] = 0
            state["eobrun"] = 0
            return (rst_n + 1) % 8
        return rst_n

    rst_n = 0
    if len(sel) > 1:
        # interleaved scan (DC only — AC was forced single-component
        # above): MCU geometry over padded grids
        units = 0
        for my in range(prog.mcuy):
            for mx in range(prog.mcux):
                rst_n = do_unit(units, rst_n)
                for ci, td, _ta in sel:
                    c = comps[ci]
                    coefs = prog.coeffs[ci]
                    bxp = prog.bx_pad[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            gy = my * c["v"] + by
                            gx = mx * c["h"] + bx
                            blk = coefs[gy * bxp + gx]
                            if ah == 0:
                                dc_first(blk, ci, td)
                            else:
                                dc_refine(blk)
                units += 1
    else:
        # non-interleaved: one component, its TRUE block grid (T.81
        # A.2.2 — no MCU padding), restart counts data units
        ci, td, ta = sel[0]
        coefs = prog.coeffs[ci]
        bxp = prog.bx_pad[ci]
        units = 0
        for gy in range(prog.by_true[ci]):
            for gx in range(prog.bx_true[ci]):
                rst_n = do_unit(units, rst_n)
                blk = coefs[gy * bxp + gx]
                if is_dc:
                    if ah == 0:
                        dc_first(blk, ci, td)
                    else:
                        dc_refine(blk)
                elif ah == 0:
                    ac_first(blk, ta)
                else:
                    ac_refine(blk, ta)
                units += 1
    # land exactly on the next marker (discard pad bits / trailing RST)
    return _skip_entropy(data, reader.pos)


def _prog_finish(prog: _ProgState, qt: dict) -> tuple[int, int, str, bytes]:
    fh, fw, comps, prec = prog.frame
    luma = comps[0]
    if luma["tq"] not in qt:
        raise ValueError("JPEG luma quant table missing")
    return fh, fw, ("uint8" if prec == 8 else "uint16"), _idct_plane(
        prog.coeffs[0], qt[luma["tq"]], prog.bx_pad[0], prog.by_pad[0],
        fh, fw, prec,
    )


# ---------------------------------------------------------------------------
# Lossless (SOF3) decoding — T.81 Annex H, huffman coding only.
#
# The DICOM/medical-archive JPEG: no DCT, no quantization — each sample
# is a huffman-coded difference from one of seven spatial predictors,
# with modulo-2^16 arithmetic and an optional point transform Pt.
# Single-component (grayscale) frames only, which is the form medical
# archives actually ship; precision 2..16 bits. Restart markers follow
# T.81 H.1.2.2/H.1.2.3 (the libjpeg-family convention): the first
# sample after RSTn predicts 2^(P-Pt-1) and the REMAINDER of that line
# uses the 1-D (Ra) predictor, exactly like the scan's first line; the
# selected predictor resumes on the next line. Pinned by a hand-written
# spec-literal byte stream in tests, not just the lockstep encoder.
# Per-sample entropy decode is a Python loop like the DCT modes' MCU
# loop — the binaryfiles.py throughput note (plug Pillow/libjpeg at
# bulk scale) applies unchanged.
# ---------------------------------------------------------------------------


def _decode_lossless_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan: list,
    dc_tabs: dict,
    restart_interval: int,
    predictor: int,
    pt: int,
) -> tuple[int, int, str, bytes]:
    fh, fw, comps, prec = frame
    if len(scan) != 1:
        raise NotImplementedError(
            "JPEG lossless multi-component scan not supported"
        )
    cs, td, _ta = scan[0]
    if cs != comps[0]["id"]:
        raise ValueError(f"JPEG scan references unknown component {cs}")
    if td not in dc_tabs:
        raise ValueError("JPEG scan references missing huffman table")
    if not 1 <= predictor <= 7:
        raise ValueError(f"JPEG lossless predictor {predictor} invalid")
    if pt >= prec:
        raise ValueError("JPEG lossless point transform >= precision")
    tab = dc_tabs[td]
    reader = _BitReader(data, pos)
    default = 1 << (prec - pt - 1)       # scan-start / post-restart guess
    out = np.zeros((fh, fw), dtype=np.int64)
    rst_n = 0
    count = 0                            # samples since last restart
    fresh = True                         # next sample predicts `default`
    for y in range(fh):
        ra_line = y == 0                 # H.1.2.2: first line is 1-D (Ra)
        for x in range(fw):
            if (
                restart_interval
                and count
                and count % restart_interval == 0
            ):
                reader.align_restart(rst_n)
                rst_n = (rst_n + 1) % 8
                fresh = True
                ra_line = True           # H.1.2.2: restart re-enters 1-D
                count = 0
            if fresh:
                p = default
                fresh = False
            elif ra_line:
                p = int(out[y, x - 1])           # 1-D line portion: Ra
            elif x == 0:
                p = int(out[y - 1, 0])           # first column: Rb
            else:
                ra = int(out[y, x - 1])
                rb = int(out[y - 1, x])
                rc = int(out[y - 1, x - 1])
                if predictor == 1:
                    p = ra
                elif predictor == 2:
                    p = rb
                elif predictor == 3:
                    p = rc
                elif predictor == 4:
                    p = ra + rb - rc
                elif predictor == 5:
                    p = ra + ((rb - rc) >> 1)
                elif predictor == 6:
                    p = rb + ((ra - rc) >> 1)
                else:
                    p = (ra + rb) >> 1
            s = reader.decode_symbol(tab)
            if s > 16:
                raise ValueError(
                    f"JPEG lossless difference category {s} invalid"
                )
            if s == 16:                  # special: diff = 32768, no bits
                diff = 32768
            else:
                diff = _extend(reader.receive(s), s)
            out[y, x] = (p + diff) & 0xFFFF      # modulo-2^16 arithmetic
            count += 1
    if pt:
        out <<= pt                       # undo the point transform
    dt = np.uint8 if prec <= 8 else np.uint16
    return fh, fw, ("uint8" if prec <= 8 else "uint16"), (
        out.astype(dt).tobytes()
    )
