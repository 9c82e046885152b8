"""Baseline + progressive JPEG codec in pure numpy (no dependencies).

Decoder scope (the overwhelming majority of web JPEGs): baseline DCT
(SOF0/1) and **progressive DCT (SOF2, round 5)** — spectral selection,
successive approximation (DC and AC refinement scans, EOB runs),
interleaved and single-component scans — 8-bit, grayscale or YCbCr with
sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:2:0), restart
markers, multiple DQT/DHT segments. Arithmetic coding, hierarchical and
12-bit remain rejected with a ValueError (the per-row error channel in
multimodal.py surfaces them).

The encoders exist for testing: the baseline one emits 4:4:4 /
grayscale JPEGs with the Annex-K standard tables, so decode∘encode
round-trips bound the reconstruction error by the quantization step —
and a hand-constructed single-block stream pins the decoder against
numbers worked out by hand, independent of the encoder. The progressive
encoder re-encodes the SAME quantized coefficients across a
libjpeg-style multi-scan script (DC first + refine, AC bands at
successive Al, AC refinement with buffered correction bits), so
``decode(encode_progressive(x)) == decode(encode_baseline(x))``
EXACTLY — pixel-identical across two entirely different scan
structures.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order (index i of the zig-zag sequence → natural position)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K standard quantization tables (luminance, chrominance)
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K standard huffman tables: (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8-point DCT-II basis matrix: A[k, n] = c(k) cos((2n+1)kπ/16)
_N = np.arange(8)
_A = np.sqrt(2.0 / 8.0) * np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16)
_A[0, :] = np.sqrt(1.0 / 8.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _build_huff_decode(bits: list[int], huffval: list[int]):
    """(code → (length, value)) lookup as dict keyed by (length, code)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 destuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # marker (EOI / next segment): pad with 1-bits per spec
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume a restart marker at the current byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip to the FF Dx pair
        while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("bad JPEG huffman code")


def _extend(v: int, t: int) -> int:
    # receive/extend: map t-bit magnitude to signed value
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → (H, W, 3) uint8 RGB."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    n = len(payload)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    prog: dict | None = None  # progressive coefficient store
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = tbl
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = [0] + list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                tab = _build_huff_decode(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
                i += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = body[0], struct.unpack_from(">H", body, 1)[0], \
                struct.unpack_from(">H", body, 3)[0], body[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                prog = _init_progressive(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG mode (lossless/arith/hier)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(
                    i for i, x in enumerate(frame["comps"]) if x["id"] == cs
                )
                scan.append((comp, tt >> 4, tt & 0xF))
            base = 1 + 2 * ns
            band = (body[base], body[base + 1],
                    body[base + 2] >> 4, body[base + 2] & 0xF)
            data_pos = pos + 2 + seglen
            if not frame["progressive"]:
                return _decode_scan(
                    payload, data_pos, frame,
                    [(frame["comps"][ci], td, ta) for ci, td, ta in scan],
                    qt, huff_dc, huff_ac, restart_interval,
                )
            pos = _decode_progressive_scan(
                payload, data_pos, frame, scan, band, huff_dc, huff_ac,
                restart_interval, prog,
            )
            continue
        pos += 2 + seglen
    if prog is not None:
        return _finish_progressive(frame, prog, qt)
    raise ValueError("JPEG missing SOS")


# ------------------------------------------------------- progressive decode


def _init_progressive(frame) -> dict:
    """Per-component coefficient store on the padded MCU block grid
    (covers both interleaved-DC and single-component scan traversals)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    coeffs = []
    nonil = []  # non-interleaved (true) block dims per component
    for c in frame["comps"]:
        bw_pad, bh_pad = mcus_x * c["h"], mcus_y * c["v"]
        coeffs.append(np.zeros((bh_pad, bw_pad, 64), dtype=np.int32))
        cw = (frame["w"] * c["h"] + hmax - 1) // hmax
        ch = (frame["h"] * c["v"] + vmax - 1) // vmax
        nonil.append(((cw + 7) // 8, (ch + 7) // 8))
    return {"coeffs": coeffs, "nonil": nonil,
            "hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y}


def _next_marker_pos(payload: bytes, pos: int) -> int:
    """First real marker (not stuffed 00, not RSTn) at/after ``pos``."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00 \
                and not (0xD0 <= payload[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return n


def _decode_progressive_scan(payload, data_pos, frame, scan, band,
                             huff_dc, huff_ac, restart_interval, prog) -> int:
    """Decode one progressive scan into the coefficient store; returns the
    stream position of the next marker. T.81 §G.2 semantics: DC scans may
    be interleaved (MCU order); AC scans are single-component in the
    component's own block-raster order; Ah=0 is a first pass at point
    transform Al, Ah>0 a 1-bit refinement from Ah to Al."""
    ss, se, ah, al = band
    reader = _BitReader(payload, data_pos)
    coeffs = prog["coeffs"]

    def maybe_restart(count, preds, eobrun):
        if restart_interval and count and count % restart_interval == 0:
            reader.align_restart()
            return [0] * len(preds), 0
        return preds, eobrun

    if ss == 0:  # ------------------------------------------------ DC scan
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC")
        preds = [0] * len(scan)
        if len(scan) > 1:  # interleaved: MCU order, h×v blocks per comp
            count = 0
            for my in range(prog["mcus_y"]):
                for mx in range(prog["mcus_x"]):
                    preds, _ = maybe_restart(count, preds, 0)
                    for si, (ci, td, _ta) in enumerate(scan):
                        c = frame["comps"][ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coeffs[ci][my * c["v"] + by,
                                                 mx * c["h"] + bx]
                                if ah == 0:
                                    t = _huff_decode(reader, huff_dc[td])
                                    diff = _extend(reader.read_bits(t), t)
                                    preds[si] += diff
                                    blk[0] = preds[si] << al
                                else:
                                    blk[0] |= reader.read_bit() << al
                    count += 1
        else:  # single component: its own block raster
            ci, td, _ta = scan[0]
            nbw, nbh = prog["nonil"][ci]
            pred = 0
            count = 0
            for by in range(nbh):
                for bx in range(nbw):
                    p, _ = maybe_restart(count, [pred], 0)
                    pred = p[0]
                    blk = coeffs[ci][by, bx]
                    if ah == 0:
                        t = _huff_decode(reader, huff_dc[td])
                        pred += _extend(reader.read_bits(t), t)
                        blk[0] = pred << al
                    else:
                        blk[0] |= reader.read_bit() << al
                    count += 1
    else:  # ------------------------------------------------------ AC scan
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, _td, ta = scan[0]
        table = huff_ac[ta]
        nbw, nbh = prog["nonil"][ci]
        eobrun = 0
        count = 0
        for by in range(nbh):
            for bx in range(nbw):
                _, eobrun = maybe_restart(count, [], eobrun)
                blk = coeffs[ci][by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(blk, reader, ss, se, al,
                                             table, eobrun)
                else:
                    eobrun = _ac_refine_block(blk, reader, ss, se, al,
                                              table, eobrun)
                count += 1
    return _next_marker_pos(payload, reader.pos)


def _ac_first_block(blk, reader, ss, se, al, table, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+bits end-of-band blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG progressive AC overflow")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(blk, reader, ss, se, al, table, eobrun) -> int:
    """T.81 G.2 / libjpeg decode_mcu_AC_refine: 1-bit corrections for
    already-nonzero coefficients, newly-significant ±1<<al insertions,
    correction bits continuing through EOB runs."""
    p1 = 1 << al
    m1 = -p1

    def correct(k):
        if reader.read_bit() and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break  # rest of block handled as in-EOB corrections
                val = 0  # ZRL: skip 16 zero-history coeffs
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = val
            k += 1
        else:
            return 0
    else:
        eobrun -= 1
    # in (or entering) an EOB run: remaining band gets corrections only
    while k <= se:
        if blk[k] != 0:
            correct(k)
        k += 1
    return eobrun


def _upsample_axis(plane: np.ndarray, axis: int) -> np.ndarray:
    """Factor-2 triangular ("fancy") upsample along one axis — the
    libjpeg jdsample.c h2v1/h2v2 filter shape (3:1 nearest:far weights,
    edge samples replicated), in float; h2v2 is this filter applied
    separably to both axes. Round-6 fidelity fix: plain ``np.repeat``
    replication is spec-legal but diverged from libjpeg's decode by a
    mean of ~15/255 on 4:2:0 content; triangular brings the
    independent-decoder differential to sub-1 mean (pinned in
    test_jpeg_libjpeg_fixture)."""
    s = np.moveaxis(plane, axis, 0)
    prev = np.concatenate([s[:1], s[:-1]], axis=0)
    nxt = np.concatenate([s[1:], s[-1:]], axis=0)
    out = np.empty((2 * s.shape[0],) + s.shape[1:], dtype=np.float64)
    out[0::2] = (3.0 * s + prev) * 0.25
    out[1::2] = (3.0 * s + nxt) * 0.25
    return np.moveaxis(out, 0, axis)


def _upsample_plane(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Upsample a chroma plane by (fh, fv): triangular for the 2×
    factors the format actually uses, replication fallback otherwise."""
    if fh == 2:
        plane = _upsample_axis(plane, 1)
    elif fh > 1:
        plane = np.repeat(plane, fh, axis=1)
    if fv == 2:
        plane = _upsample_axis(plane, 0)
    elif fv > 1:
        plane = np.repeat(plane, fv, axis=0)
    return plane


def _assemble(frame, planes) -> np.ndarray:
    """Padded per-component pixel planes → upsample, crop, color-convert."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c, plane in zip(comps, planes):
        plane = _upsample_plane(plane, hmax // c["h"], vmax // c["v"])
        full.append(plane[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _finish_progressive(frame, prog, qt) -> np.ndarray:
    planes = []
    for c, coef in zip(frame["comps"], prog["coeffs"]):
        bh, bw = coef.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        q = qt[c["tq"]]
        for by in range(bh):
            for bx in range(bw):
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = coef[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(nat.reshape(8, 8) * q) + 128.0
                )
        planes.append(plane)
    return _assemble(frame, planes)


def _decode_scan(payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("unsupported JPEG sampling factors")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(payload, data_pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = [0] * len(comps)
            try:
                for ci, (comp, td, ta) in enumerate(scan):
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            coeffs = np.zeros(64, dtype=np.int32)
                            t = _huff_decode(reader, huff_dc[td])
                            diff = _extend(reader.read_bits(t), t)
                            preds[ci] += diff
                            coeffs[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(reader, huff_ac[ta])
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("JPEG AC overflow")
                                coeffs[k] = _extend(reader.read_bits(s), s)
                                k += 1
                            nat = np.zeros(64, dtype=np.float64)
                            nat[ZIGZAG] = coeffs
                            block = nat.reshape(8, 8) * qt[comp["tq"]]
                            px = _idct2(block) + 128.0
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            except _RestartMarker:
                raise ValueError("unexpected JPEG restart marker")
            mcu_count += 1
    # upsample to full res and convert
    full = []
    for c, plane in zip(comps, planes):
        plane = _upsample_plane(plane, hmax // c["h"], vmax // c["v"])
        full.append(plane[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------------------- encoder


def _build_huff_encode(bits, huffval):
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            enc[huffval[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag(v: int):
    """(category, magnitude-bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def encode_jpeg(arr: np.ndarray, quality_scale: int = 1,
                subsample: bool = False) -> bytes:
    """Minimal baseline JPEG writer: grayscale (H,W) / (H,W,1) or RGB
    (H,W,3) as YCbCr 4:4:4 (or 4:2:0 with ``subsample=True``), Annex-K
    tables divided by ``quality_scale`` (higher = finer quantization).
    For tests — the 4:2:0 mode exists to round-trip the decoder's MCU
    interleave + chroma upsample path."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    gray = nc == 1
    if subsample and not gray:
        return _encode_420(arr, quality_scale)
    lq = np.maximum(STD_LUMA_Q // quality_scale, 1)
    cq = np.maximum(STD_CHROMA_Q // quality_scale, 1)
    if gray:
        planes = [arr[:, :, 0].astype(np.float64) - 128.0]
        qts = [lq]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [lq, cq, cq]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    zz_l = np.zeros(64, dtype=np.int32)
    zz_l[np.arange(64)] = lq.reshape(-1)[ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zz_l))
    if not gray:
        zz_c = np.zeros(64, dtype=np.int32)
        zz_c[np.arange(64)] = cq.reshape(-1)[ZIGZAG]
        seg(0xDB, bytes([0x01]) + bytes(int(x) for x in zz_c))

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    seg(0xC0, sof)

    def dht(tc, th, spec):
        bits, vals = spec
        return bytes([(tc << 4) | th] + bits[1:] + vals)

    seg(0xC4, dht(0, 0, STD_DC_LUMA))
    seg(0xC4, dht(1, 0, STD_AC_LUMA))
    if not gray:
        seg(0xC4, dht(0, 1, STD_DC_CHROMA))
        seg(0xC4, dht(1, 1, STD_AC_CHROMA))

    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    enc_dc = [_build_huff_encode(*STD_DC_LUMA), _build_huff_encode(*STD_DC_CHROMA)]
    enc_ac = [_build_huff_encode(*STD_AC_LUMA), _build_huff_encode(*STD_AC_CHROMA)]
    writer = _BitWriter()
    bh, bw = (h + 7) // 8, (w + 7) // 8
    preds = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                plane, q = planes[ci], qts[ci]
                tid = 0 if ci == 0 else 1
                blk = np.zeros((8, 8), dtype=np.float64)
                ys, xs = by * 8, bx * 8
                src = plane[ys : ys + 8, xs : xs + 8]
                blk[: src.shape[0], : src.shape[1]] = src
                # edge replicate pad
                if src.shape[0] < 8:
                    blk[src.shape[0] :, : src.shape[1]] = src[-1:, :]
                if src.shape[1] < 8:
                    blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1 : src.shape[1]]
                coeffs = np.round(_fdct2(blk) / q).astype(np.int32)
                zz = coeffs.reshape(-1)[ZIGZAG]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                t, bits_v = _mag(diff)
                code, ln = enc_dc[tid][t]
                writer.write(code, ln)
                if t:
                    writer.write(bits_v, t)
                run = 0
                last_nz = 0
                for k in range(1, 64):
                    if zz[k] != 0:
                        last_nz = k
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = enc_ac[tid][0xF0]
                        writer.write(code, ln)
                        run -= 16
                    t, bits_v = _mag(v)
                    code, ln = enc_ac[tid][(run << 4) | t]
                    writer.write(code, ln)
                    writer.write(bits_v, t)
                    run = 0
                if last_nz < 63:
                    code, ln = enc_ac[tid][0x00]
                    writer.write(code, ln)
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _encode_420(arr: np.ndarray, quality_scale: int) -> bytes:
    """4:2:0 variant: Y at full res (2x2 blocks per MCU), Cb/Cr box-filtered
    2x downsampled (1 block per MCU)."""
    h, w, _ = arr.shape
    lq = np.maximum(STD_LUMA_Q // quality_scale, 1)
    cq = np.maximum(STD_CHROMA_Q // quality_scale, 1)
    rgb = arr.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    def pad_to(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
        out = np.zeros((mh, mw), dtype=np.float64)
        out[: p.shape[0], : p.shape[1]] = p
        if p.shape[0] < mh:
            out[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < mw:
            out[:, p.shape[1]:] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    mcus_x, mcus_y = (w + 15) // 16, (h + 15) // 16
    yp = pad_to(y, mcus_y * 16, mcus_x * 16)
    # box-filter 2x downsample on the padded plane
    cbp = pad_to(cb, mcus_y * 16, mcus_x * 16)
    crp = pad_to(cr, mcus_y * 16, mcus_x * 16)
    cbd = cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
    crd = crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tq, q in ((0, lq), (1, cq)):
        zz = np.zeros(64, dtype=np.int32)
        zz[np.arange(64)] = q.reshape(-1)[ZIGZAG]
        seg(0xDB, bytes([tq]) + bytes(int(x) for x in zz))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0])  # Y: h=2 v=2
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    seg(0xC0, sof)

    def dht(tc, th, spec):
        bits, vals = spec
        return bytes([(tc << 4) | th] + bits[1:] + vals)

    seg(0xC4, dht(0, 0, STD_DC_LUMA))
    seg(0xC4, dht(1, 0, STD_AC_LUMA))
    seg(0xC4, dht(0, 1, STD_DC_CHROMA))
    seg(0xC4, dht(1, 1, STD_AC_CHROMA))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    enc_dc = [_build_huff_encode(*STD_DC_LUMA), _build_huff_encode(*STD_DC_CHROMA)]
    enc_ac = [_build_huff_encode(*STD_AC_LUMA), _build_huff_encode(*STD_AC_CHROMA)]
    writer = _BitWriter()
    preds = [0, 0, 0]

    def emit_block(plane, y0, x0, q, tid, ci):
        blk = plane[y0 : y0 + 8, x0 : x0 + 8]
        coeffs = np.round(_fdct2(blk) / q).astype(np.int32)
        zz = coeffs.reshape(-1)[ZIGZAG]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        t, bits_v = _mag(diff)
        code, ln = enc_dc[tid][t]
        writer.write(code, ln)
        if t:
            writer.write(bits_v, t)
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k] != 0:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[tid][0xF0]
                writer.write(code, ln)
                run -= 16
            t, bits_v = _mag(v)
            code, ln = enc_ac[tid][(run << 4) | t]
            writer.write(code, ln)
            writer.write(bits_v, t)
            run = 0
        if last_nz < 63:
            code, ln = enc_ac[tid][0x00]
            writer.write(code, ln)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(2):
                for bx in range(2):
                    emit_block(yp, my * 16 + by * 8, mx * 16 + bx * 8, lq, 0, 0)
            emit_block(cbd, my * 8, mx * 8, cq, 1, 1)
            emit_block(crd, my * 8, mx * 8, cq, 1, 2)
    writer.flush()
    out.extend(writer.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------------------ progressive encoder

# "Flat" canonical Huffman tables sized to contain EVERY symbol the
# progressive scans can emit (incl. the EOBn codes 0x10..0xE0 the Annex-K
# tables lack): all 16 DC categories at length 5 (Kraft 16/32), all 256
# AC run/size bytes at lengths 9/10 (255/512 + 2/1024). Deliberately
# suboptimal — correctness-exercising, not size-optimal.
_FLAT_DC = (
    [0, 0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Level-shifted plane → (bh, bw, 64) quantized zig-zag coefficients
    (edge-replicate padded), identical math to the baseline encoder."""
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh, bw, 64), dtype=np.int32)
    for by in range(bh):
        for bx in range(bw):
            blk = np.zeros((8, 8), dtype=np.float64)
            src = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            blk[: src.shape[0], : src.shape[1]] = src
            if src.shape[0] < 8:
                blk[src.shape[0] :, : src.shape[1]] = src[-1:, :]
            if src.shape[1] < 8:
                blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1 : src.shape[1]]
            coeffs = np.round(_fdct2(blk) / q).astype(np.int32)
            out[by, bx] = coeffs.reshape(-1)[ZIGZAG]
    return out


class _ProgWriter(_BitWriter):
    """BitWriter + huffman emit + the buffered-correction-bit protocol of
    refinement scans (libjpeg's BE buffer)."""

    def __init__(self, enc_dc, enc_ac):
        super().__init__()
        self.enc_dc = enc_dc
        self.enc_ac = enc_ac
        self.pending: list[int] = []

    def sym_dc(self, s: int) -> None:
        code, ln = self.enc_dc[s]
        self.write(code, ln)

    def sym_ac(self, s: int) -> None:
        code, ln = self.enc_ac[s]
        self.write(code, ln)

    def flush_pending(self) -> None:
        for b in self.pending:
            self.write(b, 1)
        self.pending = []


def _emit_eobrun(w: _ProgWriter, eobrun: int) -> int:
    """Flush an accumulated end-of-band run (EOBn symbols + extension
    bits + the correction bits buffered across the run's blocks)."""
    while eobrun > 0:
        r = min(14, eobrun.bit_length() - 1)
        take = min(eobrun, (1 << (r + 1)) - 1)
        r = take.bit_length() - 1
        w.sym_ac(r << 4)
        if r:
            w.write(take - (1 << r), r)
        w.flush_pending()
        eobrun -= take
    return 0


def _enc_dc_scan(w, comp_coeffs, al, first: bool,
                 samplings=None) -> None:
    """Interleaved DC scan in MCU order: h×v blocks per component per
    MCU (``samplings`` = [(h, v), ...]; default one block each —
    4:4:4/grayscale)."""
    ncomp = len(comp_coeffs)
    if samplings is None:
        samplings = [(1, 1)] * ncomp
    vmax = max(v for _h, v in samplings)
    hmax = max(h for h, _v in samplings)
    mcus_y = comp_coeffs[0].shape[0] // samplings[0][1]
    mcus_x = comp_coeffs[0].shape[1] // samplings[0][0]
    preds = [0] * ncomp

    def one(ci, by, bx):
        v = int(comp_coeffs[ci][by, bx, 0])
        if first:
            sv = v >> al  # DC point transform: arithmetic shift
            diff = sv - preds[ci]
            preds[ci] = sv
            t, bits_v = _mag(diff)
            w.sym_dc(t)
            if t:
                w.write(bits_v, t)
        else:
            w.write((v >> al) & 1, 1)

    _ = (hmax, vmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                ch, cv = samplings[ci]
                for by in range(cv):
                    for bx in range(ch):
                        one(ci, my * cv + by, mx * ch + bx)


def _enc_ac_first(w, coeffs, ss, se, al, dims=None) -> None:
    bh, bw = dims or coeffs.shape[:2]
    eobrun = 0
    for by in range(bh):
        for bx in range(bw):
            zz = coeffs[by, bx]
            band = [int(zz[k]) for k in range(ss, se + 1)]
            vals = [(1 if v > 0 else -1) * (abs(v) >> al) for v in band]
            last_nz = -1
            for i, v in enumerate(vals):
                if v:
                    last_nz = i
            if last_nz < 0:
                eobrun += 1
                continue
            eobrun = _emit_eobrun(w, eobrun)
            run = 0
            for i in range(last_nz + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    w.sym_ac(0xF0)
                    run -= 16
                t, bits_v = _mag(v)
                w.sym_ac((run << 4) | t)
                w.write(bits_v, t)
                run = 0
            if last_nz < se - ss:
                eobrun += 1
    _emit_eobrun(w, eobrun)


def _enc_ac_refine(w, coeffs, ss, se, al, dims=None) -> None:
    """T.81 G.1.2.3 successive-approximation refinement (libjpeg
    encode_mcu_AC_refine structure): newly-significant ±1 insertions with
    runs counted over still-zero positions only; 1-bit corrections for
    already-significant positions buffered in TWO tiers — block-level
    bits flush after the next in-block symbol (ZRL or (r,1)), and bits
    belonging to completed end-of-band blocks flush with the EOBn symbol
    (libjpeg's BR vs BE buffers). ZRL is emitted the moment any nonzero
    is reached with run > 15, and only while k ≤ the last
    newly-significant position — everything after joins the EOB run."""
    bh, bw = dims or coeffs.shape[:2]
    eobrun = 0
    run_bits: list[int] = []   # corrections of completed EOB-run blocks

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            w.sym_ac(r << 4)
            if r:
                w.write(eobrun - (1 << r), r)
            for b in run_bits:
                w.write(b, 1)
            run_bits.clear()
            eobrun = 0

    for by in range(bh):
        for bx in range(bw):
            zz = coeffs[by, bx]
            tvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            last_new = -1  # band index of last newly-significant coeff
            for i, t in enumerate(tvals):
                if t == 1:
                    last_new = i
            run = 0
            blk_bits: list[int] = []  # corrections since last symbol
            for i, t in enumerate(tvals):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and i <= last_new:
                    emit_eobrun()
                    w.sym_ac(0xF0)
                    run -= 16
                    for b in blk_bits:
                        w.write(b, 1)
                    blk_bits = []
                if t > 1:  # already significant: buffer a correction bit
                    blk_bits.append(t & 1)
                    continue
                # newly significant (t == 1)
                emit_eobrun()
                w.sym_ac((run << 4) | 1)
                w.write(1 if int(zz[ss + i]) > 0 else 0, 1)
                for b in blk_bits:
                    w.write(b, 1)
                blk_bits = []
                run = 0
            if run > 0 or blk_bits:
                # block tail joins the EOB run; its corrections move to
                # the run buffer (flushed with the eventual EOBn)
                run_bits.extend(blk_bits)
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
    emit_eobrun()


def encode_jpeg_progressive(arr: np.ndarray, quality_scale: int = 1,
                            subsample: bool = False) -> bytes:
    """Progressive (SOF2) writer over the SAME quantized coefficients as
    :func:`encode_jpeg`: grayscale or RGB→YCbCr 4:4:4 (or 4:2:0 with
    ``subsample=True`` — the common web-progressive shape: interleaved
    DC over 2×2+1+1-block MCUs, AC scans over each component's own
    non-interleaved grid), a libjpeg-style scan script covering DC
    first+refine, AC spectral bands at successive point transforms, and
    AC refinement — so the decoded image is pixel-identical to decoding
    the corresponding baseline encoding."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    gray = nc == 1
    lq = np.maximum(STD_LUMA_Q // quality_scale, 1)
    cq = np.maximum(STD_CHROMA_Q // quality_scale, 1)

    def pad_to(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
        outp = np.zeros((mh, mw), dtype=np.float64)
        outp[: p.shape[0], : p.shape[1]] = p
        if p.shape[0] < mh:
            outp[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < mw:
            outp[:, p.shape[1]:] = outp[:, p.shape[1] - 1 : p.shape[1]]
        return outp

    if gray:
        planes = [arr[:, :, 0].astype(np.float64) - 128.0]
        qts = [lq]
        samplings = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        # NB: replicate the corresponding BASELINE encoder's float
        # arithmetic EXACTLY (4:4:4 does the +128−128 round trip,
        # 4:2:0 does not) — (x+128.0)−128.0 ≠ x for knife-edge values,
        # and the pixel-identity assertion needs bit-equal coefficients
        if subsample:
            y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        else:
            y = (0.299 * r + 0.587 * g + 0.114 * b) - 128.0
            cb = (-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0) - 128.0
            cr = (0.5 * r - 0.418688 * g - 0.081312 * b + 128.0) - 128.0
        qts = [lq, cq, cq]
        if subsample:
            mcus_x, mcus_y = (w + 15) // 16, (h + 15) // 16
            yp = pad_to(y, mcus_y * 16, mcus_x * 16)
            cbp = pad_to(cb, mcus_y * 16, mcus_x * 16)
            crp = pad_to(cr, mcus_y * 16, mcus_x * 16)
            cbd = cbp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
            crd = crp.reshape(mcus_y * 8, 2, mcus_x * 8, 2).mean(axis=(1, 3))
            planes = [yp, cbd, crd]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samplings = [(1, 1)] * 3
    comp_coeffs = [_forward_blocks(p, q) for p, q in zip(planes, qts)]
    ncomp = len(planes)
    hmax = max(sh for sh, _sv in samplings)
    vmax = max(sv for _sh, sv in samplings)
    # non-interleaved (true) block dims per comp — AC scan traversal
    # order; padded MCU-grid columns beyond these carry DC-only data
    nonil = []
    for (sh, sv) in samplings:
        cw = (w * sh + hmax - 1) // hmax
        ch_ = (h * sv + vmax - 1) // vmax
        nonil.append(((ch_ + 7) // 8, (cw + 7) // 8))  # (nbh, nbw)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    zz_l = np.zeros(64, dtype=np.int32)
    zz_l[np.arange(64)] = lq.reshape(-1)[ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zz_l))
    if not gray:
        zz_c = np.zeros(64, dtype=np.int32)
        zz_c[np.arange(64)] = cq.reshape(-1)[ZIGZAG]
        seg(0xDB, bytes([0x01]) + bytes(int(x) for x in zz_c))

    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samplings[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    seg(0xC2, sof)

    def dht(tc, th, spec):
        bits, vals = spec
        return bytes([(tc << 4) | th] + bits[1:] + vals)

    seg(0xC4, dht(0, 0, _FLAT_DC))
    seg(0xC4, dht(1, 0, _FLAT_AC))

    enc_dc = _build_huff_encode(*_FLAT_DC)
    enc_ac = _build_huff_encode(*_FLAT_AC)

    def sos(comps, ss, se, ah, al):
        body = bytes([len(comps)])
        for ci in comps:
            body += bytes([ci + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, body)

    def entropy(fn, *args):
        wtr = _ProgWriter(enc_dc, enc_ac)
        fn(wtr, *args)
        wtr.flush()
        out.extend(wtr.out)

    # libjpeg-style script: DC first (Al=1) → AC bands at their Al →
    # AC refinements → DC refine
    sos(list(range(ncomp)), 0, 0, 0, 1)
    entropy(_enc_dc_scan, comp_coeffs, 1, True, samplings)
    if gray:
        script = [(0, 1, 5, 0, 2), (0, 6, 63, 0, 2),
                  (0, 1, 63, 2, 1), (0, 1, 63, 1, 0)]
    else:
        script = [(0, 1, 5, 0, 2), (1, 1, 63, 0, 1), (2, 1, 63, 0, 1),
                  (0, 6, 63, 0, 2), (0, 1, 63, 2, 1),
                  (1, 1, 63, 1, 0), (2, 1, 63, 1, 0), (0, 1, 63, 1, 0)]
    for ci, ss_, se_, ah_, al_ in script:
        sos([ci], ss_, se_, ah_, al_)
        if ah_ == 0:
            entropy(_enc_ac_first, comp_coeffs[ci], ss_, se_, al_,
                    nonil[ci])
        else:
            entropy(_enc_ac_refine, comp_coeffs[ci], ss_, se_, al_,
                    nonil[ci])
    sos(list(range(ncomp)), 0, 0, 1, 0)
    entropy(_enc_dc_scan, comp_coeffs, 0, False, samplings)
    out.extend(b"\xff\xd9")
    return bytes(out)
