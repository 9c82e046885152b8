"""GIF decoder (87a/89a, first frame) in pure Python/numpy.

LZW decompression, global/local color tables, interlace, transparency
ignored (features read raw palette colors). Animation: the FIRST image
descriptor decodes; later frames are irrelevant to feature extraction.

The test encoder uses the classic "uncompressed GIF" trick — every pixel
emitted as a literal LZW code with a CLEAR before the code width would
have to grow — which produces fully valid streams without implementing
LZW compression, so decode∘encode round-trips are exact (GIF is
lossless) and independent of any shared compression logic.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF → (H, W, 3) uint8 RGB (first frame)."""
    if not payload.startswith((b"GIF87a", b"GIF89a")):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        gct_size = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos : pos + 3 * gct_size], dtype=np.uint8
        ).reshape(-1, 3)
        if len(gct) < gct_size:
            raise ValueError("truncated GIF color table")
        pos += 3 * gct_size
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < n and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"bad GIF block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
        ipacked = payload[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:
            lct_size = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * lct_size], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * lct_size
        if table is None:
            raise ValueError("GIF image with no color table")
        interlaced = bool(ipacked & 0x40)
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while pos < n and payload[pos] != 0:
            ln = payload[pos]
            data.extend(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        indices = _lzw_decode(bytes(data), min_code_size, iw * ih)
        if len(indices) < iw * ih:
            raise ValueError("truncated GIF pixel data")
        idx = np.asarray(indices[: iw * ih], dtype=np.int32).reshape(ih, iw)
        if interlaced:
            out = np.empty_like(idx)
            rows = (
                list(range(0, ih, 8)) + list(range(4, ih, 8))
                + list(range(2, ih, 4)) + list(range(1, ih, 2))
            )
            for src, dst in enumerate(rows):
                out[dst] = idx[src]
            idx = out
        if (idx >= len(table)).any():
            raise ValueError("GIF index out of palette range")
        frame = table[idx]
        # paint onto the logical screen (common case: full-screen frame)
        if (ix, iy, iw, ih) == (0, 0, sw, sh):
            return np.ascontiguousarray(frame)
        screen = np.zeros((sh, sw, 3), dtype=np.uint8)
        screen[iy : iy + ih, ix : ix + iw] = frame[: sh - iy, : sw - ix]
        return screen
    raise ValueError("GIF missing image descriptor")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    next_code = end + 1
    dictionary: dict[int, list[int]] = {
        i: [i] for i in range(clear)
    }
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < max_pixels:
        while nbits < code_size:
            if pos >= n:
                return out
            acc |= data[pos] << nbits  # GIF is LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            code_size = min_code_size + 1
            next_code = end + 1
            dictionary = {i: [i] for i in range(clear)}
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = dictionary.get(code)
            if entry is None:
                raise ValueError("bad GIF LZW start code")
        elif code in dictionary:
            entry = dictionary[code]
        elif code == next_code:
            entry = prev + [prev[0]]
        else:
            raise ValueError("bad GIF LZW code")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            dictionary[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def encode_gif(arr: np.ndarray, palette: np.ndarray | None = None,
               interlaced: bool = False) -> bytes:
    """Test encoder: (H, W) palette indices + (N, 3) palette, or (H, W, 3)
    RGB that must use ≤256 distinct colors. Emits literal LZW codes with
    a CLEAR whenever the code width would grow ('uncompressed GIF')."""
    if arr.ndim == 3:
        h, w, _ = arr.shape
        flat = arr.reshape(-1, 3)
        palette, idx = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError("too many colors for GIF")
        indices = idx.reshape(h, w)
    else:
        indices = arr
        h, w = arr.shape
        assert palette is not None
    size = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table_size = 1 << size
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HH", w, h))
    out.append(0x80 | (size - 1))  # GCT present
    out.extend([0, 0])  # bg, aspect
    out.extend(pal.tobytes())
    out.append(0x2C)
    out.extend(struct.pack("<HHHH", 0, 0, w, h))
    out.append(0x40 if interlaced else 0x00)
    min_code_size = size
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    out.append(min_code_size)

    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    rows = range(h)
    if interlaced:
        rows = (list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2)))
    # mirror the decoder's dictionary growth exactly: it adds an entry
    # per code AFTER the first since clear (capped at 4096) and widens
    # when next_code reaches the current width's capacity. Literals
    # always fit in any width, so no CLEARs are ever needed — at width
    # 12 the dictionary freezes and codes stay 12-bit.
    emit(clear)
    prev_emitted = False
    next_code = end + 1
    for y in rows:
        for x in range(w):
            emit(int(indices[y, x]))
            if prev_emitted and next_code < 4096:
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev_emitted = True
    emit(end)
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    out.append(0x3B)
    return bytes(out)
