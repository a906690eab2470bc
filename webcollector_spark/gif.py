"""GIF87a codec — real LZW, pure Python/numpy.

The third REAL compressed image bitstream in the engine (after PNG's
DEFLATE and JPEG's DCT+Huffman): palette-indexed pixels compressed with
variable-width LZW exactly as GIF specifies —

* little-endian bit packing, initial code width = min_code_size + 1,
  CLEAR = 2^mcs, END = CLEAR + 1, table grows to 12 bits (4096), the
  encoder emits CLEAR when the table fills;
* the decoder handles the KwKwK case (code == next free entry) and
  mid-stream CLEAR resets;
* raster data wrapped in 255-byte sub-blocks, screen + image
  descriptors, global and local color tables, GIF89a extension blocks
  skipped (a GIF87a decoder may ignore them per the 89a spec's
  block-skipping rules).

Interlaced images and animation (multi-frame) are honestly
NotImplementedError — the corpus is single-frame non-interlaced, the
dominant shape for crawl payload thumbnails.

GIF is lossless ON PALETTED INPUT (<= 256 unique colors): the fixture
corpus posterizes ground truth to 6 levels/channel (216 colors), so
decode must be bit-exact (PSNR = inf) — a stronger invariant than the
40 dB lossy gate.

Deterministic, no RNG; encode builds the palette with np.unique. Safe
inside Arrow-batched pandas UDFs. Reference anchor: fetched payloads
are opaque bytes + typed metadata (model/Page.java:323-330).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_WIDTH = 12
_MAX_CODES = 1 << _MAX_WIDTH


class _BitWriter:
    """LSB-first bit packer (GIF's LZW byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW over palette indices. Emits an initial CLEAR,
    grows the code width exactly when the decoder's table-size counter
    would (encoder runs one entry ahead, so the trigger is next-free ==
    2^width at the PRE-add count), and CLEARs at 4096."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _BitWriter()
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    nxt = end + 1
    bw.write(clear, width)
    seq = list(map(int, indices))
    prefix = seq[0]
    for k in seq[1:]:
        e = table.get((prefix, k))
        if e is not None:
            prefix = e
            continue
        bw.write(prefix, width)
        if nxt == _MAX_CODES:
            bw.write(clear, width)
            table.clear()
            width = min_code_size + 1
            nxt = end + 1
        else:
            if nxt == (1 << width) and width < _MAX_WIDTH:
                width += 1
            table[(prefix, k)] = nxt
            nxt += 1
        prefix = k
    bw.write(prefix, width)
    bw.write(end, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    br = _BitReader(data)
    out = np.empty(n_expected, dtype=np.int32)
    pos = 0

    def reset():
        return (
            min_code_size + 1,
            {i: (i,) for i in range(clear)},
            end + 1,
        )

    width, table, nxt = reset()
    prev: tuple[int, ...] | None = None
    while True:
        code = br.read(width)
        if code == clear:
            width, table, nxt = reset()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"bad LZW code {code} (next free {nxt})")
        if pos + len(entry) > n_expected:
            raise ValueError("LZW output exceeds raster size")
        out[pos : pos + len(entry)] = entry
        pos += len(entry)
        if prev is not None and nxt < _MAX_CODES:
            table[nxt] = prev + (entry[0],)
            nxt += 1
            if nxt == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry
    if pos != n_expected:
        raise ValueError(f"LZW produced {pos} pixels, raster is {n_expected}")
    return out


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for off in range(0, len(payload), 255):
        chunk = payload[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif87a(pixels: np.ndarray) -> bytes:
    """RGB8 HxWx3 (<= 256 unique colors) -> GIF87a bytes. Raises
    ValueError above 256 colors — quantization is the caller's policy
    decision, not something a codec should do silently."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError(f"{n_colors} unique colors > 256; palettize first")
    table_bits = max(1, int(np.ceil(np.log2(max(n_colors, 2)))))
    gct = np.zeros((1 << table_bits, 3), dtype=np.uint8)
    gct[:n_colors] = palette
    mcs = max(2, table_bits)
    packed = 0x80 | ((table_bits - 1) << 4) | (table_bits - 1)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no LCT, no interlace
    out.append(mcs)
    out += _sub_blocks(lzw_encode(inverse.astype(np.int32), mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif87a(data: bytes) -> np.ndarray:
    """GIF bytes -> RGB8 HxWx3 (first frame, non-interlaced)."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block {block:#x} at {pos - 1}")
        _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        table = gct
        if ipacked & 0x80:
            n = 1 << ((ipacked & 0x07) + 1)
            table = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("no color table")
        mcs = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos]:
            ln = data[pos]
            payload += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(payload), mcs, iw * ih)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("palette index out of range")
        return table[idx].reshape(ih, iw, 3).copy()
    raise ValueError("no image block in GIF")
