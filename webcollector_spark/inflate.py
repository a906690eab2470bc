"""DEFLATE decoder from first principles (RFC 1951/1950) — pure
Python, no zlib.

Why it exists: PNG/APNG are "real bitstream" codecs in this repo, but
their entropy layer was the one place that leaned on a library. This
module decodes that layer itself — stored blocks, fixed-Huffman
blocks, dynamic-Huffman blocks (code-length code with 16/17/18
repeats, the scheme VP8L recoded), LZ77 length/distance back-
references with the full extra-bit tables, LSB-first bit packing with
Huffman codes packed MSB-of-code-first — plus the zlib wrapper
(header checks + Adler-32 verification).

It is the verification twin, not the production path: callers keep
zlib (C speed); tests cross-check `zlib_inflate(zlib.compress(x)) ==
x` across block types and PNG decode end-to-end over this decoder.
Deterministic; safe anywhere.
"""

from __future__ import annotations

_LEN_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
]
_LEN_EXTRA = [
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0,
]
_DIST_BASE = [
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577,
]
_DIST_EXTRA = [
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13,
]
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


class _Bits:
    """LSB-first bit reader; Huffman codes are walked bit by bit."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("DEFLATE stream truncated")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v

    def align(self) -> None:
        self.acc = 0
        self.n = 0


def _canonical(lengths: dict[int, int]) -> dict[tuple[int, int], int]:
    """{symbol: bitlength} -> {(length, code): symbol}, RFC 1951 §3.2.2
    canonical assignment (codes increase with (length, symbol))."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    prev = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        length = lengths[sym]
        code <<= length - prev
        table[(length, code)] = sym
        code += 1
        prev = length
    return table


def _read_sym(br: _Bits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 16):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


_FIXED_LIT = _canonical(
    {
        **{s: 8 for s in range(0, 144)},
        **{s: 9 for s in range(144, 256)},
        **{s: 7 for s in range(256, 280)},
        **{s: 8 for s in range(280, 288)},
    }
)
_FIXED_DIST = _canonical({s: 5 for s in range(30)})


def _dynamic_tables(br: _Bits):
    hlit = br.bits(5) + 257
    hdist = br.bits(5) + 1
    hclen = br.bits(4) + 4
    clc_lengths: dict[int, int] = {}
    for i in range(hclen):
        ln = br.bits(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    clc = _canonical(clc_lengths)
    lengths: list[int] = []
    while len(lengths) < hlit + hdist:
        s = _read_sym(br, clc)
        if s < 16:
            lengths.append(s)
        elif s == 16:
            if not lengths:
                raise ValueError("repeat with no previous length")
            lengths.extend([lengths[-1]] * (3 + br.bits(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.bits(3)))
        else:
            lengths.extend([0] * (11 + br.bits(7)))
    if len(lengths) != hlit + hdist:
        raise ValueError("code-length run overflows table")
    lit = _canonical({i: l for i, l in enumerate(lengths[:hlit]) if l})
    dist = _canonical(
        {i: l for i, l in enumerate(lengths[hlit:]) if l}
    )
    return lit, dist


def inflate(data: bytes) -> bytes:
    """Raw DEFLATE (RFC 1951) -> bytes."""
    br = _Bits(data)
    out = bytearray()
    while True:
        final = br.bits(1)
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align()
            if br.pos + 4 > len(data):
                raise ValueError("stored block header truncated")
            ln = data[br.pos] | (data[br.pos + 1] << 8)
            nlen = data[br.pos + 2] | (data[br.pos + 3] << 8)
            if ln ^ 0xFFFF != nlen:
                raise ValueError("stored block LEN/NLEN mismatch")
            br.pos += 4
            if br.pos + ln > len(data):
                raise ValueError("stored block truncated")
            out += data[br.pos : br.pos + ln]
            br.pos += ln
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _FIXED_LIT, _FIXED_DIST
            else:
                lit, dist = _dynamic_tables(br)
            while True:
                s = _read_sym(br, lit)
                if s < 256:
                    out.append(s)
                elif s == 256:
                    break
                else:
                    if s > 285:
                        raise ValueError(f"invalid length symbol {s}")
                    li = s - 257
                    length = _LEN_BASE[li] + br.bits(_LEN_EXTRA[li])
                    d = _read_sym(br, dist)
                    if d > 29:
                        raise ValueError(f"invalid distance symbol {d}")
                    distance = _DIST_BASE[d] + br.bits(_DIST_EXTRA[d])
                    if distance > len(out):
                        raise ValueError("back-reference before stream start")
                    for _ in range(length):  # overlapping copies legal
                        out.append(out[-distance])
        else:
            raise ValueError("reserved DEFLATE block type")
        if final:
            break
    return bytes(out)


def _adler32(data: bytes) -> int:
    a, b = 1, 0
    for i in range(0, len(data), 4096):
        chunk = data[i : i + 4096]
        for byte in chunk:
            a += byte
            b += a
        a %= 65521
        b %= 65521
    return (b << 16) | a


def zlib_inflate(data: bytes) -> bytes:
    """zlib-wrapped DEFLATE (RFC 1950): header checks + Adler-32
    verification over the decoded output."""
    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("not a DEFLATE zlib stream")
    if (cmf << 8 | flg) % 31 != 0:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise NotImplementedError("preset dictionaries not supported")
    out = inflate(data[2:-4])
    expect = int.from_bytes(data[-4:], "big")
    if _adler32(out) != expect:
        raise ValueError("Adler-32 mismatch: corrupt stream")
    return out
