"""Diagnostic bit-level DEFLATE decoder: decodes a raw deflate stream
symbol by symbol, printing context when something goes structurally wrong
(bad distance, bad code, oversubscribed table). Debug tool only — the
production decoders are gzp_tpu.runtime (C++) and ops/inflate_kernel."""

from __future__ import annotations

LENGTH_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43,
               51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258]
LENGTH_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
                4, 4, 4, 4, 5, 5, 5, 5, 0]
DIST_BASE = [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257,
             385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
             16385, 24577]
DIST_EXTRA = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
              9, 9, 10, 10, 11, 11, 12, 12, 13, 13]
CL_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


class Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def take(self, n: int) -> int:
        v = 0
        for k in range(n):
            byte = self.data[(self.pos + k) >> 3]
            v |= ((byte >> ((self.pos + k) & 7)) & 1) << k
        self.pos += n
        return v


def build_decode(lens: list[int]):
    """Canonical Huffman decode map {(len, code_msb): sym}; also returns
    Kraft residual (0 = complete)."""
    maxlen = max(lens) if lens else 0
    bl_count = [0] * (maxlen + 1)
    for l in lens:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (maxlen + 2)
    for l in range(1, maxlen + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    table = {}
    for sym, l in enumerate(lens):
        if l:
            table[(l, next_code[l])] = sym
            next_code[l] += 1
    kraft = sum((1 << (maxlen - l)) for l in lens if l)
    return table, kraft - (1 << maxlen) if maxlen else 0


def read_sym(bits: Bits, table) -> int:
    code = 0
    for l in range(1, 16):
        code = (code << 1) | bits.take(1)
        if (l, code) in table:
            return table[(l, code)]
    raise ValueError(f"bad code at bit {bits.pos}")


def inflate_steps(raw: bytes, verbose_from: int = -1, max_err_ctx: int = 10):
    bits = Bits(raw)
    out = bytearray()
    block = 0
    history: list[tuple] = []
    while True:
        bfinal = bits.take(1)
        btype = bits.take(2)
        if btype == 0:
            while bits.pos & 7:
                bits.take(1)
            ln = bits.take(16)
            nlen = bits.take(16)
            assert ln ^ nlen == 0xFFFF, f"stored LEN/NLEN mismatch at bit {bits.pos}"
            for _ in range(ln):
                out.append(bits.take(8))
        else:
            if btype == 1:
                lit_lens = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
                dist_lens = [5] * 30
            elif btype == 2:
                hlit = bits.take(5) + 257
                hdist = bits.take(5) + 1
                hclen = bits.take(4) + 4
                cl_lens = [0] * 19
                for i in range(hclen):
                    cl_lens[CL_ORDER[i]] = bits.take(3)
                cl_table, cl_k = build_decode(cl_lens)
                assert cl_k == 0, f"CL table kraft residual {cl_k}"
                lens = []
                while len(lens) < hlit + hdist:
                    s = read_sym(bits, cl_table)
                    if s < 16:
                        lens.append(s)
                    elif s == 16:
                        rep = bits.take(2) + 3
                        lens.extend([lens[-1]] * rep)
                    elif s == 17:
                        lens.extend([0] * (bits.take(3) + 3))
                    else:
                        lens.extend([0] * (bits.take(7) + 11))
                lit_lens = lens[:hlit]
                dist_lens = lens[hlit:]
            else:
                raise ValueError(f"btype 3 at block {block} bit {bits.pos}")
            lit_table, lit_k = build_decode(lit_lens)
            if lit_k != 0:
                raise ValueError(f"lit table kraft residual {lit_k} block {block}")
            dist_table, dist_k = build_decode(dist_lens)
            while True:
                start_bit = bits.pos
                sym = read_sym(bits, lit_table)
                if sym == 256:
                    history.append((start_bit, "EOB", len(out)))
                    break
                if sym < 256:
                    out.append(sym)
                    history.append((start_bit, "lit", sym))
                else:
                    eb = LENGTH_EXTRA[sym - 257]
                    length = LENGTH_BASE[sym - 257] + bits.take(eb)
                    dsym = read_sym(bits, dist_table)
                    dist = DIST_BASE[dsym] + bits.take(DIST_EXTRA[dsym])
                    history.append((start_bit, "match", length, dist, len(out)))
                    if dist > len(out):
                        print(f"*** INVALID DISTANCE at bit {start_bit}, block {block}:")
                        print(f"    match len={length} dist={dist} out_pos={len(out)}")
                        print(f"    lit/len sym={sym} dsym={dsym}")
                        for h in history[-max_err_ctx:]:
                            print(f"      {h}")
                        return bytes(out), False
                    for _ in range(length):
                        out.append(out[-dist])
        if bfinal:
            return bytes(out), True
        block += 1


if __name__ == "__main__":
    import sys

    raw = open(sys.argv[1], "rb").read()
    # assume gzip member: skip 10+XLEN header, drop 8-byte footer
    assert raw[:2] == b"\x1f\x8b"
    flg = raw[3]
    off = 10
    if flg & 4:
        xlen = raw[10] | (raw[11] << 8)
        off = 12 + xlen
    out, ok = inflate_steps(raw[off:-8])
    print(f"decoded {len(out)} bytes ok={ok}")
