"""Format framing parity tests: byte-exact header/footer layouts against
the reference's serializers (reference src/deflate.rs:113-143,221-251,
src/mgzip.rs:244-278, src/bgzf.rs:272-303)."""

import struct

from gzp_tpu import Bgzf, Gzip, Mgzip, RawDeflate, Snap, Zlib
from gzp_tpu.check import Adler32, Crc32
from gzp_tpu.constants import BGZF_EOF
from gzp_tpu.utils.serialize import put_be, put_le, put_pairs


def test_put_pairs_endianness():
    # pigz-style Pair semantics: negative width = big endian
    assert put_pairs([(2, 0x0102)]) == b"\x02\x01"
    assert put_pairs([(-2, 0x0102)]) == b"\x01\x02"
    assert put_le(1, 4) == b"\x01\x00\x00\x00"
    assert put_be(1, 4) == b"\x00\x00\x00\x01"


def test_gzip_header_layout():
    # reference src/deflate.rs:113-133: 1f 8b 08 00 mtime=0 xfl os=255
    assert Gzip.header(3) == bytes([31, 139, 8, 0, 0, 0, 0, 0, 0, 255])
    assert Gzip.header(9)[8] == 2
    assert Gzip.header(1)[8] == 4


def test_gzip_footer_layout():
    c = Crc32()
    c.update(b"abc")
    footer = Gzip.footer(c)
    crc, isize = struct.unpack("<II", footer)
    import zlib

    assert crc == zlib.crc32(b"abc") and isize == 3


def test_zlib_header_mod31():
    # reference src/deflate.rs:221-243: big-endian, multiple of 31
    for level in range(10):
        hdr = Zlib.header(level)
        assert len(hdr) == 2
        value = (hdr[0] << 8) | hdr[1]
        assert value % 31 == 0
        assert hdr[0] == 0x78
    # level-to-FLEVEL mapping
    assert (Zlib.header(9)[1] >> 6) == 3
    assert (Zlib.header(1)[1] >> 6) == 0
    assert (Zlib.header(6)[1] >> 6) == 1
    assert (Zlib.header(3)[1] >> 6) == 2


def test_zlib_footer_bigendian_adler():
    a = Adler32()
    a.update(b"abc")
    import zlib

    assert Zlib.footer(a) == zlib.adler32(b"abc").to_bytes(4, "big")


def test_raw_and_snap_frameless():
    assert RawDeflate.header(3) == b"" and RawDeflate.footer(None) == b""
    assert Snap.header(3) == b"" and Snap.footer(None) == b""


def test_block_header_parsers():
    # mgzip: 20-byte header, 'IG' SID, u32 BLEN (reference src/deflate.rs:406-423)
    hdr = bytes([31, 139, 8, 4, 0, 0, 0, 0, 0, 255, 8, 0]) + b"IG" + bytes([4, 0]) + struct.pack("<I", 1234)
    Mgzip.check_header(hdr)
    assert Mgzip.get_block_size(hdr) == 1234
    assert Mgzip.header_size == 20

    # bgzf: 18-byte header, 'BC' SID, u16 BSIZE+1 (reference src/deflate.rs:555-573)
    hdr = bytes([31, 139, 8, 4, 0, 0, 0, 0, 0, 255, 6, 0]) + b"BC" + bytes([2, 0]) + struct.pack("<H", 999)
    Bgzf.check_header(hdr)
    assert Bgzf.get_block_size(hdr) == 1000
    assert Bgzf.header_size == 18

    import pytest

    from gzp_tpu.errors import InvalidHeaderError

    bad = bytearray(hdr)
    bad[12] = ord("X")
    with pytest.raises(InvalidHeaderError):
        Bgzf.check_header(bytes(bad))
    bad = bytearray(hdr)
    bad[3] = 0
    with pytest.raises(InvalidHeaderError):
        Bgzf.check_header(bytes(bad))


def test_footer_values():
    blob = b"x" * 10 + struct.pack("<II", 0xDEADBEEF, 42)
    fv = Bgzf.get_footer_values(blob)
    assert fv.sum == 0xDEADBEEF and fv.amount == 42


def test_bgzf_eof_marker():
    # byte-for-byte the htslib EOF block (reference src/bgzf.rs:24-38)
    assert len(BGZF_EOF) == 28
    assert Bgzf.trailer_bytes() == BGZF_EOF
    import gzip

    assert gzip.decompress(BGZF_EOF) == b""
