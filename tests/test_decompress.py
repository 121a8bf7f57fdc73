"""Parallel decompression tests: own-writer end-to-end roundtrips
(reference ``test_simple_mgzip_etoe_decompress`` /
``test_simple_bgzf_etoe_decompress``, src/deflate.rs:994-1051), plus
foreign-stream decoding (htslib-style BGZF written by an independent
implementation) and corruption detection."""

import io
import struct
import zlib

import numpy as np
import pytest

from gzp_tpu import (
    Bgzf,
    InvalidCheckError,
    InvalidHeaderError,
    Mgzip,
    MultiGzDecoder,
    ParDecompress,
    ParDecompressBuilder,
    SyncBlockReader,
    ZBuilder,
)
from gzp_tpu.errors import GzpError

BS = 32768


def make_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"end to end decompress test ", b"round and round it goes ",
             b"0123456789abcdef"]
    reps, total = [], 0
    while total < n:
        w = words[rng.integers(0, len(words))]
        reps.append(w)
        total += len(w)
    return b"".join(reps)[:n]


def compress(fmt, payload, nt=2, bs=BS):
    buf = io.BytesIO()
    w = ZBuilder(fmt).num_threads(nt).buffer_size(bs).from_writer(buf)
    w.write(payload)
    w.finish()
    return buf.getvalue()


def zlib_bgzf_member(data: bytes) -> bytes:
    """Independent BGZF member built with stdlib zlib (foreign stream)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    payload = co.compress(data) + co.flush()
    bsize = len(payload) + 18 + 8 - 1
    hdr = (
        bytes([31, 139, 8, 4, 0, 0, 0, 0, 0, 255, 6, 0])
        + b"BC"
        + struct.pack("<H", 2)
        + struct.pack("<H", bsize)
    )
    return hdr + payload + struct.pack("<II", zlib.crc32(data), len(data))


@pytest.mark.parametrize("fmt", [Mgzip, Bgzf])
@pytest.mark.parametrize("nt", [1, 4])
def test_etoe_roundtrip(fmt, nt):
    data = make_text(200_000, seed=nt)
    blob = compress(fmt, data)
    r = ParDecompressBuilder(fmt).num_threads(nt).from_reader(io.BytesIO(blob))
    assert r.read() == data


def test_read_in_small_pieces():
    data = make_text(150_000, seed=5)
    blob = compress(Bgzf, data)
    r = ParDecompress(Bgzf, io.BytesIO(blob), num_threads=2)
    out = bytearray()
    while True:
        piece = r.read(1000)
        if not piece:
            break
        out += piece
    assert bytes(out) == data


def test_sync_block_reader():
    data = make_text(100_000, seed=6)
    blob = compress(Mgzip, data)
    r = SyncBlockReader(Mgzip, io.BytesIO(blob))
    assert r.read() == data


def test_foreign_bgzf_stream():
    """Streams produced by an independent implementation must decode
    (dynamic-Huffman deflate from zlib)."""
    parts = [make_text(60_000, seed=7), make_text(65280, seed=8), b"tail"]
    blob = b"".join(zlib_bgzf_member(p) for p in parts)
    r = ParDecompress(Bgzf, io.BytesIO(blob), num_threads=3)
    assert r.read() == b"".join(parts)


def test_corrupt_crc_detected():
    data = make_text(50_000, seed=9)
    blob = bytearray(compress(Bgzf, data))
    # flip a bit inside the first block's compressed payload
    blob[30] ^= 0xFF
    r = ParDecompress(Bgzf, io.BytesIO(bytes(blob)), num_threads=2)
    with pytest.raises(GzpError):  # InvalidCheck or Decompress error
        r.read()


def test_bad_header_detected():
    blob = bytearray(compress(Bgzf, b"hello"))
    blob[12] = ord("X")  # break the 'BC' SID
    r = ParDecompress(Bgzf, io.BytesIO(bytes(blob)), num_threads=1)
    with pytest.raises(InvalidHeaderError):
        r.read()


def test_multigz_fallback_reader():
    import gzip as _gzip

    data = make_text(80_000, seed=10)
    blob = compress(Mgzip, data)
    r = ParDecompressBuilder(Mgzip).maybe_par_from_reader(io.BytesIO(blob), num_threads=0)
    assert isinstance(r, MultiGzDecoder)
    assert r.read() == data
    # also reads plain single-member gzip with filename field
    buf = io.BytesIO()
    with _gzip.GzipFile(filename="name.txt", fileobj=buf, mode="wb") as g:
        g.write(data)
    assert MultiGzDecoder(io.BytesIO(buf.getvalue())).read() == data


def test_multigz_streams_bounded_memory():
    """The 0-thread reader must consume input incrementally (member at a
    time), not slurp the stream (reference src/par/decompress.rs:93-99 is
    a true streaming reader)."""
    import zlib as _zlib

    # many small members: ~4 MB stream of 64 KiB members
    member_plain = make_text(65536, seed=3)
    raw = _zlib.compress(member_plain, 1)[2:-4]
    one = (
        b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
        + raw
        + struct.pack("<II", _zlib.crc32(member_plain), len(member_plain))
    )
    nmembers = 64
    blob = one * nmembers

    class MeteredReader(io.RawIOBase):
        def __init__(self, data):
            self.data = data
            self.pos = 0
            self.max_request = 0

        def read(self, size=-1):
            assert size is not None and size >= 0, "streaming reader must bound reads"
            self.max_request = max(self.max_request, size)
            out = self.data[self.pos : self.pos + size]
            self.pos += len(out)
            return out

    src = MeteredReader(blob)
    dec = MultiGzDecoder(src)
    out = bytearray()
    while True:
        chunk = dec.read(1 << 16)
        if not chunk:
            break
        out += chunk
        # input consumption tracks output: never more than a few members
        # ahead of what has been returned
        assert src.pos <= len(one) * (len(out) // len(member_plain) + 3) + (1 << 21)
    assert bytes(out) == member_plain * nmembers
    assert src.max_request <= 1 << 27


def test_mgzip_blen_roundtrip_field():
    blob = compress(Mgzip, make_text(40_000, seed=11))
    blen = struct.unpack("<I", blob[16:20])[0]
    Mgzip.check_header(blob[:20])
    assert Mgzip.get_block_size(blob[:20]) == blen


def test_snappy_frame_decoder_roundtrip():
    """Production frame decode path (native snappy block decoder), mirror
    of reference examples/snap_decode.rs usage."""
    from gzp_tpu import Snap
    from gzp_tpu.formats.snap import SnappyFrameDecoder

    data = make_text(200_000, seed=12)
    blob = compress(Snap, data, nt=4, bs=BS)
    r = SnappyFrameDecoder(io.BytesIO(blob))
    assert r.read() == data
    # sized reads drain identically
    r2 = SnappyFrameDecoder(io.BytesIO(blob))
    chunks = []
    while True:
        c = r2.read(7777)
        if not c:
            break
        chunks.append(c)
    assert b"".join(chunks) == data


def test_snappy_frame_decoder_matches_oracle():
    from gzp_tpu import Snap
    from gzp_tpu.formats.snap import SnappyFrameDecoder
    from gzp_tpu.utils.snappy_ref import decode_frames

    data = make_text(120_000, seed=13)
    blob = compress(Snap, data, nt=2)
    assert SnappyFrameDecoder(io.BytesIO(blob)).read() == decode_frames(blob)


def test_snappy_frame_decoder_skippable_and_corrupt():
    from gzp_tpu import Snap
    from gzp_tpu.formats.snap import SnappyFrameDecoder

    data = make_text(30_000, seed=14)
    blob = compress(Snap, data)
    # splice a padding chunk and a skippable chunk after the stream id
    pad = bytes([0xFE, 3, 0, 0]) + b"xyz"
    skip = bytes([0x80, 2, 0, 0]) + b"ab"
    spliced = blob[:10] + pad + skip + blob[10:]
    assert SnappyFrameDecoder(io.BytesIO(spliced)).read() == data

    # corrupt a chunk CRC -> InvalidCheckError
    bad = bytearray(blob)
    bad[14] ^= 0x55  # inside the first chunk's CRC field
    with pytest.raises(GzpError):
        SnappyFrameDecoder(io.BytesIO(bytes(bad))).read()


class DribbleReader(io.RawIOBase):
    """Returns at most a few bytes per read() — models pipes/sockets/raw
    files whose short returns are NOT end-of-stream (reference handles
    this with read_exact loops, src/par/decompress.rs:197-202)."""

    def __init__(self, data: bytes, max_chunk: int = 7):
        self.data = data
        self.pos = 0
        self.max_chunk = max_chunk
        self.calls = 0

    def readable(self):
        return True

    def read(self, size=-1):
        self.calls += 1
        if self.pos >= len(self.data):
            return b""
        n = min(size if size >= 0 else self.max_chunk,
                1 + (self.calls * 3) % self.max_chunk)
        out = self.data[self.pos : self.pos + n]
        self.pos += len(out)
        return out


@pytest.mark.parametrize("fmt", [Mgzip, Bgzf])
def test_short_read_sources_block_reader(fmt):
    """Block readers must loop over short reads, not call them corruption."""
    data = make_text(150_000, seed=21)
    blob = compress(fmt, data, nt=2)
    r = ParDecompress(fmt, DribbleReader(blob), num_threads=2)
    assert r.read() == data
    r.close()


def test_short_read_sources_snappy():
    from gzp_tpu import Snap
    from gzp_tpu.formats.snap import SnappyFrameDecoder

    data = make_text(90_000, seed=22)
    blob = compress(Snap, data, nt=2)
    assert SnappyFrameDecoder(DribbleReader(blob)).read() == data


def test_short_read_sources_multigz():
    data = make_text(80_000, seed=23)
    blob = b"".join(
        __import__("gzip").compress(data[i : i + 20_000])
        for i in range(0, len(data), 20_000)
    )
    assert MultiGzDecoder(DribbleReader(blob)).read() == data


def test_decompress_builder_knobs():
    """Reference builder parity: buffer_size / queue_size / pin_threads
    (src/par/decompress.rs:29-66)."""
    from gzp_tpu.errors import BufferSizeError

    data = make_text(100_000, seed=24)
    blob = compress(Mgzip, data, nt=2)
    r = (
        ParDecompressBuilder(Mgzip)
        .num_threads(2)
        .buffer_size(1 << 16)
        .queue_size(3)
        .pin_threads(0)
        .from_reader(io.BytesIO(blob))
    )
    assert r._pending is not None and r.queue_depth == 3
    assert r.read() == data
    r.close()
    with pytest.raises(BufferSizeError):
        ParDecompressBuilder(Mgzip).buffer_size(100)
    with pytest.raises(ValueError):
        ParDecompressBuilder(Mgzip).queue_size(0)
