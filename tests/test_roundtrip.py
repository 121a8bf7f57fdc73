"""End-to-end roundtrip tests through ZBuilder for every format, decoded
with independent oracles — the reference's core test pattern
(``test_simple*``, reference src/deflate.rs:679-912): write through our
API, decode with zlib/gzip, assert byte equality."""

import gzip
import io
import zlib

import numpy as np
import pytest

from gzp_tpu import Bgzf, Gzip, Mgzip, RawDeflate, Snap, ZBuilder, Zlib
from gzp_tpu.constants import BGZF_EOF
from gzp_tpu.utils.snappy_ref import decode_frames

BS = 32768  # smallest legal buffer size -> fastest CPU compiles


def make_text(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"this is a first test line\n", b"this is a second test line\n",
             b"the quick brown fox ", b"jumps over the lazy dog "]
    reps, total = [], 0
    while total < n:
        w = words[rng.integers(0, len(words))]
        reps.append(w)
        total += len(w)
    return b"".join(reps)[:n]


def compress(fmt, payload, nt=2, bs=BS, level=3, write_size=None, seed=1):
    buf = io.BytesIO()
    w = (
        ZBuilder(fmt)
        .num_threads(nt)
        .compression_level(level)
        .buffer_size(bs)
        .from_writer(buf)
    )
    if write_size is None:
        w.write(payload)
    else:
        rng = np.random.default_rng(seed)
        off = 0
        while off < len(payload):
            step = int(rng.integers(1, write_size))
            w.write(payload[off : off + step])
            off += step
    out = w.finish()
    assert out is buf
    return buf.getvalue()


def raw_inflate(blob):
    d = zlib.decompressobj(wbits=-15)
    return d.decompress(blob) + d.flush()


@pytest.mark.parametrize("nt", [1, 2, 4])
def test_simple_gzip(nt):
    data = make_text(100_000)
    out = compress(Gzip, data, nt=nt)
    assert gzip.decompress(out) == data


def test_simple_zlib():
    data = make_text(90_000)
    assert zlib.decompress(compress(Zlib, data)) == data


def test_simple_raw_deflate():
    data = make_text(70_000)
    assert raw_inflate(compress(RawDeflate, data)) == data


def test_simple_mgzip_is_multimember_gzip():
    # reference test_simple_mgzip proves mgzip output is standard
    # multi-member gzip (src/deflate.rs:679-709)
    data = make_text(120_000)
    out = compress(Mgzip, data)
    assert gzip.decompress(out) == data


def test_simple_bgzf():
    data = make_text(120_000)
    out = compress(Bgzf, data)
    assert gzip.decompress(out) == data
    assert out.endswith(BGZF_EOF)


def test_simple_snappy():
    data = make_text(100_000)
    out = compress(Snap, data)
    assert decode_frames(out) == data


@pytest.mark.parametrize("fmt,decode", [
    (Gzip, gzip.decompress),
    (Mgzip, gzip.decompress),
    (Snap, decode_frames),
])
def test_fragmented_writes(fmt, decode):
    data = make_text(150_000, seed=3)
    out = compress(fmt, data, nt=2, write_size=1000)
    assert decode(out) == data


@pytest.mark.parametrize("fmt,decode", [
    (Gzip, gzip.decompress),
    (Zlib, zlib.decompress),
    (Mgzip, gzip.decompress),
    (Bgzf, gzip.decompress),
    (Snap, decode_frames),
])
def test_empty_stream(fmt, decode):
    out = compress(fmt, b"")
    assert decode(out) == b""


@pytest.mark.parametrize("fmt,decode", [
    (Gzip, gzip.decompress),
    (Bgzf, gzip.decompress),
    (Snap, decode_frames),
])
def test_incompressible(fmt, decode):
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    out = compress(fmt, data)
    assert decode(out) == data
    assert len(out) < len(data) + len(data) // 50 + 200  # bounded expansion


@pytest.mark.parametrize("payload", [b"", b"x", b"hello world", b"ab" * 16384])
def test_tiny_payloads(payload):
    assert gzip.decompress(compress(Gzip, payload)) == payload
    assert gzip.decompress(compress(Mgzip, payload)) == payload


def test_drop_implies_finish():
    # reference test_simple_drop (src/deflate.rs:744-775): the stream is
    # finalized even if the user forgets finish()
    data = make_text(50_000)
    buf = io.BytesIO()
    w = ZBuilder(Gzip).num_threads(2).buffer_size(BS).from_writer(buf)
    w.write(data)
    del w
    import gc

    gc.collect()
    assert gzip.decompress(buf.getvalue()) == data


def test_context_manager():
    data = make_text(40_000)
    buf = io.BytesIO()
    with ZBuilder(Gzip).num_threads(2).buffer_size(BS).from_writer(buf) as w:
        w.write(data)
    assert gzip.decompress(buf.getvalue()) == data


def test_flush_mid_stream():
    data = make_text(80_000)
    buf = io.BytesIO()
    w = ZBuilder(Gzip).num_threads(2).buffer_size(BS).from_writer(buf)
    w.write(data[:50_000])
    w.flush()
    mid = len(buf.getvalue())
    assert mid > 0  # flushed bytes visible
    w.write(data[50_000:])
    w.finish()
    assert gzip.decompress(buf.getvalue()) == data


def test_regression_dict_boundary():
    # reference test_regression (src/deflate.rs:948-992): input exactly at
    # buffer_size with repeated prefix — historical dictionary-carry bug
    seed = (b"AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
            b"GATCGATCGATCGATCGATCGATCGATCGGGGGGGGGGGGGGGGGGGGGG")
    data = (seed * ((BS // len(seed)) + 1))[:BS + 100]
    out = compress(Gzip, data, nt=2, bs=BS)
    assert gzip.decompress(out) == data


def test_all_levels_valid():
    data = make_text(60_000)
    for level in [0, 1, 3, 6, 9]:
        out = compress(Gzip, data, level=level)
        assert gzip.decompress(out) == data
        # XFL byte reflects the level class (reference src/deflate.rs:113-120)
        expected_xfl = 2 if level >= 9 else (4 if level <= 1 else 0)
        assert out[8] == expected_xfl
