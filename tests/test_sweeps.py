"""Randomized structural sweeps — the analog of the reference's proptest
suites (``test_all_gzip_comp`` etc., reference src/deflate.rs:1053-1378):
random input sizes, buffer sizes, parallelism degrees, write
fragmentation and compression levels, validated against independent
decoders. Deterministically seeded. The wider sweeps are marked slow
(run with ``-m slow``; CI default runs the fast subset), mirroring the
reference's ignored-by-default heavy proptests (README.md:146-155).
"""

import gzip
import io
import zlib

import numpy as np
import pytest

from gzp_tpu import Bgzf, Gzip, Mgzip, ParDecompress, RawDeflate, Snap, ZBuilder, Zlib
from gzp_tpu.constants import DICT_SIZE
from gzp_tpu.utils.snappy_ref import decode_frames

BS = DICT_SIZE  # smallest legal buffer -> most block boundaries exercised


def random_payload(rng, max_len=160_000):
    """Mixed-entropy payload: text-ish, runs, random sections."""
    n = int(rng.integers(0, max_len))
    parts = []
    total = 0
    while total < n:
        kind = rng.integers(0, 3)
        ln = int(rng.integers(1, 20_000))
        if kind == 0:
            words = [b"some random words here ", b"exercise the encoder ", b"aaaa "]
            parts.append(words[rng.integers(0, 3)] * (ln // 20 + 1))
        elif kind == 1:
            parts.append(bytes([int(rng.integers(0, 256))]) * ln)
        else:
            parts.append(rng.integers(0, 256, ln, dtype=np.uint8).tobytes())
        total += len(parts[-1])
    return b"".join(parts)[:n]


def roundtrip(fmt, decode, payload, rng, *, nt, bs, level):
    buf = io.BytesIO()
    w = (
        ZBuilder(fmt)
        .num_threads(nt)
        .buffer_size(bs)
        .compression_level(level)
        .from_writer(buf)
    )
    off = 0
    while off < len(payload):
        step = int(rng.integers(1, 50_000))
        w.write(payload[off : off + step])
        off += step
    w.finish()
    blob = buf.getvalue()
    assert decode(blob) == payload
    return blob


ORACLES = {
    "gzip": (Gzip, gzip.decompress),
    "zlib": (Zlib, zlib.decompress),
    "mgzip": (Mgzip, gzip.decompress),
    "bgzf": (Bgzf, gzip.decompress),
    "snappy": (Snap, decode_frames),
}


@pytest.mark.parametrize("fmt_name", list(ORACLES))
def test_sweep_fast(fmt_name):
    fmt, decode = ORACLES[fmt_name]
    rng = np.random.default_rng(hash(fmt_name) % 2**31)
    for trial in range(5):
        payload = random_payload(rng, 120_000)
        nt = int(rng.integers(1, 5))
        # levels 0 and 9 in the fast tier (reference proptests sweep the
        # full 0..9 range, src/deflate.rs:1053-1102)
        level = int(rng.choice([0, 1, 3, 6, 9]))
        roundtrip(fmt, decode, payload, rng, nt=nt, bs=BS, level=level)


@pytest.mark.parametrize("fmt_name", ["mgzip", "bgzf"])
def test_flush_midstream_block_formats(fmt_name):
    """flush() mid-stream on block formats: the flushed prefix must be a
    complete, independently decodable sequence of members (reference
    BgzfSyncWriter::flush drains whole blocks, src/bgzf.rs:332-347)."""
    fmt, decode = ORACLES[fmt_name]
    rng = np.random.default_rng(11)
    payload = random_payload(rng, 150_000)
    buf = io.BytesIO()
    w = ZBuilder(fmt).num_threads(2).buffer_size(BS).from_writer(buf)
    w.write(payload[: len(payload) // 2])
    w.flush()
    mid = buf.getvalue()
    assert decode(mid) == payload[: len(payload) // 2]
    w.write(payload[len(payload) // 2 :])
    w.finish()
    assert decode(buf.getvalue()) == payload


def test_snappy_fragmented_writes():
    """Byte-at-a-time and odd-sized writes through the snappy frame
    encoder (reference test_all_snap's write_size axis, src/snap.rs:160-239)."""
    rng = np.random.default_rng(12)
    payload = random_payload(rng, 90_000)
    buf = io.BytesIO()
    w = ZBuilder(Snap).num_threads(2).from_writer(buf)
    off = 0
    while off < len(payload):
        step = int(rng.choice([1, 2, 7, 333, 65_536]))
        w.write(payload[off : off + step])
        off += step
    w.finish()
    assert decode_frames(buf.getvalue()) == payload


def test_sweep_raw_deflate():
    rng = np.random.default_rng(7)

    def decode(blob):
        d = zlib.decompressobj(wbits=-15)
        return d.decompress(blob) + d.flush()

    for trial in range(3):
        payload = random_payload(rng, 100_000)
        roundtrip(RawDeflate, decode, payload, rng, nt=2, bs=BS, level=3)


@pytest.mark.slow
@pytest.mark.parametrize("fmt_name", list(ORACLES))
def test_sweep_wide(fmt_name):
    """Wider randomized sweep incl. own-reader decode for block formats."""
    fmt, decode = ORACLES[fmt_name]
    rng = np.random.default_rng(hash(fmt_name + "wide") % 2**31)
    for trial in range(6):
        payload = random_payload(rng, 320_000)
        nt = int(rng.integers(1, 9))
        bs = int(rng.integers(DICT_SIZE, DICT_SIZE * 4))
        level = int(rng.integers(0, 10))
        blob = roundtrip(fmt, decode, payload, rng, nt=nt, bs=bs, level=level)
        if fmt_name in ("mgzip", "bgzf"):
            r = ParDecompress(fmt, io.BytesIO(blob), num_threads=nt)
            assert r.read() == payload
