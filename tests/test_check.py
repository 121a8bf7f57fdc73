"""Check subsystem tests: combine math + batched device checksums vs
independent oracles (zlib), mirroring the reference's cross-validation
strategy (SURVEY.md §4)."""

import random
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from gzp_tpu.check import (
    Adler32,
    Crc32,
    Crc32C,
    PassThroughCheck,
    adler32_combine,
    crc32_combine,
    crc32c,
    crc32c_combine,
    snappy_mask_crc,
)
from gzp_tpu.ops import checksum


def test_crc32_combine_matches_zlib():
    rnd = random.Random(0)
    for _ in range(10):
        a = rnd.randbytes(rnd.randint(0, 3000))
        b = rnd.randbytes(rnd.randint(0, 3000))
        assert crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b)) == zlib.crc32(a + b)


def test_adler32_combine_matches_zlib():
    rnd = random.Random(1)
    for _ in range(10):
        a = rnd.randbytes(rnd.randint(0, 3000))
        b = rnd.randbytes(rnd.randint(0, 3000))
        assert adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b)) == zlib.adler32(a + b)


def test_crc32c_known_answers():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    a, b = b"hello ", b"world"
    assert crc32c_combine(crc32c(a), crc32c(b), len(b)) == crc32c(a + b)


def test_check_objects_combine():
    rnd = random.Random(2)
    blocks = [rnd.randbytes(rnd.randint(1, 2000)) for _ in range(5)]
    whole = b"".join(blocks)

    for cls, oracle in [(Crc32, zlib.crc32), (Adler32, zlib.adler32)]:
        total = cls()
        for blk in blocks:
            part = cls()
            part.update(blk)
            total.combine(part)
        assert total.sum() == oracle(whole)
        assert total.amount() == len(whole)

    p = PassThroughCheck()
    p.update(b"abc")
    assert p.sum() == 0 and p.amount() == 3


@pytest.mark.parametrize("n", [96, 1024, 65280, 131072])
def test_device_crc32_adler32(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, (2, n), dtype=np.uint8)
    got = np.asarray(checksum.crc32_device(jnp.asarray(data)))
    want = [zlib.crc32(data[i].tobytes()) for i in range(2)]
    assert got.tolist() == want
    gota = np.asarray(checksum.adler32_device(jnp.asarray(data)))
    wanta = [zlib.adler32(data[i].tobytes()) for i in range(2)]
    assert gota.tolist() == wanta


def test_device_exact_length_checksums():
    n = 8192
    rng = np.random.default_rng(9)
    data = np.zeros((4, n), np.uint8)
    lens = np.array([n, 0, 1, 5000], np.int32)
    for i in range(4):
        data[i, : lens[i]] = rng.integers(0, 256, lens[i], dtype=np.uint8)
    got = np.asarray(checksum.crc32_device(jnp.asarray(data), jnp.asarray(lens)))
    want = [zlib.crc32(data[i, : lens[i]].tobytes()) for i in range(4)]
    assert got.tolist() == want
    gota = np.asarray(checksum.adler32_device(jnp.asarray(data), jnp.asarray(lens)))
    wanta = [zlib.adler32(data[i, : lens[i]].tobytes()) for i in range(4)]
    assert gota.tolist() == wanta
    gotc = np.asarray(checksum.crc32c_masked_device(jnp.asarray(data), jnp.asarray(lens)))
    wantc = [snappy_mask_crc(crc32c(data[i, : lens[i]].tobytes())) for i in range(4)]
    assert gotc.tolist() == wantc
