"""Bit-equivalence of the Pallas kernels against their XLA formulations.

The kernels run in interpret mode on the CPU mesh (auto-selected — the
Mosaic lowering is TPU-only); on-device equivalence is re-checked by
scripts/probe_r5_match.py. Mirrors tests/test_pack_sortscan.py's
equivalence strategy for the round-4 packer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gzp_tpu.ops import lz
from gzp_tpu.ops.deflate_kernel import pack_entries_sortscan
from gzp_tpu.ops.lz_pallas import best_matches_pallas
from gzp_tpu.ops.pack_pallas import pack_entries_sortscan_pallas


def _corpus(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [b"the quick brown fox ", b"jumps over the lazy dog ",
             b"pack my box with five dozen liquor jugs "]
    out, total = [], 0
    while total < n:
        w = words[rng.integers(0, len(words))]
        out.append(w)
        total += len(w)
    return b"".join(out)[:n]


@pytest.mark.parametrize("pw,lags", [(3, 2), (2, 4), (2, 1)])
def test_match_pallas_equals_xla(pw, lags):
    B, N = 2, 8192  # aligned to (8, 128) tiles: exact equality holds
    data = np.frombuffer(_corpus(B * N), np.uint8).reshape(B, N)
    lengths = jnp.asarray(np.array([N, N - 321], np.int32))
    kw = dict(max_dist=32768, max_match=258, min_emit=3, lazy=True,
              payload_words=pw, lags=lags)
    ln1, d1 = jax.jit(lambda d: lz.best_matches(d, lengths, **kw))(data)
    ln2, d2 = best_matches_pallas(jnp.asarray(data), lengths, **kw)
    ln1, d1, ln2, d2 = map(np.asarray, (ln1, d1, ln2, d2))
    assert np.array_equal(ln1, ln2)
    assert np.array_equal(d1[ln1 > 0], d2[ln1 > 0])


def test_match_pallas_halo():
    B, N, BASE = 2, 6144, 2048
    blob = np.frombuffer(_corpus(B * (N + BASE), seed=3), np.uint8).reshape(
        B, N + BASE
    )
    lengths = jnp.asarray(np.array([N, N - 55], np.int32))
    hs = jnp.asarray(np.array([0, 1024], np.int32))
    kw = dict(max_dist=32768, max_match=258, min_emit=3, lazy=True,
              payload_words=3, lags=2, base=BASE)
    ln1, d1 = jax.jit(
        lambda d: lz.best_matches(d, lengths, halo_start=hs, **kw)
    )(blob)
    ln2, d2 = best_matches_pallas(
        jnp.asarray(blob), lengths, halo_start=hs, **kw
    )
    assert np.array_equal(np.asarray(ln1), np.asarray(ln2))


def test_pack_pallas_equals_xla():
    rng = np.random.default_rng(1)
    B, E = 3, 5000  # unaligned entry count exercises the pad path
    nb = rng.integers(0, 32, (B, E)).astype(np.int32)
    nb[rng.random((B, E)) < 0.5] = 0
    bits = rng.integers(0, 1 << 31, (B, E), dtype=np.int64).astype(np.uint32)
    bits = np.where(
        nb > 0,
        bits & ((1 << np.minimum(nb, 31)) - 1).astype(np.uint32),
        0,
    ).astype(np.uint32)
    for base_bits in (0, 160):
        ow = (int(nb.sum(1).max()) + base_bits + 31) // 32 + 8
        w1, t1 = jax.jit(
            lambda b_, n_, bb=base_bits, o=ow: pack_entries_sortscan(b_, n_, bb, o)
        )(bits, nb)
        w2, t2 = pack_entries_sortscan_pallas(
            jnp.asarray(bits), jnp.asarray(nb), base_bits, ow
        )
        assert np.array_equal(np.asarray(t1), np.asarray(t2))
        assert np.array_equal(np.asarray(w1), np.asarray(w2))


def test_full_encoder_with_pallas_match():
    """End-to-end: pallas_match=True members decode with stdlib gzip."""
    import dataclasses
    import gzip

    from gzp_tpu.ops.deflate_kernel import (
        DeflateEncodeConfig,
        encode_deflate_blocks,
    )

    B, N = 2, 16384
    data = np.frombuffer(_corpus(B * N, seed=9), np.uint8).reshape(B, N)
    cfg = dataclasses.replace(
        DeflateEncodeConfig.for_level(N, "mgzip", "none", 3), pallas_match=True
    )
    res = encode_deflate_blocks(
        cfg,
        jnp.asarray(data),
        jnp.full((B,), N, jnp.int32),
        jnp.zeros((B,), bool),
    )
    out = np.asarray(res["out"])
    ol = np.asarray(res["out_len"])
    for i in range(B):
        assert gzip.decompress(out[i, : ol[i]].tobytes()) == data[i].tobytes()


def test_snappy_pallas_path():
    """Snappy with the fused Pallas matcher+packer decodes identically."""
    from gzp_tpu.ops.snappy_kernel import SnappyEncodeConfig, encode_snappy_blocks
    from gzp_tpu.utils.snappy_ref import decode_frames

    B, N = 2, 16384
    data = np.frombuffer(_corpus(B * N, seed=17), np.uint8).reshape(B, N)
    lengths = jnp.full((B,), N, jnp.int32)
    finals = jnp.zeros((B,), bool)
    res_p = encode_snappy_blocks(
        SnappyEncodeConfig(N, pallas=True), jnp.asarray(data), lengths, finals
    )
    out = np.asarray(res_p["out"])
    ol = np.asarray(res_p["out_len"])
    for i in range(B):
        assert decode_frames(out[i, : ol[i]].tobytes()) == data[i].tobytes()
    # byte-identical to the XLA formulation
    res_x = encode_snappy_blocks(
        SnappyEncodeConfig(N, pallas=False), jnp.asarray(data), lengths, finals
    )
    assert np.array_equal(np.asarray(res_x["out_len"]), ol)
    assert np.array_equal(np.asarray(res_x["out"]), np.asarray(res_p["out"]))


def test_int8_lookup_byte_identical():
    """lookup='int8' (nibble-split int8 matmul) must produce the same
    stream as the f32/bf16 one-hot path."""
    import dataclasses
    import gzip

    from gzp_tpu.ops.deflate_kernel import (
        DeflateEncodeConfig,
        encode_deflate_blocks,
    )

    B, N = 2, 32768
    data = np.frombuffer(_corpus(B * N, seed=31), np.uint8).reshape(B, N)
    lengths = jnp.full((B,), N, jnp.int32)
    finals = jnp.zeros((B,), bool)
    base = DeflateEncodeConfig.for_level(N, "mgzip", "none", 3)
    r1 = encode_deflate_blocks(base, jnp.asarray(data), lengths, finals)
    c8 = dataclasses.replace(base, lookup="int8")
    r2 = encode_deflate_blocks(c8, jnp.asarray(data), lengths, finals)
    assert np.array_equal(np.asarray(r1["out_len"]), np.asarray(r2["out_len"]))
    assert np.array_equal(np.asarray(r1["out"]), np.asarray(r2["out"]))
    ol = np.asarray(r2["out_len"])
    for i in range(B):
        assert gzip.decompress(
            np.asarray(r2["out"])[i, : ol[i]].tobytes()
        ) == data[i].tobytes()


@pytest.mark.parametrize("pw,lags,skw", [(3, 3, 0), (7, 16, 0), (7, 16, 2), (3, 4, 1)])
def test_match_suffix_pallas_equals_xla(pw, lags, skw):
    """Suffix-matcher (levels >= 6) Pallas path is bit-identical to
    lz.best_matches(suffix=True), incl. truncated-key configs."""
    from gzp_tpu.ops.lz_pallas import best_matches_suffix_pallas

    B, N = 2, 8192
    data = np.frombuffer(_corpus(B * N, seed=5), np.uint8).reshape(B, N)
    lengths = jnp.asarray(np.array([N, N - 321], np.int32))
    kw = dict(max_dist=32768, max_match=258, min_emit=3, lazy=True,
              payload_words=pw, lags=lags, suffix_keys=skw)
    ln1, d1 = jax.jit(
        lambda d: lz.best_matches(d, lengths, suffix=True, **kw)
    )(data)
    ln2, d2 = best_matches_suffix_pallas(jnp.asarray(data), lengths, **kw)
    ln1, d1, ln2, d2 = map(np.asarray, (ln1, d1, ln2, d2))
    assert np.array_equal(ln1, ln2)
    assert np.array_equal(d1[ln1 > 0], d2[ln1 > 0])


def test_match_suffix_pallas_halo():
    from gzp_tpu.ops.lz_pallas import best_matches_suffix_pallas

    B, N, BASE = 2, 6144, 2048
    blob = np.frombuffer(_corpus(B * (N + BASE), seed=11), np.uint8).reshape(
        B, N + BASE
    )
    lengths = jnp.asarray(np.array([N, N - 55], np.int32))
    hs = jnp.asarray(np.array([0, 1024], np.int32))
    kw = dict(max_dist=32768, max_match=258, min_emit=3, lazy=True,
              payload_words=3, lags=4, base=BASE)
    ln1, d1 = jax.jit(
        lambda d: lz.best_matches(d, lengths, halo_start=hs, suffix=True, **kw)
    )(blob)
    ln2, d2 = best_matches_suffix_pallas(
        jnp.asarray(blob), lengths, halo_start=hs, **kw
    )
    ln1, d1, ln2, d2 = map(np.asarray, (ln1, d1, ln2, d2))
    assert np.array_equal(ln1, ln2)
    assert np.array_equal(d1[ln1 > 0], d2[ln1 > 0])


def test_full_encoder_level6_pallas_match():
    """Level-6 (suffix matcher) members with pallas_match decode clean."""
    import dataclasses
    import gzip

    from gzp_tpu.ops.deflate_kernel import (
        DeflateEncodeConfig,
        encode_deflate_blocks,
    )

    B, N = 2, 16384
    data = np.frombuffer(_corpus(B * N, seed=23), np.uint8).reshape(B, N)
    cfg = dataclasses.replace(
        DeflateEncodeConfig.for_level(N, "mgzip", "none", 6), pallas_match=True
    )
    assert cfg.matcher == "suffix"
    res = encode_deflate_blocks(
        cfg,
        jnp.asarray(data),
        jnp.full((B,), N, jnp.int32),
        jnp.zeros((B,), bool),
    )
    out = np.asarray(res["out"])
    ol = np.asarray(res["out_len"])
    for i in range(B):
        assert gzip.decompress(out[i, : ol[i]].tobytes()) == data[i].tobytes()
