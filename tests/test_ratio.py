"""Compression-ratio bound vs CPython zlib (BASELINE: compressed size <=
reference size; reference ratios come from zlib-ng, reference
src/deflate.rs:88-110). Asserts the level-3 bench configuration stays
within a stated bound of zlib level 3 on the bench corpus so ratio
regressions fail CI. Current measured ratio: 1.027 (benches/ratio.py,
4 MiB corpus)."""

import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks


def _corpus(nbytes: int) -> bytes:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import make_corpus

    return make_corpus(nbytes)


# measured (64 KiB blocks, bench corpus, round 5 — suffix matcher with
# the adopted lags=16 at level 6 / lags=24 at level 9): level 1 = 0.967,
# 3 = 1.005, 6 = 0.988 (BETTER than zlib-6), 9 = 1.0004 — bounds leave
# ~1% headroom so any regression of the RLE header, match search, or
# suffix candidate ranking fails loudly. Round-5 close: the suffix_keys
# truncation (level 6 keys=3: x0.9927 on the 8x64KiB A/B corpus, x0.989
# on the device bench corpus) stays under 1.0, so level 6 now
# CI-enforces beating zlib-6 outright.
@pytest.mark.parametrize(
    "level,bound", [(3, 1.02), (1, 0.98), (6, 1.0), (9, 1.01)]
)
def test_size_vs_zlib_bound(level, bound):
    block = 65536
    nblocks = 8
    data = np.frombuffer(_corpus(nblocks * block), np.uint8).reshape(nblocks, block)
    cfg = DeflateEncodeConfig.for_level(block, "mgzip", "none", level)
    res = encode_deflate_blocks(
        cfg, jnp.asarray(data), jnp.full((nblocks,), block, jnp.int32),
        jnp.zeros((nblocks,), bool),
    )
    ours = int(np.asarray(res["out_len"]).sum())
    zl = sum(len(zlib.compress(data[i].tobytes(), level)) + 22 for i in range(nblocks))
    assert ours <= zl * bound, f"level {level}: ours {ours} vs zlib {zl} (x{ours/zl:.4f})"


def test_snappy_rle_near_format_optimal():
    """Matches longer than 64 must chain tag-10 copies (reference
    src/snap.rs:34-83 via the snap crate): on RLE-heavy data the frame
    should sit within ~5% of the analytic chained-copy optimum."""
    from gzp_tpu.ops.snappy_kernel import SnappyEncodeConfig, encode_snappy_blocks
    from gzp_tpu.utils.snappy_ref import decode_frames

    bs = 32768
    data = np.frombuffer((b"ab" * bs)[:bs], np.uint8).reshape(1, bs).copy()
    cfg = SnappyEncodeConfig(block_len=bs)
    res = encode_snappy_blocks(
        cfg, jnp.asarray(data), jnp.full((1,), bs, jnp.int32), jnp.zeros((1,), bool)
    )
    out = np.asarray(res["out"])[0]
    out_len = int(np.asarray(res["out_len"])[0])
    assert decode_frames(out[:out_len].tobytes()) == data.tobytes()
    # optimum: 18B frame header + 3B varint + 2B first literal (tag+run)
    # + ceil((bs-2)/64) three-byte copies
    optimal = 18 + 3 + 3 + 3 * -(-(bs - 2) // 64)
    assert out_len <= optimal * 1.05, (out_len, optimal)
