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


@pytest.mark.parametrize("level,bound", [(3, 1.06), (1, 1.03), (6, 1.20)])
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
