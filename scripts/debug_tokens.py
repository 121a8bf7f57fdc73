"""Token-level invariant check for the LZ stage (debug tool).

For a given corpus/block-size, runs best_matches + parse_marks on CPU and
verifies for every emitted token: dist <= pos, l <= remaining, and
content equality data[i-d : i-d+l] == data[i : i+l]. Prints the first few
violations with context.
"""

import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import jax

from gzp_tpu.constants import MAX_DIST, MAX_MATCH, MIN_MATCH
from gzp_tpu.ops import lz
from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig


def check(data: np.ndarray, level: int = 3) -> int:
    b, n = data.shape
    cfg = DeflateEncodeConfig.for_level(n, "mgzip", "none", level)
    lengths = np.full((b,), n, np.int32)

    @jax.jit
    def run(d, ln):
        match_len, match_dist = lz.best_matches(
            d, ln, max_dist=MAX_DIST, max_match=MAX_MATCH, min_emit=MIN_MATCH,
            base=0, halo_start=None, lazy=cfg.lazy,
            payload_words=cfg.payload_words, lags=cfg.lags,
        )
        marked, l = lz.parse_marks(
            match_len, ln, window=cfg.window, min_emit=MIN_MATCH, base=0
        )
        return match_len, match_dist, marked, l

    match_len, match_dist, marked, l = map(np.asarray, run(data, lengths))
    bad = 0
    for bi in range(b):
        for i in np.nonzero(marked[bi])[0]:
            li = int(l[bi, i])
            if li == 0:
                continue  # literal
            di = int(match_dist[bi, i])
            src = data[bi, i - di : i - di + li].tobytes() if di <= i else None
            dst = data[bi, i : i + li].tobytes()
            if di > i or di < 1 or src != dst:
                bad += 1
                if bad <= 8:
                    ml = int(match_len[bi, i])
                    print(
                        f"  block {bi} pos {i}: l={li} d={di} match_len={ml} "
                        f"(dist>pos={di > i}) src={src!r:.40} dst={dst!r:.40}"
                    )
    return bad


if __name__ == "__main__":
    from bench import make_corpus

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    which = sys.argv[3] if len(sys.argv) > 3 else "corpus"
    if which == "corpus":
        blob = make_corpus(batch * bs)
        data = np.frombuffer(blob, np.uint8).reshape(batch, bs)
    elif which == "random":
        data = np.random.default_rng(0).integers(0, 256, (batch, bs)).astype(np.uint8)
    else:
        raise SystemExit(f"unknown corpus {which}")
    nbad = check(data)
    print(f"bad tokens: {nbad}")
