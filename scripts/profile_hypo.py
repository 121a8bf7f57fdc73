"""Scatter-hypothesis test: scalar-synced timing of cumulative pipeline
prefixes. Appends to scripts/profile_hypo.log as each program finishes."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gzp_tpu.ops import lz
from gzp_tpu.utils.testing import enable_compilation_cache

enable_compilation_cache()

LOG = "/root/repo/scripts/profile_hypo.log"


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")
    print(msg, flush=True)


def timeit(label, fn, *args, reps=3):
    t0 = time.perf_counter()
    int(fn(*args))  # compile + first (scalar fetch forces completion)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        r = int(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    log(f"{label:34s} {dt*1e3:9.1f} ms   (compile+first {c:.0f}s)")
    return dt


def main():
    B, N = 16, 131072
    rng = np.random.default_rng(0)
    words = [b"the quick brown fox ", b"jumps over the lazy dog "]
    blob = b"".join(words[rng.integers(0, 2)] for _ in range(B * N // 20 + 2))[: B * N]
    data = np.frombuffer(blob, np.uint8).reshape(B, N).copy()
    dd = jax.device_put(data)
    dl = jax.device_put(np.full(B, N, np.int32))
    log(f"=== hypo run B={B} N={N} ===")

    pb = lz._pos_bits(N)
    hb = 32 - pb

    @jax.jit
    def p_sort(d):
        key = (lz.hash_positions(lz.words4(d), hb) << np.uint32(pb)) | jnp.arange(
            N, dtype=jnp.uint32
        )[None, :]
        return jnp.sum(jnp.sort(key, axis=1) & jnp.uint32(0xFFFF))

    timeit("sort only", p_sort, dd)

    @jax.jit
    def p_prev(d):
        c1, c2 = lz.prev_occurrences(lz.words4(d))
        return jnp.sum(c1 & 0xFF) + jnp.sum(c2 & 0xFF)

    timeit("sort + inv-perm scatter", p_prev, dd)

    @jax.jit
    def p_bm(d, l):
        ml, md = lz.best_matches(
            d, l, max_dist=32768, max_match=258, min_emit=3, max_words=8, lazy=True
        )
        return jnp.sum(ml & 0xFF) + jnp.sum(md & 0xFF)

    timeit("best_matches (thru LCP)", p_bm, dd, dl)

    @jax.jit
    def p_parse(d, l):
        ml, md = lz.best_matches(
            d, l, max_dist=32768, max_match=258, min_emit=3, max_words=8, lazy=True
        )
        tp, tl, td, nt = lz.parse_tokens(ml, md, l, window=256, min_emit=3)
        return jnp.sum(tp & 0xFF) + jnp.sum(nt)

    timeit("+ parse_tokens", p_parse, dd, dl)


if __name__ == "__main__":
    main()
