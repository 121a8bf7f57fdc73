"""Incremental stage profiler: times one pipeline stage per named step,
appending results to scripts/profile_stages.log as they complete (remote
compiles take minutes each; the log survives timeouts)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gzp_tpu.ops import lz  # noqa: E402
from gzp_tpu.ops.checksum import crc32_device  # noqa: E402
from gzp_tpu.ops.deflate_kernel import (  # noqa: E402
    DeflateEncodeConfig,
    emit_tokens,
    encode_deflate_blocks,
)
from gzp_tpu.ops import huffman  # noqa: E402
from gzp_tpu.utils.testing import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

LOG = "/root/repo/scripts/profile_stages.log"


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")
    print(msg, flush=True)


def timeit(label, fn, *args, reps=5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    log(f"{label:32s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s)")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    log(f"=== run B={B} N={N} ({B*N/1e6:.1f} MB/batch) ===")

    rng = np.random.default_rng(0)
    words = [b"the quick brown fox ", b"jumps over the lazy dog "]
    blob = b"".join(words[rng.integers(0, 2)] for _ in range(B * N // 20 + 2))[: B * N]
    data = np.frombuffer(blob, np.uint8).reshape(B, N).copy()
    dd = jax.device_put(data)
    dl = jax.device_put(np.full(B, N, np.int32))
    df = jax.device_put(np.zeros(B, bool))
    jax.block_until_ready(dd)

    hb = 32 - lz._pos_bits(N)
    pb = lz._pos_bits(N)

    timeit("sort(keys)", jax.jit(lambda d: jnp.sort(
        (lz.hash_positions(lz.words4(d), hb) << np.uint32(pb))
        | jnp.arange(N, dtype=jnp.uint32)[None, :], axis=1)), dd)

    timeit("prev_occurrences", jax.jit(lambda d: lz.prev_occurrences(lz.words4(d))), dd)

    bm = jax.jit(lambda d, l: lz.best_matches(
        d, l, max_dist=32768, max_match=258, min_emit=3, max_words=8, lazy=True))
    timeit("best_matches", bm, dd, dl)

    ml, mdist = jax.block_until_ready(bm(dd, dl))
    pt = jax.jit(lambda a, b, c: lz.parse_tokens(a, b, c, window=256, min_emit=3))
    timeit("parse_tokens", pt, ml, mdist, dl)

    tok_pos, tok_len, tok_dist, ntok = jax.block_until_ready(pt(ml, mdist, dl))

    hist = jax.jit(huffman.token_histograms)
    timeit("token_histograms", hist, dd, tok_pos, tok_len, ntok, tok_dist)
    lf, dfq = jax.block_until_ready(hist(dd, tok_pos, tok_len, ntok, tok_dist))

    ct = jax.jit(huffman.choose_tables)
    timeit("choose_tables(pkg-merge)", ct, lf, dfq)
    lc, ll, dc, dlens, used, dll, ddl = jax.block_until_ready(ct(lf, dfq))

    em = jax.jit(emit_tokens)
    timeit("emit_tokens", em, dd, tok_pos, tok_len, tok_dist, ntok, lc, ll, dc, dlens)

    timeit("crc32_device", jax.jit(crc32_device), dd, dl)

    cfg = DeflateEncodeConfig(block_len=N, mode="mgzip", checksum="none")
    full = jax.jit(lambda d, l, f: encode_deflate_blocks(cfg, d, l, f))
    dt = timeit("FULL encode", full, dd, dl, df)
    log(f"  -> device-only throughput: {B*N/dt/1e9:.3f} GB/s")


if __name__ == "__main__":
    main()
