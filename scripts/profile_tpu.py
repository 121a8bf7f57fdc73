"""Stage-by-stage TPU profiling of the encode pipeline."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gzp_tpu.ops import lz
from gzp_tpu.ops.checksum import crc32_device
from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks


def timeit(label, fn, *args, reps=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:30s} {dt*1e3:9.2f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    print(f"devices: {jax.devices()}  B={B} N={N}  ({B*N/1e6:.1f} MB/batch)")

    rng = np.random.default_rng(0)
    words = [b"the quick brown fox ", b"jumps over the lazy dog "]
    blob = b"".join(words[rng.integers(0, 2)] for _ in range(B * N // 20 + 2))[: B * N]
    data = np.frombuffer(blob, np.uint8).reshape(B, N).copy()
    lengths = np.full(B, N, np.int32)
    finals = np.zeros(B, bool)

    # 1. host->device transfer
    t0 = time.perf_counter()
    dd = jax.device_put(data)
    jax.block_until_ready(dd)
    print(f"{'h2d transfer (cold)':30s} {(time.perf_counter()-t0)*1e3:9.2f} ms")
    t0 = time.perf_counter()
    for _ in range(5):
        dd = jax.device_put(data)
    jax.block_until_ready(dd)
    dt = (time.perf_counter() - t0) / 5
    print(f"{'h2d transfer':30s} {dt*1e3:9.2f} ms  ({B*N/dt/1e9:.2f} GB/s)")
    dl = jax.device_put(lengths)
    df = jax.device_put(finals)

    # 3. stages
    hb = 32 - lz._pos_bits(N)
    timeit("words4+hash", jax.jit(lambda d: lz.hash_positions(lz.words4(d), hb)), dd)
    timeit("sort(keys)", jax.jit(lambda d: jnp.sort((lz.hash_positions(lz.words4(d), hb) << np.uint32(lz._pos_bits(N))) | jnp.arange(N, dtype=jnp.uint32)[None, :], axis=1)), dd)
    timeit("prev_occurrences", jax.jit(lz.prev_occurrences), jax.jit(lz.words4)(dd))
    timeit("run_lengths", jax.jit(lz.run_lengths), dd)

    bm = jax.jit(lambda d, l: lz.best_matches(d, l, max_dist=32768, max_match=258, min_emit=3, max_words=8))
    timeit("best_matches (all)", bm, dd, dl)
    ml, mdist = bm(dd, dl)
    timeit("parse_tokens", jax.jit(lambda a, b, c: lz.parse_tokens(a, b, c, window=256, min_emit=3)), ml, mdist, dl)
    timeit("crc32_device", jax.jit(crc32_device), dd)

    cfg = DeflateEncodeConfig(block_len=N, mode="mgzip", checksum="none")
    full = jax.jit(lambda d, l, f: encode_deflate_blocks(cfg, d, l, f))
    dt = timeit("FULL encode (device only)", full, dd, dl, df)
    print(f"  -> device-only throughput: {B*N/dt/1e9:.3f} GB/s")


if __name__ == "__main__":
    main()
