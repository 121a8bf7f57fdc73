"""Round-2 honest device profiling of the batched DEFLATE encoder.

Methodology (fixes round 1's discredited async-dispatch numbers, see
scripts/profile_stages.log annotation): every measurement chains R
iterations of the op INSIDE one jitted fori_loop, with a data dependence
(one byte of the input XORed with a scalar derived from the previous
iteration's output) so XLA cannot parallelize or elide iterations, then
fetches one scalar. Per-iteration time = (walltime - dispatch) / R: pure
device compute, no per-call dispatch overhead, no tunnel RTT.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


from gzp_tpu.utils.testing import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gzp_tpu.ops import lz
from gzp_tpu.ops.checksum import crc32_device
from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks

jax.devices()
log("backend up")

N = 131072
R = 16


def corpus(b, n):
    rng = np.random.default_rng(0)
    words = [b"the quick brown fox ", b"jumps over the lazy dog ", b"lorem ipsum "]
    blob = b"".join(words[rng.integers(0, 3)] for _ in range(b * n // 12 + 2))[: b * n]
    return np.frombuffer(blob, np.uint8).reshape(b, n).copy()


def chain_time(name, make_step, b, n, nbytes=None):
    """make_step(data_u8, salt_u32) -> uint32 scalar-ish array; chained R times."""
    nbytes = nbytes or b * n
    data = jax.device_put(corpus(b, n))

    @jax.jit
    def run(d):
        def body(_, carry):
            salt, dd = carry
            dd = dd.at[0, 0].set((dd[0, 0].astype(jnp.uint32) ^ (salt & 1)).astype(jnp.uint8))
            out = make_step(dd)
            return out.astype(jnp.uint32).reshape(-1)[0], dd

        salt, _ = jax.lax.fori_loop(0, R, body, (jnp.uint32(0), d))
        return salt

    t0 = time.perf_counter()
    s = int(run(data))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = int(run(data))
    dt = (time.perf_counter() - t0) / R
    log(
        f"{name:44s} B={b:3d} compile+first {tc:6.1f}s  per-iter {dt*1e3:8.2f} ms"
        f"  -> {nbytes/dt/1e9:7.3f} GB/s"
    )


stages = sys.argv[1:] or ["sort", "bm", "crc", "full1", "full3"]

for B in (16, 64):
    lengths = jnp.full((B,), N, jnp.int32)
    finals = jnp.zeros((B,), bool)

    if "sort" in stages:

        def just_sort(dd):
            w4 = lz.words4(dd)
            c1, c2 = lz.prev_occurrences(w4)
            return jnp.sum(c1 + c2).astype(jnp.uint32)

        chain_time("prev_occurrences (sort)", just_sort, B, N)

    if "bm" in stages:

        def bm(dd, lengths=lengths):
            ml, md = lz.best_matches(
                dd, lengths, max_dist=32768, max_match=258, min_emit=3,
                max_words=8, lazy=True,
            )
            return jnp.sum(ml).astype(jnp.uint32)

        chain_time("best_matches (sort+lcp+runs)", bm, B, N)

    if "crc" in stages:

        def crc(dd, lengths=lengths):
            return crc32_device(dd, lengths)[0]

        chain_time("crc32_device", crc, B, N)

    if "full1" in stages:
        cfg1 = DeflateEncodeConfig.for_level(N, "mgzip", "none", 1)

        def full_enc1(dd, cfg=cfg1, lengths=lengths, finals=finals):
            res = encode_deflate_blocks(cfg, dd, lengths, finals)
            return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

        chain_time("FULL encode mgzip level1 (fixed huff)", full_enc1, B, N)

    if "full3" in stages:
        cfg = DeflateEncodeConfig.for_level(N, "mgzip", "none", 3)

        def full_enc(dd, cfg=cfg, lengths=lengths, finals=finals):
            res = encode_deflate_blocks(cfg, dd, lengths, finals)
            return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

        chain_time("FULL encode mgzip level3", full_enc, B, N)

log("done")
