"""Per-stage compile-time + runtime profile of the v2 encoder on TPU.

Finds which stage dominates whole-program compile time (bench.py's chain
timed out at >1700 s compile) and measures honest per-stage runtime with
the chained-fori_loop method.
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

from gzp_tpu.ops import huffman, lz
from gzp_tpu.ops.checksum import crc32_device
from gzp_tpu.ops.deflate_kernel import (
    DeflateEncodeConfig,
    compute_symbols,
    encode_deflate_blocks,
)

jax.devices()
log("backend up")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 131072
R = 8
stages = sys.argv[2:] or ["bm", "parse", "huff", "emit", "crc", "full"]


def corpus(b, n):
    rng = np.random.default_rng(0)
    words = [b"the quick brown fox ", b"jumps over the lazy dog ", b"lorem ipsum "]
    blob = b"".join(words[rng.integers(0, 3)] for _ in range(b * n // 12 + 2))[: b * n]
    return np.frombuffer(blob, np.uint8).reshape(b, n).copy()


data = jax.device_put(corpus(B, N))
lengths = jnp.full((B,), N, jnp.int32)
finals = jnp.zeros((B,), bool)
cfg = DeflateEncodeConfig.for_level(N, "mgzip", "none", 3)


def chain_time(name, step):
    @jax.jit
    def run(d):
        def body(_, carry):
            salt, dd = carry
            dd = dd.at[0, 0].set((dd[0, 0].astype(jnp.uint32) ^ (salt & 1)).astype(jnp.uint8))
            out = step(dd)
            return out.astype(jnp.uint32).reshape(-1)[0], dd

        salt, _ = jax.lax.fori_loop(0, R, body, (jnp.uint32(0), d))
        return salt

    t0 = time.perf_counter()
    int(run(data))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(run(data))
    dt = (time.perf_counter() - t0) / R
    log(
        f"{name:34s} B={B:3d} compile+first {tc:6.1f}s  per-iter {dt*1e3:8.2f} ms"
        f"  -> {B*N/dt/1e9:7.3f} GB/s"
    )


if "bm" in stages:

    def bm(dd):
        ml, md = lz.best_matches(
            dd, lengths, max_dist=32768, max_match=258, min_emit=3, lazy=True
        )
        return (jnp.sum(ml) + jnp.sum(md)).astype(jnp.uint32)

    chain_time("best_matches v2 (2 sorts)", bm)

if "parse" in stages:

    def parse(dd):
        ml = (dd[:, :].astype(jnp.int32) & 63) + 3  # synthetic lens
        marked, l = lz.parse_marks(ml, lengths, window=cfg.window, min_emit=3)
        return jnp.sum(marked.astype(jnp.int32)).astype(jnp.uint32)

    chain_time(f"parse_marks (win={cfg.window})", parse)

if "huff" in stages:

    def huff(dd):
        sym = (dd.astype(jnp.int32) * 7) % 286
        dsym = (dd.astype(jnp.int32) * 3) % 30
        m1 = dd > 30
        m2 = dd > 200
        lf, df_ = huffman.position_histograms(sym, dsym, m1, m2)
        out = huffman.choose_tables(lf, df_)
        return jnp.sum(out[1]).astype(jnp.uint32)

    chain_time("histograms + choose_tables", huff)

if "emit" in stages:
    from gzp_tpu.ops.deflate_kernel import _scatter_bits, emit_entries

    def emit(dd):
        marked = dd > 30
        l = jnp.where(dd > 200, (dd.astype(jnp.int32) & 63) + 3, 0)
        dist = (dd.astype(jnp.int32) * 97) % 32768 + 1
        sym, leb, lextra, dsym, deb, dextra, is_match = compute_symbols(
            dd, marked, l, dist
        )
        lc, ln_, dc, dn = huffman.fixed_table_arrays(B)
        bits, nbits = emit_entries(
            marked, is_match, sym, leb, lextra, dsym, deb, dextra,
            lc.astype(jnp.uint32), ln_, dc.astype(jnp.uint32), dn,
        )
        csum = jnp.cumsum(nbits, axis=1)
        off = csum - nbits
        words = jnp.zeros((B, cfg.out_words), jnp.uint32)
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        words = _scatter_bits(words, rows, off, bits, 31)
        return jnp.sum(words).astype(jnp.uint32)

    chain_time("symbols + emit + bit-scatter", emit)

if "crc" in stages:

    def crc(dd):
        return crc32_device(dd, lengths)[0]

    chain_time("crc32 (MXU bit-matmul)", crc)

if "full" in stages:

    def full(dd):
        res = encode_deflate_blocks(cfg, dd, lengths, finals)
        return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

    chain_time("FULL encode mgzip level3", full)

log("done")
