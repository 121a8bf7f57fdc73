"""Round-4 stage decomposition of the DEFAULT encoder (scan parse) on TPU.

VERDICT.md round-4 task 2: the committed decomposition profiles the
retired window parse; this reruns every stage against parse='scan' and
A/Bs the round-4 sortscan packer against the round-3 grouped packer.

Dispatch-proof method: REPS chained inside one jitted fori_loop with a
digest data dependency + scalar value fetch (on axon block_until_ready
returns at dispatch).

Usage: python scripts/profile_r4.py [B] [N]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:7.1f}s] {m}", flush=True)


from gzp_tpu.utils.testing import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import make_corpus  # noqa: E402
from gzp_tpu.constants import MAX_DIST, MAX_MATCH, MIN_MATCH  # noqa: E402
from gzp_tpu.ops import huffman, lz  # noqa: E402
from gzp_tpu.ops.checksum import crc32_device  # noqa: E402
from gzp_tpu.ops.deflate_kernel import (  # noqa: E402
    DeflateEncodeConfig,
    compact_outputs,
    compute_symbols,
    emit_entries,
    encode_deflate_blocks,
    pack_entries_grouped,
    pack_entries_sortscan,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
REPS = 4
LEVEL = 3

cfg = DeflateEncodeConfig.for_level(N, "mgzip", "none", LEVEL)
cfg_ss = dataclasses.replace(cfg, pack="sortscan")
data = np.frombuffer(make_corpus(B * N), np.uint8).reshape(B, N)
lengths = np.full((B,), N, np.int32)
finals = np.zeros((B,), bool)

log(f"backend up: {jax.devices()}  B={B} N={N} level={LEVEL} parse={cfg.parse}")


def timeit(name, fn, *args):
    try:
        f = jax.jit(fn)
        t0 = time.time()
        int(f(*args))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            int(f(*args))
            best = min(best, (time.time() - t0) / REPS)
        gbps = B * N / best / 1e9
        log(
            f"{name:26s} compile {compile_s:6.1f}s  per-iter {best * 1e3:8.2f} ms"
            f"  {best / (B * N) * 1e9:6.2f} ns/B  -> {gbps:7.4f} GB/s"
        )
    except Exception as e:  # noqa: BLE001
        log(f"{name:26s} FAILED: {e!r:.200}")


def digest32(x):
    v = x.astype(jnp.uint32)
    return jnp.sum(v ^ (v >> 7), dtype=jnp.uint32)


def chain(body):
    def run(d):
        def it(_, carry):
            salt, dd = carry
            dd = dd.at[0, 0].set((dd[0, 0].astype(jnp.uint32) ^ (salt & 1)).astype(jnp.uint8))
            return digest32(body(dd)) ^ salt, dd

        salt, _ = jax.lax.fori_loop(0, REPS, it, (jnp.uint32(0), d))
        return salt

    return run


def _matches(d):
    return lz.best_matches(
        d, jnp.asarray(lengths), max_dist=MAX_DIST, max_match=MAX_MATCH,
        min_emit=MIN_MATCH, lazy=cfg.lazy,
        payload_words=cfg.payload_words, lags=cfg.lags, hash3=cfg.hash3,
    )


def s_match(d):
    ml, md = _matches(d)
    return ml + md


def s_parse(d):
    ml, _ = _matches(d)
    marked, l = lz.parse_marks_scan(ml, jnp.asarray(lengths), min_emit=MIN_MATCH)
    return marked.astype(jnp.int32) + l


def s_emit(d):
    """match + parse + symbols + huffman tables + entry emission
    (everything except pack/frame/crc)."""
    ml, md = _matches(d)
    marked, l = lz.parse_marks_scan(ml, jnp.asarray(lengths), min_emit=MIN_MATCH)
    sym, leb, lextra, dsym, deb, dextra, is_match = compute_symbols(d, marked, l, md)
    lit_freq, dist_freq = huffman.position_histograms(sym, dsym, marked, is_match)
    lit_codes, lit_lens, dist_codes, dist_lens, use_dyn, dlit, ddist = (
        huffman.choose_tables(lit_freq, dist_freq)
    )
    bits, nbits = emit_entries(
        marked, is_match, sym, leb, lextra, dsym, deb, dextra,
        lit_codes, lit_lens, dist_codes, dist_lens,
    )
    return bits[:, ::64].astype(jnp.int32) + nbits[:, ::64]


def s_crc(d):
    return crc32_device(d, jnp.asarray(lengths))


def synth_entries(d):
    v = d.astype(jnp.uint32)
    nb = (v & 7).astype(jnp.int32)
    bits = v & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)
    return bits, nb


def s_pack_grouped(d):
    bits, nb = synth_entries(d)
    words, total = pack_entries_grouped(bits, nb, 160, cfg.out_words)
    return words[:, 0].astype(jnp.int32) + total


def s_pack_sortscan(d):
    bits, nb = synth_entries(d)
    words, total = pack_entries_sortscan(bits, nb, 160, cfg.out_words)
    return words[:, 0].astype(jnp.int32) + total


def s_full_grouped(d):
    res = encode_deflate_blocks(cfg, d, jnp.asarray(lengths), jnp.asarray(finals))
    return res["out_len"] + res["check"].astype(jnp.int32)


def s_full_sortscan(d):
    res = encode_deflate_blocks(cfg_ss, d, jnp.asarray(lengths), jnp.asarray(finals))
    return res["out_len"] + res["check"].astype(jnp.int32)


def s_full_ss_compact(d):
    res = encode_deflate_blocks(cfg_ss, d, jnp.asarray(lengths), jnp.asarray(finals))
    flat = compact_outputs(res["out"], res["out_len"])
    return flat[::4096].astype(jnp.int32).sum() + res["out_len"].sum()


dd = jax.device_put(data)
jax.block_until_ready(dd)

timeit("match(best_matches)", chain(s_match), dd)
timeit("match+parse_scan", chain(s_parse), dd)
timeit("match+parse+emit", chain(s_emit), dd)
timeit("crc32_device", chain(s_crc), dd)
timeit("pack_grouped(synth)", chain(s_pack_grouped), dd)
timeit("pack_sortscan(synth)", chain(s_pack_sortscan), dd)
timeit("FULL encode group8", chain(s_full_grouped), dd)
timeit("FULL encode sortscan", chain(s_full_sortscan), dd)
timeit("FULL sortscan+compact", chain(s_full_ss_compact), dd)
log("done")
