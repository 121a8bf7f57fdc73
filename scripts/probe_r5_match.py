"""Round-5 match-stage attack probes (VERDICT r4 task 1) + snappy rung.

A/Bs on real TPU hardware, dispatch-proof chained-fori timing:
  * match stage: baseline vs sample_step=2/4 vs payload_words=2
    (the two sorts dominate the stage at 6.4 of 14.0 ns/B, B=32 —
    scripts/profile_r4_b32.log; sampling shrinks BOTH sorts by S)
  * full monolith encode with the winning match config
  * snappy full encoder (scan parse port), first hardware number ever

Usage: python scripts/probe_r5_match.py [B] [N] [stages...]
Stages default to all; pass names to run a subset, e.g.
  python scripts/probe_r5_match.py 32 131072 match_ss2 full_ss2 snappy
"""

import os
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
from gzp_tpu.ops import lz  # noqa: E402
from gzp_tpu.ops.deflate_kernel import (  # noqa: E402
    DeflateEncodeConfig,
    encode_deflate_blocks,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
ONLY = set(sys.argv[3:])
REPS = int(os.environ.get("GZP_PROBE_REPS", "8"))
LEVEL = int(os.environ.get("GZP_PROBE_LEVEL", "3"))

cfg0 = DeflateEncodeConfig.for_level(N, "mgzip", "none", LEVEL)
data = np.frombuffer(make_corpus(B * N), np.uint8).reshape(B, N)
lengths = np.full((B,), N, np.int32)
finals = np.zeros((B,), bool)
dd = jax.device_put(data)
dl = jax.device_put(jnp.asarray(lengths))
df = jax.device_put(jnp.asarray(finals))
jax.block_until_ready(dd)

log(f"backend up: {jax.devices()}  B={B} N={N} level={LEVEL}")


def digest32(x):
    v = x.astype(jnp.uint32)
    return jnp.sum(v ^ (v >> 7), dtype=jnp.uint32)


def timeit(name, body):
    if ONLY and name not in ONLY:
        return
    try:
        def run(d):
            def it(_, carry):
                salt, x = carry
                x = x.at[0, 0].set(
                    (x[0, 0].astype(jnp.uint32) ^ (salt & 1)).astype(jnp.uint8)
                )
                return digest32(body(x)) ^ salt, x

            salt, _ = jax.lax.fori_loop(0, REPS, it, (jnp.uint32(0), d))
            return salt

        f = jax.jit(run)
        t0 = time.time()
        int(f(dd))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            int(f(dd))
            best = min(best, (time.time() - t0) / REPS)
        gbps = B * N / best / 1e9
        log(
            f"{name:26s} compile {compile_s:6.1f}s  per-iter {best * 1e3:8.2f} ms"
            f"  {best / (B * N) * 1e9:6.2f} ns/B  -> {gbps:7.4f} GB/s"
        )
    except Exception as e:  # noqa: BLE001
        log(f"{name:26s} FAILED: {e!r:.200}")


def match_body(step, pw, lags=None):
    def body(d):
        ml, md = lz.best_matches(
            d, dl, max_dist=MAX_DIST, max_match=MAX_MATCH, min_emit=MIN_MATCH,
            lazy=cfg0.lazy, payload_words=pw, lags=lags or cfg0.lags,
            hash3=cfg0.hash3, sample_step=step,
        )
        return ml + md

    return body


def full_body(step, pw, lags=None):
    cfg = dataclasses.replace(
        cfg0, sample_step=step, payload_words=pw, lags=lags or cfg0.lags
    )

    def body(d):
        res = encode_deflate_blocks(cfg, d, dl, df)
        return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

    return body


def validate_full(name, step, pw):
    """One uncahined encode: gzip-decode sampled members + size check."""
    if ONLY and name not in ONLY:
        return
    import gzip as _gzip
    import zlib as _zlib

    cfg = dataclasses.replace(cfg0, sample_step=step, payload_words=pw)
    res = jax.jit(lambda d: encode_deflate_blocks(cfg, d, dl, df))(dd)
    out = np.asarray(res["out"])
    ol = np.asarray(res["out_len"])
    bad = 0
    for i in range(0, B, max(B // 8, 1)):
        m = out[i, : ol[i]].tobytes()
        try:
            ok = _gzip.decompress(m) == data[i].tobytes()
        except Exception:
            ok = False
        bad += not ok
    tot = int(ol.sum())
    zl3 = sum(len(_zlib.compress(data[i].tobytes(), 3)) for i in range(B))
    log(f"{name:26s} size_vs_zlib3 {tot / zl3:.4f}  bad_members {bad}")


timeit("match_base", match_body(1, cfg0.payload_words))
timeit("match_ss2", match_body(2, cfg0.payload_words))
timeit("match_ss2_pw2", match_body(2, 2))
timeit("match_ss4", match_body(4, cfg0.payload_words))
timeit("full_base", full_body(1, cfg0.payload_words))
timeit("full_ss2", full_body(2, cfg0.payload_words))
validate_full("validate_ss2", 2, cfg0.payload_words)
# ratio frontier from the round-5 CPU sweep: pw=2 lags=4 measured
# x1.0163 vs zlib-3 (baseline x1.0124) with a 3-operand candidate sort
timeit("match_pw2_lags4", match_body(1, 2, lags=4))
timeit("full_pw2_lags4", full_body(1, 2, lags=4))
timeit("match_pw2_lags3", match_body(1, 2, lags=3))

# ---- suffix Pallas matcher (levels >= 6), timed standalone ----
if not ONLY or "match_suffix" in ONLY:
    from gzp_tpu.ops.lz_pallas import best_matches_suffix_pallas

    def match_suffix_body():
        def body(d):
            ml, md = best_matches_suffix_pallas(
                d, dl, max_dist=MAX_DIST, max_match=MAX_MATCH,
                min_emit=MIN_MATCH, lazy=cfg0.lazy,
                payload_words=cfg0.payload_words, lags=cfg0.lags,
                suffix_keys=cfg0.suffix_keys,
            )
            return ml + md

        return body

    timeit("match_suffix", match_suffix_body())

# ---- Pallas matcher: sorts in XLA, op soup fused (round 5) ----
if not ONLY or {"match_pallas", "full_pallas", "full_pp", "full_pp_pw2",
                "pp_parse", "pp_emit", "full_pp_i8"} & ONLY:
    from gzp_tpu.ops.lz_pallas import best_matches_pallas

    def match_pallas_body(pw, lags):
        def body(d):
            ml, md = best_matches_pallas(
                d, dl, max_dist=MAX_DIST, max_match=MAX_MATCH,
                min_emit=MIN_MATCH, lazy=cfg0.lazy, payload_words=pw,
                lags=lags,
            )
            return ml + md

        return body

    timeit("match_pallas", match_pallas_body(cfg0.payload_words, cfg0.lags))

    def full_pallas_body():
        cfg = dataclasses.replace(cfg0, pallas_match=True)

        def body(d):
            res = encode_deflate_blocks(cfg, d, dl, df)
            return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

        return body

    timeit("full_pallas", full_pallas_body())

    def full_pp_body():
        cfg = dataclasses.replace(
            cfg0, pallas_match=True, pack="sortscan_pallas"
        )

        def body(d):
            res = encode_deflate_blocks(cfg, d, dl, df)
            return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

        return body

    timeit("full_pp", full_pp_body())

    def full_pp_pw2_body():
        cfg = dataclasses.replace(
            cfg0, pallas_match=True, pack="sortscan_pallas",
            payload_words=2, lags=4,
        )

        def body(d):
            res = encode_deflate_blocks(cfg, d, dl, df)
            return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

        return body

    if not ONLY or "full_pp_pw2" in ONLY:
        timeit("full_pp_pw2", full_pp_pw2_body())

    # cumulative stage decomposition under the production Pallas config
    # (round-6 handoff: where do the remaining ns/B live?)
    def pp_parse_body():
        cfg = dataclasses.replace(cfg0, pallas_match=True)

        def body(d):
            from gzp_tpu.ops.deflate_kernel import match_stage, parse_stage

            _, ml, md = match_stage(cfg, d, dl)
            marked, ll = parse_stage(cfg, ml, dl)
            return digest32(marked.astype(jnp.int32) + ll) ^ digest32(md)

        return body

    def pp_emit_body():
        cfg = dataclasses.replace(cfg0, pallas_match=True)

        def body(d):
            from gzp_tpu.ops.deflate_kernel import (
                compute_symbols,
                emit_entries,
                match_stage,
                parse_stage,
            )
            from gzp_tpu.ops import huffman

            ext, ml, md = match_stage(cfg, d, dl)
            marked, ll = parse_stage(cfg, ml, dl)
            sym, leb, lextra, dsym, deb, dextra, is_match = compute_symbols(
                ext, marked, ll, md
            )
            lit_freq, dist_freq = huffman.position_histograms(
                sym, dsym, marked, is_match
            )
            lit_codes, lit_lens, dist_codes, dist_lens, use_dyn, dlit, ddist = (
                huffman.choose_tables(lit_freq, dist_freq)
            )
            bits, nbits = emit_entries(
                marked, is_match, sym, leb, lextra, dsym, deb, dextra,
                lit_codes, lit_lens, dist_codes, dist_lens,
            )
            return digest32(bits[:, ::64]) ^ digest32(nbits[:, ::64])

        return body

    if not ONLY or "pp_parse" in ONLY:
        timeit("pp_parse", pp_parse_body())
    if not ONLY or "pp_emit" in ONLY:
        timeit("pp_emit", pp_emit_body())

    def full_pp_i8_body():
        cfg = dataclasses.replace(
            cfg0, pallas_match=True, pack="sortscan_pallas", lookup="int8"
        )

        def body(d):
            res = encode_deflate_blocks(cfg, d, dl, df)
            return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

        return body

    if not ONLY or "full_pp_i8" in ONLY:
        timeit("full_pp_i8", full_pp_i8_body())
        # validate: int8-lookup members must gzip-decode
        try:
            import gzip as _gzip

            cfg = dataclasses.replace(
                cfg0, pallas_match=True, pack="sortscan_pallas", lookup="int8"
            )
            res = jax.jit(lambda d: encode_deflate_blocks(cfg, d, dl, df))(dd)
            out = np.asarray(res["out"])
            ol = np.asarray(res["out_len"])
            bad = 0
            for i in range(0, B, max(B // 8, 1)):
                try:
                    ok = _gzip.decompress(out[i, : ol[i]].tobytes()) == data[i].tobytes()
                except Exception:
                    ok = False
                bad += not ok
            log(f"validate_i8                bad_members {bad}")
        except Exception as e:  # noqa: BLE001
            log(f"validate_i8 FAILED: {e!r:.200}")

    def validate_pp():
        import gzip as _gzip

        cfg = dataclasses.replace(
            cfg0, pallas_match=True, pack="sortscan_pallas"
        )
        res = jax.jit(lambda d: encode_deflate_blocks(cfg, d, dl, df))(dd)
        out = np.asarray(res["out"])
        ol = np.asarray(res["out_len"])
        bad = 0
        for i in range(0, B, max(B // 8, 1)):
            m = out[i, : ol[i]].tobytes()
            try:
                ok = _gzip.decompress(m) == data[i].tobytes()
            except Exception:
                ok = False
            bad += not ok
        log(f"validate_pp                bad_members {bad}")

    if not ONLY or "full_pp" in ONLY:
        try:
            validate_pp()
        except Exception as e:  # noqa: BLE001
            log(f"validate_pp FAILED: {e!r:.200}")
    if not ONLY or "match_pallas" in ONLY:
        try:
            # equivalence: run raw functions once each
            f_x = jax.jit(lambda d: lz.best_matches(
                d, dl, max_dist=MAX_DIST, max_match=MAX_MATCH,
                min_emit=MIN_MATCH, lazy=cfg0.lazy,
                payload_words=cfg0.payload_words, lags=cfg0.lags))
            f_p = jax.jit(lambda d: best_matches_pallas(
                d, dl, max_dist=MAX_DIST, max_match=MAX_MATCH,
                min_emit=MIN_MATCH, lazy=cfg0.lazy,
                payload_words=cfg0.payload_words, lags=cfg0.lags))
            a1, b1 = f_x(dd)
            a2, b2 = f_p(dd)
            same = bool(jnp.array_equal(a1, a2)) and bool(
                jnp.array_equal(jnp.where(a1 > 0, b1, 0), jnp.where(a2 > 0, b2, 0))
            )
            log(f"match pallas equivalence on device: {'OK' if same else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001
            log(f"match pallas equivalence FAILED: {e!r:.300}")

# ---- Pallas prescan A/B: the fused pre-sort pack pipeline ----
if not ONLY or {"pack_xla", "pack_pallas"} & ONLY:
    from gzp_tpu.ops.deflate_kernel import pack_entries_sortscan
    from gzp_tpu.ops.pack_pallas import pack_entries_sortscan_pallas

    rngp = np.random.default_rng(3)
    E = N  # one entry per position, like the real emit stage
    nbp = rngp.integers(0, 10, (B, E)).astype(np.int32)
    nbp[rngp.random((B, E)) < 0.4] = 0
    bitsp = (rngp.integers(0, 1 << 9, (B, E)).astype(np.uint32)
             & ((1 << np.maximum(nbp, 1)) - 1).astype(np.uint32))
    OW = int(nbp.sum(1).max() + 160 + 31) // 32 + 10
    bits_d = jax.device_put(jnp.asarray(bitsp))
    nb_d = jax.device_put(jnp.asarray(nbp))
    jax.block_until_ready(bits_d)

    def pack_probe(name, fn):
        if ONLY and name not in ONLY:
            return
        try:
            def run(bv):
                def it(_, carry):
                    salt, x = carry
                    x = x.at[0, 0].set(x[0, 0] ^ (salt & 1))
                    w, t = fn(x, nb_d)
                    return digest32(w) ^ t.astype(jnp.uint32)[0] ^ salt, x

                salt, _ = jax.lax.fori_loop(0, REPS, it, (jnp.uint32(0), bv))
                return salt

            f = jax.jit(run)
            t0 = time.time()
            int(f(bits_d))
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                int(f(bits_d))
                best = min(best, (time.time() - t0) / REPS)
            log(
                f"{name:26s} compile {compile_s:6.1f}s  per-iter {best * 1e3:8.2f} ms"
                f"  {best / (B * N) * 1e9:6.2f} ns/B  -> {B * N / best / 1e9:7.4f} GB/s"
            )
        except Exception as e:  # noqa: BLE001
            log(f"{name:26s} FAILED: {e!r:.300}")

    pack_probe("pack_xla", lambda b_, n_: pack_entries_sortscan(b_, n_, 160, OW))
    pack_probe(
        "pack_pallas",
        lambda b_, n_: pack_entries_sortscan_pallas(b_, n_, 160, OW),
    )
    # equivalence on-device
    if not ONLY or "pack_pallas" in ONLY:
        try:
            w1, t1 = jax.jit(
                lambda b_, n_: pack_entries_sortscan(b_, n_, 160, OW)
            )(bits_d, nb_d)
            w2, t2 = jax.jit(
                lambda b_, n_: pack_entries_sortscan_pallas(b_, n_, 160, OW)
            )(bits_d, nb_d)
            same = bool(jnp.array_equal(w1, w2)) and bool(jnp.array_equal(t1, t2))
            log(f"pack equivalence on device: {'OK' if same else 'MISMATCH'}")
        except Exception as e:  # noqa: BLE001
            log(f"pack equivalence FAILED: {e!r:.300}")

# ---- snappy (scan-parse port): first-ever hardware number ----
if not ONLY or "snappy" in ONLY:
    from gzp_tpu.ops.snappy_kernel import SnappyEncodeConfig, encode_snappy_blocks

    SB, SN = 4 * B, 65536  # same total bytes per dispatch
    sdata = np.frombuffer(make_corpus(SB * SN), np.uint8).reshape(SB, SN)
    slen = jnp.asarray(np.full((SB,), SN, np.int32))
    sfin = jnp.asarray(np.zeros((SB,), bool))
    sdd = jax.device_put(sdata)
    jax.block_until_ready(sdd)

    for nm, scfg in (
        ("snappy_scan", SnappyEncodeConfig(SN)),
        ("snappy_scan_ss2", SnappyEncodeConfig(SN, sample_step=2)),
    ):
        if ONLY and nm not in ONLY and "snappy" not in ONLY:
            continue
        try:
            def body(d, scfg=scfg):
                res = encode_snappy_blocks(scfg, d, slen, sfin)
                return jnp.sum(res["out_len"]).astype(jnp.uint32) ^ res["check"][0]

            def run(d, body=body):
                def it(_, carry):
                    salt, x = carry
                    x = x.at[0, 0].set(
                        (x[0, 0].astype(jnp.uint32) ^ (salt & 1)).astype(jnp.uint8)
                    )
                    return body(x) ^ salt, x

                salt, _ = jax.lax.fori_loop(0, REPS, it, (jnp.uint32(0), d))
                return salt

            f = jax.jit(run)
            t0 = time.time()
            int(f(sdd))
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                int(f(sdd))
                best = min(best, (time.time() - t0) / REPS)
            gbps = SB * SN / best / 1e9
            log(
                f"{nm:26s} compile {compile_s:6.1f}s  per-iter {best * 1e3:8.2f} ms"
                f"  {best / (SB * SN) * 1e9:6.2f} ns/B  -> {gbps:7.4f} GB/s"
            )
            # validate once via the host-side frame decoder oracle
            res = jax.jit(
                lambda d, scfg=scfg: encode_snappy_blocks(scfg, d, slen, sfin)
            )(sdd)
            out = np.asarray(res["out"])
            ol = np.asarray(res["out_len"])
            from gzp_tpu.utils.snappy_ref import decode_frames

            bad = 0
            for i in range(0, SB, max(SB // 8, 1)):
                frame = out[i, : ol[i]].tobytes()
                bad += decode_frames(frame) != sdata[i].tobytes()
            tot = int(ol.sum())
            log(f"{nm:26s} ratio {SB * SN / tot:.3f}  bad_frames {bad}")
        except Exception as e:  # noqa: BLE001
            log(f"{nm:26s} FAILED: {e!r:.200}")

# ---- sort batch-scaling: explain the B=64 encode ceiling (VERDICT
# r4 weak #1) — if the placement/candidate sorts stop improving past
# B=64, the whole "sorts improve with batch" law saturates there ----
if not ONLY or "sortscale" in ONLY:
    for SBATCH in (16, 32, 64, 128):
        try:
            rngs = np.random.default_rng(5)
            ks = jnp.asarray(
                rngs.integers(0, 1 << 32, (SBATCH, N), dtype=np.int64).astype(np.uint32)
            )
            vs = jnp.asarray(
                rngs.integers(0, 1 << 32, (SBATCH, N), dtype=np.int64).astype(np.uint32)
            )
            ks = jax.device_put(ks); vs = jax.device_put(vs)
            jax.block_until_ready(ks)

            def run(k, v):
                def it(_, carry):
                    salt, kk = carry
                    kk = kk.at[0, 0].set(kk[0, 0] ^ (salt & 1))
                    sk, sv = jax.lax.sort((kk, v), dimension=1, num_keys=1)
                    return digest32(sv) ^ sk[0, 0] ^ salt, kk

                salt, _ = jax.lax.fori_loop(0, REPS, it, (jnp.uint32(0), k))
                return salt

            f = jax.jit(run)
            t0 = time.time()
            int(f(ks, vs))
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                int(f(ks, vs))
                best = min(best, (time.time() - t0) / REPS)
            log(
                f"sort2op_B{SBATCH:<4d}             compile {compile_s:6.1f}s"
                f"  per-iter {best * 1e3:8.2f} ms"
                f"  {best / (SBATCH * N) * 1e9:6.3f} ns/elem"
            )
        except Exception as e:  # noqa: BLE001
            log(f"sort2op_B{SBATCH} FAILED: {e!r:.200}")

log("done")
