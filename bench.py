"""Benchmark harness: Mgzip encode throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Mirrors the reference's criterion sweep design (reference
benches/bench.rs:120-150: gzip/snappy over a ~550 MB shakespeare corpus);
the corpus file is absent from the mirror, so an equivalent-entropy text
corpus is synthesized deterministically. Baseline target: 5 GB/s/chip
Mgzip encode (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_GBPS = 5.0


def make_corpus(nbytes: int) -> bytes:
    """Deterministic shakespeare-like English text (word-level redundancy
    comparable to natural prose repeated across a large corpus)."""
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
    picks = rng.integers(0, len(words), size=nbytes // 5)
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


class NullWriter:
    def __init__(self):
        self.count = 0

    def write(self, b):
        self.count += len(b)
        return len(b)

    def flush(self):
        pass


def bench_mgzip_encode(corpus: bytes, *, num_threads: int, block_size: int, repeats: int = 3):
    from gzp_tpu import Mgzip, ZBuilder

    # warmup: trigger all compilations (full batch + tail batch shapes)
    w = ZBuilder(Mgzip).num_threads(num_threads).buffer_size(block_size).from_writer(NullWriter())
    w.write(corpus[: block_size * num_threads])
    w.write(corpus[: block_size * 2 + 17])
    w.finish()

    best = 0.0
    out_bytes = 0
    for _ in range(repeats):
        sink = NullWriter()
        w = ZBuilder(Mgzip).num_threads(num_threads).buffer_size(block_size).from_writer(sink)
        t0 = time.perf_counter()
        w.write(corpus)
        w.finish()
        dt = time.perf_counter() - t0
        best = max(best, len(corpus) / dt / 1e9)
        out_bytes = sink.count
    return best, out_bytes


def main() -> None:
    from gzp_tpu.utils.testing import enable_compilation_cache

    enable_compilation_cache()
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    num_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    block_size = 131072

    corpus = make_corpus(size_mb * 1024 * 1024)
    gbps, out_bytes = bench_mgzip_encode(
        corpus, num_threads=num_threads, block_size=block_size
    )
    ratio = len(corpus) / out_bytes
    result = {
        "metric": "mgzip_encode_throughput_per_chip",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / TARGET_GBPS, 4),
        "extra": {
            "corpus_mb": size_mb,
            "batch_blocks": num_threads,
            "block_size": block_size,
            "compression_ratio": round(ratio, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
