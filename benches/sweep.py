#!/usr/bin/env python
"""Criterion-style benchmark sweep (reference benches/bench.rs:120-150):
gzip + snappy encode across parallelism degrees on the synthesized
corpus, plus block-format decode. Prints one JSON line per config.

Run on TPU:   python benches/sweep.py --size-mb 64
Run on CPU:   JAX_PLATFORMS unset won't help — pass --cpu.
"""

import argparse
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class NullWriter:
    def __init__(self):
        self.count = 0

    def write(self, b):
        self.count += len(b)
        return len(b)

    def flush(self):
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size-mb", type=int, default=32)
    ap.add_argument("--threads", type=int, nargs="*", default=[1, 4, 16, 64])
    ap.add_argument("--formats", nargs="*", default=["gzip", "snappy", "mgzip", "bgzf"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        from gzp_tpu.utils.testing import force_cpu_backend

        force_cpu_backend()
    from gzp_tpu.utils.testing import enable_compilation_cache

    enable_compilation_cache()

    from bench import make_corpus
    from gzp_tpu import ALL_FORMATS, ParDecompress, ZBuilder

    corpus = make_corpus(args.size_mb * 1024 * 1024)
    for fmt_name in args.formats:
        fmt = ALL_FORMATS[fmt_name]
        for nt in args.threads:
            # warmup (compilation)
            w = ZBuilder(fmt).num_threads(nt).from_writer(NullWriter())
            w.write(corpus[: w.block_size * max(nt, 1)])
            w.finish()
            sink = NullWriter()
            w = ZBuilder(fmt).num_threads(nt).from_writer(sink)
            t0 = time.perf_counter()
            w.write(corpus)
            w.finish()
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "bench": f"{fmt_name}_encode",
                        "threads": nt,
                        "gbps": round(len(corpus) / dt / 1e9, 4),
                        "ratio": round(len(corpus) / sink.count, 3),
                    }
                ),
                flush=True,
            )

    # block-format decode sweep (host native inflate pool)
    for fmt_name in ("bgzf", "mgzip"):
        if fmt_name not in args.formats:
            continue
        fmt = ALL_FORMATS[fmt_name]
        buf = io.BytesIO()
        w = ZBuilder(fmt).num_threads(16).from_writer(buf)
        w.write(corpus)
        w.finish()
        blob = buf.getvalue()
        for nt in args.threads:
            r = ParDecompress(fmt, io.BytesIO(blob), num_threads=nt)
            t0 = time.perf_counter()
            total = len(r.read())
            dt = time.perf_counter() - t0
            assert total == len(corpus)
            print(
                json.dumps(
                    {
                        "bench": f"{fmt_name}_decode",
                        "threads": nt,
                        "gbps": round(total / dt / 1e9, 4),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
