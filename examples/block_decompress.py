#!/usr/bin/env python
"""Parallel block decompression of an Mgzip/BGZF stream, mirroring the
reference's decompression examples (examples/test3.rs / snap_decode.rs).

    python examples/block_decompress.py --format bgzf < f.bgzf > f
"""

import argparse
import sys

from gzp_tpu import Bgzf, Mgzip, ParDecompressBuilder


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", default="bgzf", choices=["bgzf", "mgzip"])
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        from gzp_tpu.utils.testing import force_cpu_backend

        force_cpu_backend()

    fmt = Bgzf if args.format == "bgzf" else Mgzip
    reader = ParDecompressBuilder(fmt).num_threads(args.threads).from_reader(
        sys.stdin.buffer
    )
    while True:
        chunk = reader.read(1 << 20)
        if not chunk:
            break
        sys.stdout.buffer.write(chunk)


if __name__ == "__main__":
    main()
