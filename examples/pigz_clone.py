#!/usr/bin/env python
"""stdin -> stdout parallel gzip, the reference's examples/test1.rs
(a minimal pigz clone).

    python examples/pigz_clone.py < file > file.gz
    python examples/pigz_clone.py --format bgzf --threads 32 < f > f.bgzf
"""

import argparse
import os
import sys

try:
    from gzp_tpu import ALL_FORMATS, ZBuilder
except ImportError:  # source checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gzp_tpu import ALL_FORMATS, ZBuilder


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", default="gzip", choices=sorted(ALL_FORMATS))
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        from gzp_tpu.utils.testing import force_cpu_backend

        force_cpu_backend()

    fmt = ALL_FORMATS[args.format]
    writer = (
        ZBuilder(fmt)
        .num_threads(args.threads)
        .compression_level(args.level)
        .from_writer(sys.stdout.buffer)
    )
    while True:
        chunk = sys.stdin.buffer.read(1 << 20)
        if not chunk:
            break
        writer.write(chunk)
    writer.finish()


if __name__ == "__main__":
    main()
