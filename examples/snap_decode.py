"""Snappy frame decode: stdin -> stdout.

Mirror of the reference's examples/snap_decode.rs (snap FrameDecoder over
stdin copied to stdout), running on the production native-codec frame
decoder rather than the test oracle.

Usage:
    python examples/pigz_clone.py --format snappy < file > file.sz
    python examples/snap_decode.py < file.sz > file.out
"""

import os
import shutil
import sys

try:
    from gzp_tpu.formats.snap import SnappyFrameDecoder
except ImportError:  # source checkout without `pip install -e .`
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gzp_tpu.formats.snap import SnappyFrameDecoder


def main() -> None:
    rdr = SnappyFrameDecoder(sys.stdin.buffer)
    shutil.copyfileobj(rdr, sys.stdout.buffer)


if __name__ == "__main__":
    main()
