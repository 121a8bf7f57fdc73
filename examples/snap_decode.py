"""Snappy frame decode: stdin -> stdout.

Mirror of the reference's examples/snap_decode.rs (snap FrameDecoder over
stdin copied to stdout), running on the production native-codec frame
decoder rather than the test oracle.

Usage:
    python examples/pigz_clone.py --format snappy < file > file.sz
    python examples/snap_decode.py < file.sz > file.out
"""

import shutil
import sys

sys.path.insert(0, ".")

from gzp_tpu.formats.snap import SnappyFrameDecoder


def main() -> None:
    rdr = SnappyFrameDecoder(sys.stdin.buffer)
    shutil.copyfileobj(rdr, sys.stdout.buffer)


if __name__ == "__main__":
    main()
