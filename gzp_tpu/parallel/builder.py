"""Unified auto-dispatch builder — the ``ZBuilder`` equivalent
(reference src/lib.rs:181-265): picks the parallel writer when
``num_threads > 1``, else the sync fallback, behind one API.
"""

from __future__ import annotations

from typing import BinaryIO

import jax

from gzp_tpu.constants import DEFAULT_COMPRESSION_LEVEL
from gzp_tpu.formats.base import FormatSpec
from gzp_tpu.parallel.compress import DEFAULT_NUM_THREADS, ParCompress, ParCompressBuilder
from gzp_tpu.parallel.syncz import SyncZ, SyncZBuilder


class ZBuilder:
    """``ZBuilder(Gzip).num_threads(8).from_writer(f)`` -> writer object.

    ``num_threads`` keeps the reference's contract (0/1 -> sync path,
    reference src/lib.rs:246-263); for the parallel path it sets the
    number of blocks compressed per device dispatch (the lane count that
    replaces the reference's worker-thread count).

    >>> import io, gzip
    >>> from gzp_tpu import ZBuilder, Mgzip
    >>> buf = io.BytesIO()
    >>> w = ZBuilder(Mgzip).num_threads(2).from_writer(buf)
    >>> _ = w.write(b"block framed " * 512)
    >>> _ = w.finish()
    >>> gzip.decompress(buf.getvalue()) == b"block framed " * 512
    True
    >>> ZBuilder(Mgzip).num_threads(1).from_writer(io.BytesIO()).__class__.__name__
    'SyncZ'
    """

    def __init__(self, format_spec: FormatSpec):
        self.format_spec = format_spec
        self._num_threads = DEFAULT_NUM_THREADS
        self._level = DEFAULT_COMPRESSION_LEVEL
        self._buffer_size: int | None = None
        self._pin_threads: int | None = None
        self._mesh: jax.sharding.Mesh | None = None

    def num_threads(self, n: int) -> "ZBuilder":
        self._num_threads = n
        return self

    def compression_level(self, level: int) -> "ZBuilder":
        self._level = level
        return self

    def buffer_size(self, size: int) -> "ZBuilder":
        self._buffer_size = size
        return self

    def pin_threads(self, pin: int | None) -> "ZBuilder":
        # Kept for API parity; thread pinning is meaningless on-device
        # (the reference also degrades to a no-op + warning on unsupported
        # platforms, src/lib.rs:221-230).
        self._pin_threads = pin
        return self

    def mesh(self, mesh: jax.sharding.Mesh | None) -> "ZBuilder":
        self._mesh = mesh
        return self

    def from_writer(self, writer: BinaryIO):
        if self._num_threads > 1:
            b = (
                ParCompressBuilder(self.format_spec)
                .num_threads(self._num_threads)
                .compression_level(self._level)
                .mesh(self._mesh)
            )
            if self._buffer_size is not None:
                b = b.buffer_size(self._buffer_size)
            return b.from_writer(writer)
        b = SyncZBuilder(self.format_spec).compression_level(self._level)
        if self._buffer_size is not None:
            b = b.buffer_size(self._buffer_size)
        return b.from_writer(writer)
