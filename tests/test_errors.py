"""Builder validation + failure-path tests (reference
src/par/compress.rs:68-90 builder checks; error transparency semantics)."""

import io

import pytest

from gzp_tpu import (
    Bgzf,
    BufferSizeError,
    ChannelError,
    Gzip,
    NumThreadsError,
    ParCompressBuilder,
    WriterClosedError,
    ZBuilder,
)
from gzp_tpu.constants import DICT_SIZE


def test_buffer_size_validation():
    with pytest.raises(BufferSizeError):
        ParCompressBuilder(Gzip).buffer_size(DICT_SIZE - 1)
    # boundary is legal
    ParCompressBuilder(Gzip).buffer_size(DICT_SIZE)


def test_num_threads_validation():
    with pytest.raises(NumThreadsError):
        ParCompressBuilder(Gzip).num_threads(0)


def test_write_after_finish_raises():
    buf = io.BytesIO()
    w = ZBuilder(Gzip).num_threads(2).buffer_size(DICT_SIZE).from_writer(buf)
    w.write(b"hello")
    w.finish()
    with pytest.raises(WriterClosedError):
        w.write(b"more")
    # double-finish is idempotent (returns writer again)
    assert w.finish() is buf


def test_sink_error_propagates():
    class BrokenPipe(io.RawIOBase):
        def write(self, b):
            raise BrokenPipeError("downstream closed")

    w = ZBuilder(Gzip).num_threads(2).buffer_size(DICT_SIZE).from_writer(BrokenPipe())
    with pytest.raises(BrokenPipeError):
        w.write(b"x" * (DICT_SIZE * 2 * 4))
        w.finish()


def test_bgzf_buffer_clamped_to_cap():
    # requesting a giant buffer on BGZF clamps to the 65280 input cap
    buf = io.BytesIO()
    w = ZBuilder(Bgzf).num_threads(2).buffer_size(1 << 20).from_writer(buf)
    assert w.block_size == 65280
    w.finish()
