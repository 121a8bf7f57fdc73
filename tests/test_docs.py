"""Executable documentation examples — the analog of the reference's
doc-tests, which double as API contracts on every public entry point
(reference src/lib.rs:25-72, src/par/compress.rs:5-17, src/snap.rs:11-23).
"""

import doctest

import gzp_tpu
import gzp_tpu.parallel.builder


def test_package_doctest():
    results = doctest.testmod(gzp_tpu, verbose=False)
    assert results.attempted > 0
    assert results.failed == 0


def test_builder_doctest():
    results = doctest.testmod(gzp_tpu.parallel.builder, verbose=False)
    assert results.attempted > 0
    assert results.failed == 0
