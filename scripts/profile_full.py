"""Profile ONLY the full encoder + transfers on TPU (single compilation)."""

import sys
import time

from gzp_tpu.utils.testing import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    print(f"devices: {jax.devices()}  B={B} N={N}  ({B*N/1e6:.1f} MB/batch)", flush=True)

    rng = np.random.default_rng(0)
    words = [b"the quick brown fox ", b"jumps over the lazy dog "]
    blob = b"".join(words[rng.integers(0, 2)] for _ in range(B * N // 20 + 2))[: B * N]
    data = np.frombuffer(blob, np.uint8).reshape(B, N).copy()
    lengths = np.full(B, N, np.int32)
    finals = np.zeros(B, bool)

    cfg = DeflateEncodeConfig(block_len=N, mode="mgzip", checksum="none")
    full = jax.jit(lambda d, l, f: encode_deflate_blocks(cfg, d, l, f))

    t0 = time.perf_counter()
    dd, dl, df = jax.device_put(data), jax.device_put(lengths), jax.device_put(finals)
    jax.block_until_ready(dd)
    print(f"h2d cold: {time.perf_counter()-t0:.3f}s", flush=True)

    t0 = time.perf_counter()
    res = full(dd, dl, df)
    jax.block_until_ready(res)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", flush=True)

    # steady-state: device-only
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        res = full(dd, dl, df)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / reps
    print(f"device-only: {dt*1e3:.1f} ms -> {B*N/dt/1e9:.3f} GB/s", flush=True)

    # with transfers (end-to-end per batch)
    t0 = time.perf_counter()
    for _ in range(reps):
        dd2 = jax.device_put(data)
        res = full(dd2, dl, df)
        out = np.asarray(res["out"])
        ol = np.asarray(res["out_len"])
    dt = (time.perf_counter() - t0) / reps
    print(f"e2e w/ transfers: {dt*1e3:.1f} ms -> {B*N/dt/1e9:.3f} GB/s", flush=True)

    # transfer-only measurements
    t0 = time.perf_counter()
    for _ in range(reps):
        dd2 = jax.device_put(data)
    jax.block_until_ready(dd2)
    dt = (time.perf_counter() - t0) / reps
    print(f"h2d: {dt*1e3:.1f} ms ({data.nbytes/dt/1e9:.2f} GB/s)", flush=True)

    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = np.asarray(res["out"])
    dt = (time.perf_counter() - t0) / reps
    print(f"d2h(out {out.nbytes/1e6:.1f}MB): {dt*1e3:.1f} ms ({out.nbytes/dt/1e9:.2f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
