"""Ground-truth timing: force completion by fetching a scalar derived from
the output (d2h of 4 bytes = one tunnel round trip, ~34 ms, subtracted)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks
from gzp_tpu.utils.testing import enable_compilation_cache

enable_compilation_cache()


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    rng = np.random.default_rng(0)
    words = [b"the quick brown fox ", b"jumps over the lazy dog "]
    blob = b"".join(words[rng.integers(0, 2)] for _ in range(B * N // 20 + 2))[: B * N]
    data = np.frombuffer(blob, np.uint8).reshape(B, N).copy()
    dd = jax.device_put(data)
    dl = jax.device_put(np.full(B, N, np.int32))
    df = jax.device_put(np.zeros(B, bool))

    cfg = DeflateEncodeConfig(block_len=N, mode="mgzip", checksum="none")

    @jax.jit
    def enc_total(d, l, f):
        res = encode_deflate_blocks(cfg, d, l, f)
        return jnp.sum(res["out_len"])

    # compile + first
    t0 = time.perf_counter()
    tot = int(enc_total(dd, dl, df))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s total={tot}", flush=True)

    # single call, scalar-fetch-synchronized
    for reps in (1, 4, 16):
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            enc_total(dd, dl, df)
        tot = int(enc_total(dd, dl, df))
        dt = time.perf_counter() - t0
        per = dt / reps
        print(
            f"reps={reps:3d}: {dt*1e3:9.1f} ms total, {per*1e3:8.1f} ms/call "
            f"-> {B*N/per/1e9:.3f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
