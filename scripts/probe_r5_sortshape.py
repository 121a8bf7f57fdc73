"""Sort-primitive shape/dtype sensitivity (round-5 follow-up).

The encode is sort-bound (ARCHITECTURE §10). Questions:
  * does per-element sort cost drop with shorter rows at the same total
    element count? (If strongly: a segmented matcher — 64 KiB segments
    with a 32 KiB halo, which preserves every DEFLATE-legal distance —
    would trade 1.5x elements for cheaper rows.)
  * does operand COUNT/dtype change the cost? (isolates the 4-operand
    candidate sort's real price)

Usage: python scripts/probe_r5_sortshape.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:7.1f}s] {m}", flush=True)


from gzp_tpu.utils.testing import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPS = 8
TOTAL = 64 * 131072
rng = np.random.default_rng(9)

log(f"backend up: {jax.devices()}")


def digest32(x):
    v = x.astype(jnp.uint32)
    return jnp.sum(v ^ (v >> 7), dtype=jnp.uint32)


def probe(name, b, n, n_payload=1, pay_dtype=jnp.uint32):
    try:
        ks = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 32, (b, n), dtype=np.int64).astype(np.uint32)
        ))
        pays = [
            jax.device_put(jnp.asarray(
                rng.integers(0, 250, (b, n)).astype(
                    np.uint32 if pay_dtype == jnp.uint32 else np.uint8
                )
            ))
            for _ in range(n_payload)
        ]
        jax.block_until_ready(ks)

        def run(k, *pv):
            def it(_, carry):
                salt, kk = carry
                kk = kk.at[0, 0].set(kk[0, 0] ^ (salt & 1))
                outs = jax.lax.sort((kk, *pv), dimension=1, num_keys=1)
                return digest32(outs[1]) ^ outs[0][0, 0] ^ salt, kk

            salt, _ = jax.lax.fori_loop(0, REPS, it, (jnp.uint32(0), k))
            return salt

        f = jax.jit(run)
        t0 = time.time()
        int(f(ks, *pays))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            int(f(ks, *pays))
            best = min(best, (time.time() - t0) / REPS)
        log(
            f"{name:32s} compile {compile_s:5.1f}s  per-iter {best * 1e3:8.2f} ms"
            f"  {best / (b * n) * 1e9:6.3f} ns/elem"
        )
    except Exception as e:  # noqa: BLE001
        log(f"{name:32s} FAILED: {e!r:.200}")


# row-length sensitivity at constant total elements
probe("2op u32 [64,131072]", 64, 131072)
probe("2op u32 [128,65536]", 128, 65536)
probe("2op u32 [256,32768]", 256, 32768)
probe("2op u32 [512,16384]", 512, 16384)
# operand count/dtype sensitivity at the flagship shape
probe("1op u32 [64,131072]", 64, 131072, n_payload=0)
probe("4op u32 [64,131072]", 64, 131072, n_payload=3)
probe("2op u8pay [64,131072]", 64, 131072, n_payload=1, pay_dtype=jnp.uint8)
log("done")
