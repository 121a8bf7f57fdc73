"""Sort cost vs num_keys (round-5 suffix-matcher follow-up).

The suffix matcher sorts 8 u32 operands with num_keys=8 (7 context
words + position). probe_r5_sortshape showed payload operands are
~free with num_keys=1; this isolates whether the COMPARATOR depth
(num_keys) is what the suffix sort pays for.

Usage: python scripts/probe_sortkeys.py [B] [N]
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
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
rng = np.random.default_rng(9)

log(f"backend up: {jax.devices()}  B={B} N={N}")


def digest32(x):
    v = x.astype(jnp.uint32)
    return jnp.sum(v ^ (v >> 7), dtype=jnp.uint32)


ops = [
    jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, (B, N), dtype=np.int64).astype(np.uint32)
    ))
    for _ in range(8)
]
jax.block_until_ready(ops[0])


def probe(name, n_ops, num_keys):
    try:
        def run(*vs):
            def it(_, carry):
                salt, kk = carry
                kk = kk.at[0, 0].set(kk[0, 0] ^ (salt & 1))
                outs = jax.lax.sort(
                    (kk, *vs[1:]), dimension=1, num_keys=num_keys
                )
                return digest32(outs[-1]) ^ outs[0][0, 0] ^ salt, kk

            salt, _ = jax.lax.fori_loop(0, REPS, it, (jnp.uint32(0), vs[0]))
            return salt

        f = jax.jit(run)
        t0 = time.time()
        int(f(*ops[:n_ops]))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            int(f(*ops[:n_ops]))
            best = min(best, (time.time() - t0) / REPS)
        per = best / (B * N) * 1e9
        log(f"{name:24s} compile {comp:6.1f}s  {per:6.3f} ns/elem")
    except Exception as e:  # noqa: BLE001
        log(f"{name:24s} FAILED: {e!r:.200}")


probe("2op_k1", 2, 1)
probe("8op_k1", 8, 1)
probe("8op_k2", 8, 2)
probe("8op_k3", 8, 3)
probe("8op_k5", 8, 5)
probe("8op_k8", 8, 8)
log("done")
