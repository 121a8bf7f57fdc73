"""Bisect the suffix-matcher Pallas kernels on device (round 5).

The full level-6 encoder HTTP-500'd the remote Mosaic compile on first
try (per-lag LCP-ladder form). Each kernel compiles standalone here so
failures name their kernel and size; rewritten min-composition neighbor
tested at increasing lags.

Usage: python scripts/probe_suffix_pallas.py [B] [N] [stages...]
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

from bench import make_corpus  # noqa: E402
from gzp_tpu.ops import lz_pallas as lp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
ONLY = set(sys.argv[3:])
PW = 7

data = np.frombuffer(make_corpus(B * N), np.uint8).reshape(B, N)
dd = jax.device_put(data)
dl = jax.device_put(jnp.full((B,), N, jnp.int32))
hs = jax.device_put(jnp.zeros((B,), jnp.int32))
jax.block_until_ready(dd)
log(f"backend up: {jax.devices()}  B={B} N={N}")


def try_stage(name, fn):
    if ONLY and name not in ONLY:
        return None
    try:
        t0 = time.time()
        out = jax.block_until_ready(fn())
        log(f"{name:28s} OK  compile+run {time.time() - t0:6.1f}s")
        return out
    except Exception as e:  # noqa: BLE001
        log(f"{name:28s} FAILED: {e!r:.200}")
        return None


keys = try_stage(
    "suffix_keys",
    lambda: jax.jit(
        lambda d: lp.build_suffix_keys_pallas(d, payload_words=PW)
    )(dd),
)

if keys is not None:
    sk, pos = keys
    sorted_ops = try_stage(
        "suffix_sort8",
        lambda: jax.jit(
            lambda *a: jax.lax.sort(a, dimension=1, num_keys=PW + 1)
        )(*sk, pos),
    )
else:
    sorted_ops = None

if sorted_ops is not None:
    for lags in (4, 16, 24):
        try_stage(
            f"suffix_neighbor_l{lags}",
            lambda lags=lags: jax.jit(
                lambda sks, sp: lp.suffix_neighbor_pallas(
                    list(sks), sp, hs, lags=lags, max_dist=32768
                )
            )(sorted_ops[:PW], sorted_ops[-1]),
        )

    nb = jax.jit(
        lambda sks, sp: lp.suffix_neighbor_pallas(
            list(sks), sp, hs, lags=16, max_dist=32768
        )
    )(sorted_ops[:PW], sorted_ops[-1])
    packed_pos = jax.lax.sort((nb[0], nb[1]), dimension=1, num_keys=1)[1]
    try_stage(
        "tail2",
        lambda: jax.jit(
            lambda d, p: lp.match_tail2_pallas(
                d, p, p, dl, hs, base=0, payload_bytes=4 * PW,
                max_match=258, min_emit=3, lazy=True,
            )
        )(dd, packed_pos),
    )

try_stage(
    "full_suffix_match",
    lambda: jax.jit(
        lambda d: lp.best_matches_suffix_pallas(
            d, dl, max_dist=32768, max_match=258, min_emit=3, lazy=True,
            payload_words=PW, lags=16,
        )
    )(dd),
)
log("done")
