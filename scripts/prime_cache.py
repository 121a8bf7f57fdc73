"""Prime the persistent XLA compile cache for every bench ladder stage.

Run early in the round (and restarted by scripts/health_watch.sh if the
remote compile service flakes): compiles + executes each bench.py ladder
stage so the driver's end-of-round bench run is a pure cache hit
(VERDICT.md round-3 task 1a). Logs phase timings for the round record.
"""

from __future__ import annotations

import json
import sys
import time

T0 = time.time()


def log(msg: str) -> None:
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from gzp_tpu.utils.testing import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench

    log(f"backend up: {jax.devices()}")

    # health probe + first-execution warm-up (the axon tunnel stalls
    # minutes on a fresh process's first launch; pay it here)
    t0 = time.time()
    y = jax.jit(lambda v: (v * jnp.int32(3) + 1).sum())(jnp.arange(2048, dtype=jnp.int32))
    y.block_until_ready()
    log(f"warm-up exec: {time.time() - t0:.1f}s")

    level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # the 64-row flagship compile has repeatedly crashed the remote XLA
    # service; by default prime only what reliably compiles (the bench
    # ladder itself still attempts every stage at run time)
    import os

    max_batch = int(os.environ.get("GZP_PRIME_MAX_BATCH", "32"))
    failures = 0
    for batch, block_size, reps in bench.LADDER:
        if batch > max_batch:
            log(f"stage {batch}x{block_size} skipped (GZP_PRIME_MAX_BATCH={max_batch})")
            continue
        t0 = time.time()
        try:
            res = bench.run_stage(batch, block_size, reps, level)
        except Exception as e:
            # keep climbing: a validation failure still primes the compile
            # cache for this stage, which is the whole point of this script
            log(f"stage {batch}x{block_size} FAILED after {time.time() - t0:.1f}s: {e!r:.300}")
            failures += 1
            continue
        log(f"stage {batch}x{block_size} ok in {time.time() - t0:.1f}s: {json.dumps(res)}")
    # also prime the driver's single-chip compile check (__graft_entry__)
    t0 = time.time()
    try:
        import __graft_entry__ as g

        fn, fargs = g.entry()
        out, out_len, check = fn(*fargs)
        import numpy as _np

        _np.asarray(out_len)
        log(f"graft entry primed in {time.time() - t0:.1f}s")
    except Exception as e:
        log(f"graft entry FAILED after {time.time() - t0:.1f}s: {e!r:.200}")
        failures += 1

    log(f"all ladder stages primed ({failures} failures)")
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
