"""Probe placement primitives for the v3 grouped bit-packer.

The v2 bit-pack costs 2 full-width scatter-adds (~6.3 ns/elem, the
dominant encoder cost — VERDICT.md weak #1). Candidate replacements put
pre-merged 8-entry groups (10-word windows) into the output buffer:

  w10-window : ONE lax.scatter_add with a 10-word update window per group
  w10-unroll : 10 per-column scatter-adds of [B, G]
  base-2xN   : the v2 baseline (two [B, N] scatter-adds)
  pallas     : is Mosaic compilable on this service at all?

Timing: chained fori_loop with data dependency + scalar fetch
(dispatch-proof, same method as bench.py).
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

B, N = 64, 131072
G = N // 8
W = 9 * N // 32 + 16  # output words per block (mgzip out_bytes scale)
REPS = 8

log(f"backend up: {jax.devices()}  B={B} N={N} G={G} W={W}")

rng = np.random.default_rng(0)
win_np = rng.integers(0, 1 << 32, (B, G, 10), dtype=np.uint32)
# monotone word indices with bounded increments (like real group offsets)
inc = rng.integers(0, 3, (B, G)).astype(np.int32)
gw_np = np.cumsum(inc, axis=1) - inc
gw_np = np.minimum(gw_np, W - 12)
bits_np = rng.integers(0, 1 << 32, (B, N), dtype=np.uint32)
off_np = np.sort(rng.integers(0, 32 * (W - 2), (B, N)).astype(np.int32), axis=1)


def timeit(name, fn, *args):
    try:
        f = jax.jit(fn)
        t0 = time.time()
        int(f(*args))  # value fetch: on axon, block_until_ready returns at dispatch
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            int(f(*args))
            best = min(best, (time.time() - t0) / REPS)
        per_byte = best / (B * N) * 1e9
        log(f"{name:12s} compile {compile_s:6.1f}s  per-iter {best * 1e3:8.2f} ms  {per_byte:6.2f} ns/input-byte")
    except Exception as e:
        log(f"{name:12s} FAILED: {e!r:.200}")


def digest(out):
    """Nonlinear reduction of the full buffer: cannot be distributed over
    scatter updates, so the scatter result must be materialized."""
    v = out ^ (out >> 7) ^ (out << 3)
    return jnp.sum(v, dtype=jnp.uint32)


def chain(body):
    """Chain REPS placements; each iteration's salt digests the WHOLE
    output buffer, so neither the scatter nor any element of it can be
    folded away."""

    def run(x, *rest):
        def it(_, carry):
            salt, out = carry
            out2 = body(out, x, *rest)
            return digest(out2) ^ salt, out2

        salt, _ = jax.lax.fori_loop(
            0, REPS, it, (jnp.uint32(0), jnp.zeros((B, W), jnp.uint32))
        )
        return salt

    return run


def control(out, x, *rest):
    return out + jnp.uint32(1)


def w10_window(out, win, gw):
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(2,),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1),
    )
    rows = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None], (B, G))
    idx = jnp.stack([rows, gw], axis=-1)  # [B, G, 2]
    return jax.lax.scatter_add(
        out, idx, win, dn, indices_are_sorted=True, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def w10_unroll(out, win, gw):
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    for c in range(10):
        out = out.at[rows, gw + c].add(win[:, :, c], mode="drop")
    return out


def base_2xN(out, bits, off):
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    w = off >> 5
    s = (off & 31).astype(jnp.uint32)
    c0 = bits << s
    c1 = (bits >> (jnp.uint32(31) - s)) >> jnp.uint32(1)
    out = out.at[rows, w].add(c0, mode="drop")
    out = out.at[rows, w + 1].add(c1, mode="drop")
    return out


win = jnp.asarray(win_np)
gw = jnp.asarray(gw_np)
bits = jnp.asarray(bits_np)
off = jnp.asarray(off_np)

timeit("control", chain(control), win, gw)  # digest-only floor
timeit("w10-unroll", chain(w10_unroll), win, gw)
timeit("w10-window", chain(w10_window), win, gw)
timeit("base-2xN", chain(base_2xN), bits, off)

# pallas availability check (Mosaic failed HTTP 500 in round 2)
try:
    from jax.experimental import pallas as pl

    def pk(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1

    x = jnp.zeros((8, 128), jnp.int32)
    r = pl.pallas_call(pk, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x)
    jax.block_until_ready(r)
    log("pallas       OK (trivial kernel compiled+ran)")

    # pallas window placement: grid over rows, serial RMW-OR of 16-word
    # windows at dynamic offsets in a VMEM-resident output row
    WPAD = 16

    def place_kernel(win_ref, gw_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)

        def body(g, _):
            start = gw_ref[0, 0, g]
            cur = o_ref[0, 0, pl.dslice(start, WPAD)]
            w = win_ref[0, g, :]
            o_ref[0, 0, pl.dslice(start, WPAD)] = cur | w
            return 0

        jax.lax.fori_loop(0, G, body, 0)

    win16_np = np.zeros((B, G, WPAD), np.uint32)
    win16_np[:, :, :10] = win_np
    win16 = jnp.asarray(win16_np)
    gw3 = jnp.asarray(gw_np[:, None, :])  # [B, 1, G]

    def pallas_place(w16, g3):
        r = pl.pallas_call(
            place_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, G, WPAD), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, G), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 1, W), jnp.uint32),
        )(w16, g3)
        return r.reshape(B, W)

    def pallas_body(out, w16, g3):
        return pallas_place(w16, g3) + (out & jnp.uint32(1))

    timeit("pallas-place", chain(pallas_body), win16, gw3)
except Exception as e:
    log(f"pallas       FAILED: {e!r:.200}")

log("done")
