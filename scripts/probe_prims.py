"""Calibrate TPU per-primitive costs with the honest chained-fori_loop
method (see scripts/profile_r2.py docstring). These numbers decide the
encoder architecture: which ops are allowed per input byte.

Hypothesis from profile_r2_run1.log: arbitrary-index gather/scatter/sort
cost ~5-10 ns/element on this chip via XLA, while contiguous VPU ops and
MXU matmuls are orders of magnitude cheaper.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


from gzp_tpu.utils.testing import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

jax.devices()
log("backend up")

R = 16


def chain_time(name, step, data, nelem):
    """step(dd) -> array; chained R times with a 1-element data dep."""

    @jax.jit
    def run(d):
        def body(_, carry):
            salt, dd = carry
            dd = dd.at[0, 0].set(dd[0, 0] ^ (salt & 1).astype(dd.dtype))
            out = step(dd)
            return out.astype(jnp.uint32).reshape(-1)[0], dd

        salt, _ = jax.lax.fori_loop(0, R, body, (jnp.uint32(0), d))
        return salt

    t0 = time.perf_counter()
    s = int(run(data))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = int(run(data))
    dt = (time.perf_counter() - t0) / R
    log(
        f"{name:46s} compile {tc:6.1f}s  per-iter {dt*1e3:9.3f} ms"
        f"  {dt/nelem*1e9:7.2f} ns/elem"
    )


rng = np.random.default_rng(0)

for B, N in ((16, 131072), (64, 131072)):
    nelem = B * N
    dd = jax.device_put(rng.integers(0, 1 << 30, (B, N)).astype(np.uint32))
    idx = jax.device_put(rng.integers(0, N, (B, N)).astype(np.int32))
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    chain_time(f"[{B},{N}] elementwise x3 (mul/add/xor)",
               lambda d: (d * jnp.uint32(2654435761) + jnp.uint32(1)) ^ (d >> 7), dd, nelem)
    chain_time(f"[{B},{N}] shift-concat compare (halo style)",
               lambda d: jnp.concatenate([d[:, 1:], d[:, :1]], axis=1) == d, dd, nelem)
    chain_time(f"[{B},{N}] cumsum i32", lambda d: jnp.cumsum(d.astype(jnp.int32), axis=1), dd, nelem)
    chain_time(f"[{B},{N}] gather big (take_along_axis idx)",
               lambda d: jnp.take_along_axis(d, idx, axis=1), dd, nelem)
    chain_time(f"[{B},{N}] scatter-set big",
               lambda d: jnp.zeros_like(d).at[rows, idx].set(d), dd, nelem)
    chain_time(f"[{B},{N}] sort u32", lambda d: jnp.sort(d, axis=1), dd, nelem)

    # gather from small per-row table [B,512]
    tbl = jax.device_put(rng.integers(0, 1 << 30, (B, 512)).astype(np.uint32))
    sidx = (dd & 511).astype(jnp.int32)
    chain_time(f"[{B},{N}] gather small-table(512) t_a_a",
               lambda d: jnp.take_along_axis(tbl, (d & 511).astype(jnp.int32), axis=1), dd, nelem)

    # one-hot matmul gather from a per-batch 286-table (f32 MXU)
    tbl286 = jax.device_put(
        rng.integers(0, 1 << 15, (B, 286)).astype(np.float32)
    )

    def onehot_gather(d):
        o = jax.nn.one_hot((d % 286).astype(jnp.int32), 286, dtype=jnp.float32)
        r = jnp.einsum("bnk,bk->bn", o, tbl286)
        return jnp.sum(r, axis=(0, 1)).astype(jnp.uint32)

    chain_time(f"[{B},{N}] one-hot(286) batched matmul gather", onehot_gather, dd, nelem)

    # chunked gather: one index per 8-lane chunk
    M = N // 8
    d3shape = (B, M, 8)
    cidx = jax.device_put(rng.integers(0, M, (B, M)).astype(np.int32))

    def chunk_gather(d):
        d3 = d.reshape(*d3shape)
        out = jnp.take_along_axis(d3, cidx[:, :, None], axis=1)
        return jnp.sum(out, dtype=jnp.uint32).reshape(-1)[0] * jnp.uint32(1)

    chain_time(f"[{B},{N}] chunked gather (idx per 8 elems)", chunk_gather, dd, nelem)

    # scatter with sorted (identity-ish) indices
    sidx2 = jax.device_put(np.tile(np.arange(N, dtype=np.int32), (B, 1)))
    chain_time(f"[{B},{N}] scatter-set sorted idx",
               lambda d: jnp.zeros_like(d).at[rows, sidx2].set(d), dd, nelem)

    # histogram-286 via scatter-add
    def hist_scatter(d):
        h = jnp.zeros((B, 286), jnp.int32).at[rows, (d % 286).astype(jnp.int32)].add(1)
        return jnp.sum(h, dtype=jnp.int32).astype(jnp.uint32).reshape(-1)[0] * jnp.uint32(1)

    chain_time(f"[{B},{N}] histogram-286 scatter-add", hist_scatter, dd, nelem)

    # histogram-286 via one-hot sum
    def hist_onehot(d):
        o = jax.nn.one_hot((d % 286).astype(jnp.int32), 286, dtype=jnp.float32)
        return jnp.sum(o, dtype=jnp.float32).astype(jnp.uint32)

    chain_time(f"[{B},{N}] histogram-286 one-hot sum", hist_onehot, dd, nelem)

    # multi-operand sort (key + 3 payloads)
    def msort(d):
        k, p1, p2, p3 = jax.lax.sort((d, d + 1, d + 2, d + 3), dimension=1, num_keys=1)
        return jnp.sum(k + p3, dtype=jnp.uint32).reshape(-1)[0] * jnp.uint32(1)

    chain_time(f"[{B},{N}] sort +3 payload operands", msort, dd, nelem)

    # int8 matmul (CRC bit-matmul shape)
    K = 1024
    M2 = B * N // 128
    bits = jax.device_put(rng.integers(0, 2, (M2, K)).astype(np.int8))
    mat = jax.device_put(rng.integers(0, 2, (K, 32)).astype(np.int8))

    def bitmm(d):
        r = jax.lax.dot_general(bits, mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return ((r & 1).sum(dtype=jnp.int32) + d[0, 0].astype(jnp.int32)).astype(jnp.uint32)

    chain_time(f"[{B},{N}-eq] int8 matmul [{M2}x{K}]x[{K}x32]", bitmm, dd, nelem)

    # batched bool matmul squaring (parse-by-matmul shape): [W,128,128]
    W = B * N // (128 * 128) * 8  # scale-representative window count
    pm = jax.device_put(rng.integers(0, 2, (W, 128, 128)).astype(np.int8))

    def sq(d):
        r = jnp.minimum(jnp.einsum("wij,wjk->wik", pm, pm,
                                   preferred_element_type=jnp.int32), 1)
        return (r.sum(dtype=jnp.int32) + d[0, 0].astype(jnp.int32)).astype(jnp.uint32)

    chain_time(f"[{B},{N}-eq] bool matmul sq [{W},128,128]", sq, dd, nelem)

    # bit-matmul (CRC style): [B*N/32, 256] bits x [256, 32] int8->int32
    K = 256
    M = B * N // 32
    bits = jax.device_put(rng.integers(0, 2, (M, K)).astype(np.int8))
    mat = jax.device_put(rng.integers(0, 2, (K, 32)).astype(np.int8))

    def bitmm(d):
        r = jax.lax.dot_general(bits, mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (r & 1).sum() + d[0, 0].astype(jnp.int32)

    chain_time(f"[{B},{N}-eq] int8 matmul [{M}x{K}]x[{K}x32]", bitmm, dd, nelem)

log("=== pallas vmem gather test ===")
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pk(d_ref, i_ref, o_ref):
        d = d_ref[:]  # [8, 1024]
        idx = i_ref[:]
        o_ref[:] = jnp.take_along_axis(d, idx, axis=1)

    B2, N2 = 256, 1024
    dd2 = jax.device_put(rng.integers(0, 1 << 30, (B2, N2)).astype(np.uint32))
    ii2 = jax.device_put(rng.integers(0, N2, (B2, N2)).astype(np.int32))

    @jax.jit
    def pgather(d, i):
        return pl.pallas_call(
            pk,
            out_shape=jax.ShapeDtypeStruct((B2, N2), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(d, i)

    t0 = time.perf_counter()
    r = pgather(dd2, ii2)
    s = int(jnp.sum(r))
    tc = time.perf_counter() - t0

    @jax.jit
    def chain(d, i):
        def body(_, carry):
            salt, dd = carry
            dd = dd.at[0, 0].set(dd[0, 0] ^ (salt & 1).astype(dd.dtype))
            out = pgather(dd, i)
            return out.reshape(-1)[0], dd

        salt, _ = jax.lax.fori_loop(0, R, body, (jnp.uint32(0), d))
        return salt

    int(chain(dd2, ii2))
    t0 = time.perf_counter()
    int(chain(dd2, ii2))
    dt = (time.perf_counter() - t0) / R
    log(f"pallas vmem take_along_axis [{B2},{N2}] compile {tc:.1f}s per-iter {dt*1e3:.3f} ms  {dt/(B2*N2)*1e9:.2f} ns/elem")
except Exception as e:
    log(f"pallas gather FAILED: {type(e).__name__}: {str(e)[:300]}")

log("done")
