"""Bisect which Mosaic/Pallas constructs the remote TPU compile service
accepts (VERDICT.md round-4 task 1).

Round 3 established: a trivial Pallas kernel compiles and runs, but the
grouped-packer placement kernel (fori_loop over 16K iterations doing
dynamic-offset RMW on the LANE dimension of a [1, 1, 36880] block with a
[1, G, 16] input) fails with HTTP 500 in tpu_compile_helper. That kernel
had MANY suspects: lane-dim dynamic slicing, non-128 block shapes, 8 MB
VMEM blocks, 16K-iteration loops, RMW. This script isolates each.

Every probe is a minimal kernel on small, aligned shapes, wrapped in a
SIGALRM timeout so one wedged compile can't eat the session.
"""

import signal
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


class Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise Timeout()


signal.signal(signal.SIGALRM, _alarm)


def probe(name, fn, timeout_s=240):
    signal.alarm(timeout_s)
    t0 = time.time()
    try:
        r = fn()
        np.asarray(r)  # force value fetch
        log(f"{name:34s} OK    ({time.time() - t0:5.1f}s)")
        return True
    except Timeout:
        log(f"{name:34s} TIMEOUT after {timeout_s}s")
        return False
    except Exception as e:  # noqa: BLE001
        msg = repr(e).replace("\n", " ")[:160]
        log(f"{name:34s} FAIL  ({time.time() - t0:5.1f}s) {msg}")
        return False
    finally:
        signal.alarm(0)


x32 = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
xu = x32.astype(jnp.uint32)
big = jnp.ones((512, 128), jnp.uint32)


def run(kernel, out_sd, *args, **kw):
    return pl.pallas_call(kernel, out_shape=out_sd, **kw)(*args)


# --- 1 trivial ------------------------------------------------------------
probe("trivial i32", lambda: run(
    lambda x, o: o.__setitem__(Ellipsis, x[...] + 1),
    jax.ShapeDtypeStruct((8, 128), jnp.int32), x32))

# --- 2 u32 shift/or -------------------------------------------------------
def k_u32(x, o):
    v = x[...]
    o[...] = (v << jnp.uint32(3)) | (v >> jnp.uint32(7))

probe("u32 shifts/or", lambda: run(
    k_u32, jax.ShapeDtypeStruct((8, 128), jnp.uint32), xu))

# --- 3 broadcasted iota ---------------------------------------------------
def k_iota(x, o):
    o[...] = x[...] + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

probe("broadcasted_iota", lambda: run(
    k_iota, jax.ShapeDtypeStruct((8, 128), jnp.int32), x32))

# --- 4 static fori_loop accum in VMEM ------------------------------------
def k_loop(x, o):
    o[...] = jnp.zeros_like(o)

    def body(i, _):
        o[...] = o[...] + x[...]
        return 0

    jax.lax.fori_loop(0, 16, body, 0)

probe("fori_loop + VMEM RMW (static)", lambda: run(
    k_loop, jax.ShapeDtypeStruct((8, 128), jnp.int32), x32))

# --- 5 dynamic-slice LOAD on sublane dim ---------------------------------
def k_dynload_sub(x, o):
    def body(i, acc):
        return acc + x[pl.ds(i * 8, 8), :]

    o[...] = jax.lax.fori_loop(0, 64, body, jnp.zeros((8, 128), jnp.uint32))

probe("dyn LOAD sublane (pl.ds)", lambda: run(
    k_dynload_sub, jax.ShapeDtypeStruct((8, 128), jnp.uint32), big))

# --- 6 dynamic-slice STORE on sublane dim --------------------------------
def k_dynstore_sub(x, o):
    v = x[0:8, :]

    def body(i, _):
        o[pl.ds(i * 8, 8), :] = v + i
        return 0

    jax.lax.fori_loop(0, 64, body, 0)

probe("dyn STORE sublane (pl.ds)", lambda: run(
    k_dynstore_sub, jax.ShapeDtypeStruct((512, 128), jnp.uint32), big))

# --- 7 dynamic RMW on sublane dim ----------------------------------------
def k_dynrmw_sub(x, o):
    o[...] = jnp.zeros_like(o)
    v = x[0:8, :]

    def body(i, _):
        j = (i * 37) % 504  # non-monotone dynamic offset
        o[pl.ds(j, 8), :] = o[pl.ds(j, 8), :] | (v + i)
        return 0

    jax.lax.fori_loop(0, 64, body, 0)

probe("dyn RMW sublane (load|store)", lambda: run(
    k_dynrmw_sub, jax.ShapeDtypeStruct((512, 128), jnp.uint32), big))

# --- 8 dynamic LOAD on lane dim ------------------------------------------
def k_dynload_lane(x, o):
    def body(i, acc):
        return acc + x[:, pl.ds(i * 2, 128)]

    o[...] = jax.lax.fori_loop(0, 32, body, jnp.zeros((8, 128), jnp.uint32))

probe("dyn LOAD lane (pl.ds)", lambda: run(
    k_dynload_lane, jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    jnp.ones((8, 512), jnp.uint32)))

# --- 9 dynamic STORE on lane dim -----------------------------------------
def k_dynstore_lane(x, o):
    v = x[:, 0:128]

    def body(i, _):
        o[:, pl.ds(i * 2, 128)] = v + i
        return 0

    jax.lax.fori_loop(0, 32, body, 0)

probe("dyn STORE lane (pl.ds)", lambda: run(
    k_dynstore_lane, jax.ShapeDtypeStruct((8, 512), jnp.uint32),
    jnp.ones((8, 512), jnp.uint32)))

# --- 10 SMEM scalar input -------------------------------------------------
def k_smem(s, x, o):
    o[...] = x[...] + s[0]

probe("SMEM scalar input", lambda: pl.pallas_call(
    k_smem,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(jnp.array([7], jnp.int32), x32))

# --- 11 scalar prefetch grid spec ----------------------------------------
def k_prefetch(s, x, o):
    i = s[0]
    o[...] = x[pl.ds(i * 8, 8), :]

probe("PrefetchScalarGridSpec + dyn idx", lambda: pl.pallas_call(
    k_prefetch,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ),
)(jnp.array([3], jnp.int32), big))

# --- 12 scratch VMEM ------------------------------------------------------
def k_scratch(x, o, sc):
    sc[...] = x[...] * 2
    o[...] = sc[...] + 1

probe("scratch VMEM", lambda: pl.pallas_call(
    k_scratch,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
)(x32))

# --- 13 grid over blocks --------------------------------------------------
def k_grid(x, o):
    o[...] = x[...] + pl.program_id(0)

probe("grid(8) blocked", lambda: pl.pallas_call(
    k_grid,
    out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    grid=(8,),
    in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0))],
    out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
)(jnp.ones((64, 128), jnp.int32)))

# --- 14 long fori_loop (4096) with dyn sublane RMW -----------------------
def k_longloop(x, o):
    o[...] = jnp.zeros_like(o)
    v = x[0:8, :]

    def body(i, _):
        j = (i * 13) % 504
        o[pl.ds(j, 8), :] = o[pl.ds(j, 8), :] | v
        return 0

    jax.lax.fori_loop(0, 4096, body, 0)

probe("fori 4096 dyn RMW sublane", lambda: run(
    k_longloop, jax.ShapeDtypeStruct((512, 128), jnp.uint32), big))

# --- 15 while_loop --------------------------------------------------------
def k_while(x, o):
    def cond(c):
        return c[0] < 16

    def body(c):
        i, acc = c
        return (i + 1, acc + x[...])

    _, r = jax.lax.while_loop(cond, body, (0, jnp.zeros((8, 128), jnp.int32)))
    o[...] = r

probe("while_loop", lambda: run(
    k_while, jax.ShapeDtypeStruct((8, 128), jnp.int32), x32))

# --- 16 uint8 input -------------------------------------------------------
def k_u8(x, o):
    o[...] = x[...].astype(jnp.int32) * 3

probe("uint8 load+cast", lambda: run(
    k_u8, jax.ShapeDtypeStruct((32, 128), jnp.int32),
    jnp.ones((32, 128), jnp.uint8)))

# --- 17 MXU matmul in kernel ---------------------------------------------
def k_mm(a, bb, o):
    o[...] = jnp.dot(a[...], bb[...], preferred_element_type=jnp.float32)

probe("MXU matmul f32", lambda: run(
    k_mm, jax.ShapeDtypeStruct((128, 128), jnp.float32),
    jnp.ones((128, 128), jnp.float32), jnp.ones((128, 128), jnp.float32)))

# --- 18 pltpu.roll static / dynamic --------------------------------------
def k_roll_s(x, o):
    o[...] = pltpu.roll(x[...], 5, 1)

probe("pltpu.roll static", lambda: run(
    k_roll_s, jax.ShapeDtypeStruct((8, 128), jnp.uint32), xu))


def k_roll_d(x, s, o):
    o[...] = pltpu.roll(x[...], s[0], 1)

probe("pltpu.roll dynamic shift", lambda: pl.pallas_call(
    k_roll_d,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(xu, jnp.array([5], jnp.int32)))

# --- 19 associative in-kernel cumsum -------------------------------------
def k_cumsum(x, o):
    o[...] = jnp.cumsum(x[...], axis=1)

probe("jnp.cumsum axis=1", lambda: run(
    k_cumsum, jax.ShapeDtypeStruct((8, 128), jnp.int32), x32))

# --- 20 big VMEM block (8 MB in + 8 MB out) ------------------------------
def k_big(x, o):
    o[...] = x[...] ^ jnp.uint32(0xA5A5A5A5)

probe("8MB VMEM block", lambda: run(
    k_big, jax.ShapeDtypeStruct((16384, 128), jnp.uint32),
    jnp.ones((16384, 128), jnp.uint32)), timeout_s=300)

# --- 21 dyn sublane store with NON-aligned 1-row window -------------------
def k_row1(x, o):
    o[...] = jnp.zeros_like(o)
    v = x[0:1, :]

    def body(i, _):
        o[pl.ds(i * 3, 1), :] = v + i
        return 0

    jax.lax.fori_loop(0, 64, body, 0)

probe("dyn STORE 1-row window", lambda: run(
    k_row1, jax.ShapeDtypeStruct((256, 128), jnp.uint32), big))

# --- 22 per-lane variable shift (VPU) ------------------------------------
def k_varshift(x, o):
    sh = jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 1) & jnp.uint32(31)
    o[...] = x[...] << sh

probe("per-lane variable shift", lambda: run(
    k_varshift, jax.ShapeDtypeStruct((8, 128), jnp.uint32), xu))

log("done")
