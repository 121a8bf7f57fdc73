"""Fine-grained probe of the axon TPU environment: init, transfer, compile,
and honest (reps-amortized, scalar-fetch) runtime costs for primitive ops.

Methodology note: on this backend, ``block_until_ready`` returns at dispatch
time, so every timing below forces completion by fetching a scalar derived
from the output; per-call time = (loop of K calls ending in a scalar fetch
- one RTT) / K.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


log("start")
from gzp_tpu.utils.testing import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

log(f"jax imported {jax.__version__}")
devs = jax.devices()
log(f"devices: {devs}")

# RTT estimate: tiny scalar fetch
x0 = jax.device_put(np.float32(1.0))
float(x0)
t0 = time.perf_counter()
for _ in range(5):
    float(x0)
rtt = (time.perf_counter() - t0) / 5
log(f"scalar-fetch RTT ~ {rtt*1e3:.1f} ms")

B, N = 16, 131072
data = np.random.default_rng(0).integers(0, 256, (B, N)).astype(np.uint8)
t0 = time.perf_counter()
dd = jax.device_put(data)
jax.block_until_ready(dd)
log(f"device_put 2MB: {time.perf_counter()-t0:.2f}s")


def timed(name, fn, *args, reps=8):
    t0 = time.perf_counter()
    r = fn(*args)
    first = float(jnp.sum(r)) if hasattr(r, "dtype") else r
    tc = time.perf_counter() - t0
    # honest loop: K dispatches, one scalar fetch at end forces the chain
    @jax.jit
    def chain(a):
        y = a
        for _ in range(reps):
            y = fn(y) if False else y  # placeholder, not used
        return y

    t0 = time.perf_counter()
    for _ in range(reps - 1):
        r = fn(*args)
    r = fn(*args)
    s = float(jnp.sum(r))
    dt = (time.perf_counter() - t0 - rtt) / reps
    log(f"{name:34s} compile+first {tc:6.1f}s   per-call {dt*1e3:8.2f} ms")
    return s


u32 = dd.astype(jnp.uint32)

f_add = jax.jit(lambda a: a + jnp.uint32(1))
timed("elementwise add u32 [16,131072]", f_add, u32)

f_sort = jax.jit(lambda a: jnp.sort(a, axis=1))
timed("sort u32 axis=1 [16,131072]", f_sort, u32)

f_argsort = jax.jit(lambda a: jnp.argsort(a, axis=1).astype(jnp.uint32))
timed("argsort u32 axis=1", f_argsort, u32)

idx = jax.device_put(
    np.random.default_rng(1).integers(0, N, (B, N)).astype(np.int32)
)
f_gather = jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1))
t0 = time.perf_counter()
r = f_gather(u32, idx)
float(jnp.sum(r))
tc = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(7):
    r = f_gather(u32, idx)
r = f_gather(u32, idx)
s = float(jnp.sum(r))
dt = (time.perf_counter() - t0 - rtt) / 8
log(f"{'gather take_along_axis [16,131072]':34s} compile+first {tc:6.1f}s   per-call {dt*1e3:8.2f} ms")

f_scatter = jax.jit(
    lambda a, i: jnp.zeros_like(a).at[jnp.arange(B)[:, None], i].add(a)
)
t0 = time.perf_counter()
r = f_scatter(u32, idx)
float(jnp.sum(r))
tc = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(7):
    r = f_scatter(u32, idx)
r = f_scatter(u32, idx)
s = float(jnp.sum(r))
dt = (time.perf_counter() - t0 - rtt) / 8
log(f"{'scatter-add [16,131072]':34s} compile+first {tc:6.1f}s   per-call {dt*1e3:8.2f} ms")

# small-row sort: [B*C, S] with S=512
sm = u32.reshape(B * 256, 512)
f_sort_sm = jax.jit(lambda a: jnp.sort(a, axis=1))
timed("sort u32 rows [4096,512]", f_sort_sm, sm)

sm2 = u32.reshape(B * 64, 2048)
f_sort_sm2 = jax.jit(lambda a: jnp.sort(a, axis=1))
timed("sort u32 rows [1024,2048]", f_sort_sm2, sm2)

# cumsum along axis 1
f_cumsum = jax.jit(lambda a: jnp.cumsum(a.astype(jnp.int32), axis=1))
timed("cumsum i32 [16,131072]", f_cumsum, u32)

# one-hot matmul flavor: [B,N] u8 -> histogram via scatter
f_hist = jax.jit(
    lambda a: jnp.zeros((B, 256), jnp.int32).at[jnp.arange(B)[:, None], (a & 255).astype(jnp.int32)].add(1)
)
timed("histogram-256 scatter [16,131072]", f_hist, u32)

import os

log(f"cache dir: {os.listdir('/root/repo/.jax_cache') if os.path.exists('/root/repo/.jax_cache') else 'MISSING'}")
log("done")
