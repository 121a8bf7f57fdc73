"""Chunked scatter-add cost (bit-pack group design depends on it)."""
import sys, time
sys.path.insert(0, "/root/repo")
from gzp_tpu.utils.testing import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np

jax.devices()
R = 16
rng = np.random.default_rng(0)
B, N = 64, 131072
NG = N // 8
rows = jnp.arange(B, dtype=jnp.int32)[:, None]

def chain_time(name, step, data, nelem):
    @jax.jit
    def run(d):
        def body(_, carry):
            salt, dd = carry
            dd = dd.at[0, 0].set(dd[0, 0] ^ (salt & 1).astype(dd.dtype))
            out = step(dd)
            return out.astype(jnp.uint32).reshape(-1)[0], dd
        salt, _ = jax.lax.fori_loop(0, R, body, (jnp.uint32(0), d))
        return salt
    t0 = time.perf_counter(); int(run(data)); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); int(run(data)); dt = (time.perf_counter() - t0) / R
    print(f"{name:48s} compile {tc:6.1f}s  per-iter {dt*1e3:9.3f} ms  {dt/nelem*1e9:7.2f} ns/elem", flush=True)

chunks = jax.device_put(rng.integers(0, 1 << 28, (B, NG, 16)).astype(np.uint32))
# sorted, spaced chunk bases (bit-pack-like): increasing by ~9
base = np.cumsum(rng.integers(4, 12, (B, NG)), axis=1).astype(np.int32)
gbase = jax.device_put(base)
OUT = int(base.max()) + 32

def chunk_scatter(d):
    out = jnp.zeros((B, OUT), jnp.uint32)
    pos = gbase[:, :, None] + jnp.arange(16, dtype=jnp.int32)[None, None, :]
    out = out.at[rows[:, :, None], pos].add(d)
    return jnp.sum(out, dtype=jnp.uint32).reshape(-1)[0] * jnp.uint32(1)

chain_time(f"[{B},{NG},16] chunked scatter-add (1 idx/16w)", chunk_scatter, chunks, B * NG * 16)

# dynamic_update_slice-in-scan alternative? skip. plain big scatter-add baseline:
flat = jax.device_put(rng.integers(0, 1 << 28, (B, N)).astype(np.uint32))
fidx = jax.device_put(rng.integers(0, N, (B, N)).astype(np.int32))
def big_scatter_add(d):
    out = jnp.zeros((B, N), jnp.uint32).at[rows, fidx].add(d)
    return jnp.sum(out, dtype=jnp.uint32).reshape(-1)[0] * jnp.uint32(1)
chain_time(f"[{B},{N}] scatter-add baseline", big_scatter_add, flat, B * N)

# associative_scan segmented (run_lengths shape)
from gzp_tpu.ops.lz import run_lengths
du8 = jax.device_put(rng.integers(0, 4, (B, N)).astype(np.uint8))
def rl(d):
    return jnp.sum(run_lengths(d), dtype=jnp.int32).astype(jnp.uint32)
chain_time(f"[{B},{N}] run_lengths assoc-scan", rl, du8, B * N)
print("done", flush=True)
