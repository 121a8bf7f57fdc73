import sys; sys.path.insert(0, "/root/repo")
from gzp_tpu.utils.testing import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp
from bench import make_corpus
from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks

batch, block_size, reps = 32, 131072, 8
cfg = DeflateEncodeConfig.for_level(block_size, "mgzip", "none", 3)
data = np.frombuffer(make_corpus(batch*block_size), np.uint8).reshape(batch, block_size)
dl = jax.device_put(np.full((batch,), block_size, np.int32))
df = jax.device_put(np.zeros((batch,), bool))
out_shape = jnp.zeros((batch, cfg.out_bytes), jnp.uint8)
len_shape = jnp.zeros((batch,), jnp.int32)

@jax.jit
def chain(d):
    def body(_, carry):
        salt, x, _, _ = carry
        x = x.at[0, 0].set((x[0, 0].astype(jnp.uint32) ^ (salt & 1)).astype(jnp.uint8))
        res = encode_deflate_blocks(cfg, x, dl, df)
        tot = jnp.sum(res["out_len"]).astype(jnp.uint32)
        return tot ^ res["check"][0], x, res["out"], res["out_len"]
    salt, _, out, out_len = jax.lax.fori_loop(0, reps, body, (jnp.uint32(0), jax.device_put(d), out_shape, len_shape))
    return salt, out, out_len

_, out_dev, _ = chain(data)   # ONE execution; buffer immutable on device
fetches = [np.asarray(out_dev) for _ in range(4)]
for k in range(1, 4):
    diff = np.argwhere(fetches[k] != fetches[0])
    print(f"fetch {k} vs 0: {len(diff)} byte diffs {diff[:5].tolist()}", flush=True)
# and the known corrupt positions across fetches
for k in range(4):
    f = fetches[k]
    print(f"fetch {k}: blk4[9758:9762]={f[4,9758:9762].tolist()} blk13[16]={int(f[13,16])}", flush=True)
