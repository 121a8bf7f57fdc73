import sys; sys.path.insert(0, "/root/repo")
from gzp_tpu.utils.testing import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax, jax.numpy as jnp, gzip, zlib
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

for trial in range(3):
    _, out, ol = chain(data)
    out, ol = np.asarray(out), np.asarray(ol)
    bad = []
    for i in range(batch):
        member = out[i, :ol[i]].tobytes()
        d = zlib.decompressobj(-15)
        try:
            plain = d.decompress(member[20:-8]) + d.flush()
        except Exception as e:
            bad.append((i, "inflate", str(e)[:20])); continue
        want = data[i].tobytes()
        if i == 0: plain, want = plain[1:], want[1:]
        if plain != want:
            pa = np.frombuffer(plain, np.uint8); wa = np.frombuffer(want, np.uint8)
            m = min(len(pa), len(wa)); df_ = np.argwhere(pa[:m] != wa[:m]).ravel()
            bad.append((i, df_[:3].tolist(), len(df_)))
    print(f"trial {trial}: bad={bad}", flush=True)
