"""Isolate the TPU-only B=32 encode corruption (bench rung 3, round 4).

Phase 'cpu': compute the reference outputs on the CPU backend and save
them. Phase 'tpu': run the same encode on the TPU, diff bytes against
the reference, and additionally A/B the packer and emit stages on the
same inputs to name the diverging stage.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:6.1f}s] {m}", flush=True)


phase = sys.argv[1] if len(sys.argv) > 1 else "tpu"
B, N = 32, 131072

import numpy as np  # noqa: E402

if phase == "cpu":
    import jax

    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
else:
    from gzp_tpu.utils.testing import enable_compilation_cache

    enable_compilation_cache()

import gzip  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402
from gzp_tpu.ops.deflate_kernel import (  # noqa: E402
    DeflateEncodeConfig,
    encode_deflate_blocks,
    match_stage,
    parse_stage,
    pack_entries_sortscan,
)

cfg = DeflateEncodeConfig.for_level(N, "mgzip", "none", 3)
data = np.frombuffer(make_corpus(B * N), np.uint8).reshape(B, N)
dl = jnp.asarray(np.full((B,), N, np.int32))
df = jnp.asarray(np.zeros((B,), bool))
dd = jnp.asarray(data)
log(f"backend: {jax.devices()}")


@jax.jit
def enc(d):
    r = encode_deflate_blocks(cfg, d, dl, df)
    return r["out"], r["out_len"]


@jax.jit
def stages(d):
    ext, ml, md = match_stage(cfg, d, dl)
    marked, l = parse_stage(cfg, ml, dl)
    return ml, md, marked.astype(jnp.int8), l


out, ol = enc(dd)
out, ol = np.asarray(out), np.asarray(ol)
ml, md, marked, l = (np.asarray(x) for x in stages(dd))

# packer-only on synthetic entries (same as the profiler's shapes)
v = dd.astype(jnp.uint32)
nb = (v & 7).astype(jnp.int32)
bits = v & ((jnp.uint32(1) << nb.astype(jnp.uint32)) - 1)
pw, pt = pack_entries_sortscan(bits, nb, 160, cfg.out_words)
pw, pt = np.asarray(pw), np.asarray(pt)

if phase == "cpu":
    np.savez_compressed(
        "/tmp/ref_b32.npz", out=out, ol=ol, ml=ml, md=md, marked=marked, l=l,
        pw=pw, pt=pt,
    )
    log("cpu reference saved")
else:
    ref = np.load("/tmp/ref_b32.npz")
    bad = []
    for i in range(B):
        try:
            assert gzip.decompress(out[i, : ol[i]].tobytes()) == data[i].tobytes()
        except Exception as e:  # noqa: BLE001
            bad.append((i, str(e)[:40]))
    log(f"decode failures: {bad[:6] or 'none'}")
    for name, a, b in [
        ("out_len", ol, ref["ol"]), ("out", out, ref["out"]),
        ("match_len", ml, ref["ml"]), ("match_dist", md, ref["md"]),
        ("marked", marked, ref["marked"]), ("parse_l", l, ref["l"]),
        ("pack_words", pw, ref["pw"]), ("pack_total", pt, ref["pt"]),
    ]:
        if a.shape != b.shape:
            log(f"{name}: SHAPE {a.shape} vs {b.shape}")
            continue
        diff = np.argwhere(a != b)
        if len(diff) == 0:
            log(f"{name}: identical")
        else:
            first = tuple(diff[0])
            log(
                f"{name}: {len(diff)} diffs; first at {first}: "
                f"tpu={a[first]} cpu={b[first]}"
            )
log("done")
