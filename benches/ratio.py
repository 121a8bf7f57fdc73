"""Compression-ratio benchmark vs CPython zlib (BASELINE: compressed size
<= reference size; the reference inherits zlib-ng ratios, reference
src/deflate.rs:88-110).

Runs on the CPU backend (ratio is backend-independent); encodes the bench
corpus block-by-block as Mgzip members and compares against zlib at the
same level. Prints one line per level plus a JSON summary.

    python benches/ratio.py [corpus_mb]
"""

import json
import sys
import zlib

sys.path.insert(0, ".")

import jax

jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    from bench import make_corpus
    from gzp_tpu.ops.deflate_kernel import DeflateEncodeConfig, encode_deflate_blocks

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    block = 131072
    nblocks = mb * 1024 * 1024 // block
    corpus = make_corpus(nblocks * block)
    data = np.frombuffer(corpus, np.uint8).reshape(nblocks, block)
    import jax.numpy as jnp

    dd = jnp.asarray(data)
    lengths = jnp.full((nblocks,), block, jnp.int32)
    finals = jnp.zeros((nblocks,), bool)

    summary = {}
    for level in (1, 3, 6, 9):
        cfg = DeflateEncodeConfig.for_level(block, "mgzip", "none", level)
        res = jax.jit(lambda d, cfg=cfg: encode_deflate_blocks(cfg, d, lengths, finals))(dd)
        ours = int(np.asarray(res["out_len"]).sum())
        # zlib mgzip-equivalent: per-block members at the same level
        # (member overhead 28 B/block on both sides cancels approximately;
        # compare raw deflate payloads: zlib wbits=-15 per block + 28)
        zl = sum(
            len(zlib.compress(data[i].tobytes(), level)) + 22
            for i in range(nblocks)
        )
        ratio_ours = len(corpus) / ours
        ratio_zlib = len(corpus) / zl
        rel = ours / zl
        summary[f"level{level}"] = {
            "ours_bytes": ours,
            "zlib_bytes": zl,
            "ours_ratio": round(ratio_ours, 3),
            "zlib_ratio": round(ratio_zlib, 3),
            "size_vs_zlib": round(rel, 4),
        }
        print(
            f"level {level}: ours {ours:>9d} B (x{ratio_ours:5.2f})   "
            f"zlib {zl:>9d} B (x{ratio_zlib:5.2f})   ours/zlib = {rel:.4f}",
            flush=True,
        )
    print(json.dumps({"metric": "mgzip_size_vs_zlib", "summary": summary}))


if __name__ == "__main__":
    main()
