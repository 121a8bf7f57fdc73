import sys; sys.path.insert(0, "/root/repo")
import numpy as np, zlib
from bench import make_corpus

batch, bs = 32, 131072
data = np.frombuffer(make_corpus(batch*bs), np.uint8).reshape(batch, bs)
t = np.load("/tmp/tpu_b32.npz")
out, ol = t["out"], t["ol"]
for i in (4, 13):
    member = out[i, :ol[i]].tobytes()
    # strip 20B mgzip header, 8B footer; raw inflate without CRC check
    payload = member[20:-8]
    d = zlib.decompressobj(-15)
    try:
        plain = d.decompress(payload) + d.flush()
        err = None
    except Exception as e:
        plain = b""
        err = e
    want = data[i].tobytes()
    print(f"block {i}: decoded {len(plain)} bytes (want {len(want)}), err={err}")
    if plain:
        m = min(len(plain), len(want))
        pa = np.frombuffer(plain[:m], np.uint8); wa = np.frombuffer(want[:m], np.uint8)
        diffs = np.argwhere(pa != wa).ravel()
        print(f"  content diffs: {len(diffs)}; first at {diffs[:8].tolist()}")
        if len(diffs):
            f = diffs[0]
            print("  around first diff:")
            print("   want:", want[f-8:f+24])
            print("   got :", plain[f-8:f+24])
            # was this region produced by a match? find where got repeats earlier content
