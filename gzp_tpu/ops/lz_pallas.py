"""Pallas TPU kernels for the LZ77 match-finding stage.

Round-5 finding (scripts/probe_r5_b16.log): halving the match sorts via
position sampling cut only ~10% of the stage — the cost is NOT sort
elements, it is the ~60 separate XLA ops around the sorts, each a
kernel launch plus an HBM round-trip over [B, N] u32 arrays. These
kernels fuse those op chains into three launches with every
intermediate VMEM-resident; the two `jax.lax.sort` calls stay in XLA
(sorting needs lane-dynamic data movement, which Mosaic rejects —
ARCHITECTURE §7).

  * :func:`build_keys_pallas` — bytes -> (sort key, context payload)
    (fuses words4 + hash + key packing: ~8 XLA passes)
  * :func:`neighbor_pallas` — sorted (key, payload) -> packed candidate
    per sorted slot (fuses per-lag shift/compare/LCP/validity/better:
    ~30 passes at lags=2)
  * :func:`match_tail_pallas` — position-ordered packed candidates +
    bytes -> final (len, dist) (fuses unpack + distance-1 run scan +
    extension doubling + heuristics + masks: ~50 passes, including a
    17-step log-shift suffix scan that XLA lowers as separate
    HBM-round-trip levels)

All shifts are along the flattened row-major (rows, 128) order via
``pltpu.roll`` + boundary fixups — static lane/sublane rolls only, the
construct class proven compilable in the round-4 Mosaic bisection
(scripts/probe_mosaic.log).

Reference role: the hash-chain match finders inside zlib-ng/libdeflate
(reference Cargo.toml:28-52), redesigned sort-based for a machine with
no scalar chase loops and ~10 ns/element gathers (ARCHITECTURE §6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gzp_tpu.ops.lz import HASH_MUL, _pos_bits

_U32 = jnp.uint32
_I32 = jnp.int32

LANES = 128


def _auto_interpret(flag: bool) -> bool:
    """Pallas has no CPU lowering: on the cpu backend (the virtual test
    mesh) run kernels in interpret mode automatically so the Pallas
    path can be a production default without a backend switch."""
    return flag or jax.default_backend() == "cpu"


def _rows_for(n: int) -> int:
    rows = -(-n // LANES)
    return -(-rows // 8) * 8


def _shift_right_flat(x, s):
    """out[flat i] = x[flat i - s] with zero fill, on a (R, 128) tile."""
    if s == 0:
        return x
    q, m = divmod(s, LANES)

    def down(v, k):
        if k == 0:
            return v
        rolled = pltpu.roll(v, k, 0)
        row = jax.lax.broadcasted_iota(_I32, v.shape, 0)
        return jnp.where(row >= k, rolled, jnp.zeros_like(v))

    if m == 0:
        return down(x, q)
    a = down(x, q)
    b = down(x, q + 1)
    ra = pltpu.roll(a, m, 1)
    rb = pltpu.roll(b, m, 1)
    col = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    return jnp.where(col >= m, ra, rb)


def _shift_left_flat(x, s):
    """out[flat i] = x[flat i + s] with zero fill."""
    if s == 0:
        return x
    q, m = divmod(s, LANES)

    def up(v, k):
        if k == 0:
            return v
        rolled = pltpu.roll(v, v.shape[0] - k, 0)  # circular roll by -k
        row = jax.lax.broadcasted_iota(_I32, v.shape, 0)
        return jnp.where(row < v.shape[0] - k, rolled, jnp.zeros_like(v))

    if m == 0:
        return up(x, q)
    a = up(x, q)
    b = up(x, q + 1)
    ra = pltpu.roll(a, LANES - m, 1)  # circular roll by -m
    rb = pltpu.roll(b, LANES - m, 1)
    col = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    return jnp.where(col < LANES - m, ra, rb)


def _tz_bytes(x):
    return jnp.where(
        (x & 0xFF) != 0,
        0,
        jnp.where((x & 0xFFFF) != 0, 1, jnp.where((x & 0xFFFFFF) != 0, 2, 3)),
    ).astype(_I32)


# ---------------------------------------------------------------------------
# Kernel 1: key/payload build
# ---------------------------------------------------------------------------


def _build_keys_kernel(d_ref, key_ref, *pay_refs, pos_bits, payload_words, n):
    d = d_ref[0].astype(_U32)
    w4 = (
        d
        | (_shift_left_flat(d, 1) << 8)
        | (_shift_left_flat(d, 2) << 16)
        | (_shift_left_flat(d, 3) << 24)
    )
    row = jax.lax.broadcasted_iota(_I32, d.shape, 0)
    col = jax.lax.broadcasted_iota(_I32, d.shape, 1)
    pos = (row * LANES + col).astype(_U32)
    # hash_positions(w4, hash_bits=32-pos_bits) == (w4 * MUL) >> pos_bits
    h = (w4 * jnp.uint32(HASH_MUL)) >> jnp.uint32(pos_bits)
    key = (h << jnp.uint32(pos_bits)) | pos
    # positions beyond n must sort to the end of their hash bucket and
    # never look like real positions; they keep pos >= n so downstream
    # validity masks drop them (mirrors XLA zero-padding + masks)
    key_ref[0] = key
    pays = [w4]
    for k in range(1, payload_words):
        pays.append(_shift_left_flat(w4, 4 * k))
    for r, p in zip(pay_refs, pays):
        r[0] = p
    del n


def build_keys_pallas(data_u8, *, pos_bits, payload_words, interpret=False):
    """bytes [B, N] -> (key [B, Np] u32, payloads list of [B, Np] u32).

    Np pads N up to whole (8, 128) tiles; pad positions carry
    hash(0-word) keys with pos >= N (dropped by downstream masks exactly
    like the XLA path's zero padding).
    """
    interpret = _auto_interpret(interpret)
    b, n = data_u8.shape
    rows = _rows_for(n)
    npad = rows * LANES
    if npad != n:
        data_u8 = jnp.concatenate(
            [data_u8, jnp.zeros((b, npad - n), jnp.uint8)], axis=1
        )
    d3 = data_u8.reshape(b, rows, LANES)
    kern = functools.partial(
        _build_keys_kernel, pos_bits=pos_bits, payload_words=payload_words, n=n
    )
    outs = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(1 + payload_words)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, LANES), _U32)
            for _ in range(1 + payload_words)
        ],
        interpret=interpret,
    )(d3)
    key = outs[0].reshape(b, npad)
    pays = [o.reshape(b, npad) for o in outs[1:]]
    return key, pays


# ---------------------------------------------------------------------------
# Kernel 2: sorted-neighbor candidate evaluation
# ---------------------------------------------------------------------------


def _neighbor_kernel(lo_ref, sk_ref, *pay_refs, pos_bits, lags, max_dist,
                     payload_words):
    sp_ref, packed_ref = pay_refs[-2], pay_refs[-1]
    pays = [r[0] for r in pay_refs[:payload_words]]
    sk = sk_ref[0]
    lo = lo_ref[pl.program_id(0)]  # whole-array SMEM input, one per block
    pos_mask = jnp.uint32((1 << pos_bits) - 1)
    sp = (sk & pos_mask).astype(_I32)
    sh = sk >> jnp.uint32(pos_bits)
    payload_bytes = 4 * payload_words

    # NOTE: selected-through flags are carried as int32 — jnp.where with
    # BOOL payload operands fails the Mosaic remote compile (HTTP 500,
    # bisected round 5; conditions may be bool, payloads may not)
    ls = jnp.zeros_like(sp)
    ds = jnp.zeros_like(sp)
    cs = jnp.zeros_like(sp)
    first = True
    for lag in range(1, lags + 1):
        cpos = _shift_right_flat(sp, lag)
        row = jax.lax.broadcasted_iota(_I32, sp.shape, 0)
        col = jax.lax.broadcasted_iota(_I32, sp.shape, 1)
        edge = (row * LANES + col) < lag
        cpos = jnp.where(edge, -1, cpos)
        csame = jnp.logical_and(
            ~edge, _shift_right_flat(sh, lag) == sh
        )
        dist = sp - cpos
        valid = jnp.logical_and(
            jnp.logical_and(csame, cpos >= lo),
            jnp.logical_and(dist >= 1, dist <= max_dist),
        )
        lcp = jnp.full(sp.shape, payload_bytes, _I32)
        alive = jnp.ones(sp.shape, jnp.bool_)
        for k, w in enumerate(pays):
            x = w ^ _shift_right_flat(w, lag)
            hit = jnp.logical_and(alive, x != 0)
            lcp = jnp.where(hit, 4 * k + _tz_bytes(x), lcp)
            alive = jnp.logical_and(alive, x == 0)
        capped = jnp.logical_and(valid, lcp >= payload_bytes).astype(_I32)
        lcp = jnp.where(valid, lcp, 0)
        if first:
            ls, ds, cs = lcp, dist, capped
            first = False
        else:
            a_wins = jnp.logical_or(
                ls > lcp, jnp.logical_and(ls == lcp, ds < dist)
            )
            ls = jnp.where(a_wins, ls, lcp)
            ds = jnp.where(a_wins, ds, dist)
            cs = jnp.where(a_wins, cs, capped)

    ds = jnp.where(ls > 0, ds, 0)
    packed = (
        ds.astype(_U32)
        | (ls.astype(_U32) << 17)
        | (cs.astype(_U32) << 22)
    )
    sp_ref[0] = sp.astype(_U32)
    packed_ref[0] = packed


def _neighbor_loop_kernel(lo_ref, sk_ref, *pay_refs, pos_bits, lags,
                          max_dist, payload_words):
    """``_neighbor_kernel`` with the lag loop as an in-kernel
    ``fori_loop`` over dynamic lane shifts. The unrolled form keeps
    every per-lag temporary live on Mosaic's scoped-VMEM stack and
    OOMs past the (payload_words <= 3, lags <= 2) envelope — pw=7 at
    lags=2 on 1024-row tiles exceeds the 16 MB limit (round-5 device
    bisects, scripts/probe_suffix_pallas*.log). The loop form's live
    set is constant in ``lags``. Used for the suffix hybrid's hash
    pass (levels >= 6 carry 7 context words)."""
    assert lags < LANES
    sp_ref, packed_ref = pay_refs[-2], pay_refs[-1]
    pays = [r[0] for r in pay_refs[:payload_words]]
    sk = sk_ref[0]
    lo = lo_ref[pl.program_id(0)]
    pos_mask = jnp.uint32((1 << pos_bits) - 1)
    sp = (sk & pos_mask).astype(_I32)
    sh = sk >> jnp.uint32(pos_bits)
    payload_bytes = 4 * payload_words
    row = jax.lax.broadcasted_iota(_I32, sp.shape, 0)
    col = jax.lax.broadcasted_iota(_I32, sp.shape, 1)
    flat = row * LANES + col

    def body(lag, carry):
        ls, ds, cs = carry
        edge = flat < lag
        cpos = jnp.where(edge, -1, _dyn_shift_right_lane(sp, lag))
        csame = jnp.logical_and(~edge, _dyn_shift_right_lane(sh, lag) == sh)
        dist = sp - cpos
        valid = jnp.logical_and(
            jnp.logical_and(csame, cpos >= lo),
            jnp.logical_and(dist >= 1, dist <= max_dist),
        )
        lcp = jnp.full(sp.shape, payload_bytes, _I32)
        alive = jnp.ones(sp.shape, jnp.bool_)
        for k, w in enumerate(pays):
            x = w ^ _dyn_shift_right_lane(w, lag)
            hit = jnp.logical_and(alive, x != 0)
            lcp = jnp.where(hit, 4 * k + _tz_bytes(x), lcp)
            alive = jnp.logical_and(alive, x == 0)
        c2 = jnp.logical_and(valid, lcp >= payload_bytes).astype(_I32)
        l2 = jnp.where(valid, lcp, 0)
        a_wins = jnp.logical_or(ls > l2, jnp.logical_and(ls == l2, ds < dist))
        return (
            jnp.where(a_wins, ls, l2),
            jnp.where(a_wins, ds, dist),
            jnp.where(a_wins, cs, c2),
        )

    zero = jnp.zeros_like(sp)
    ls, ds, cs = jax.lax.fori_loop(1, lags + 1, body, (zero, zero, zero))

    ds = jnp.where(ls > 0, ds, 0)
    sp_ref[0] = sp.astype(_U32)
    packed_ref[0] = (
        ds.astype(_U32) | (ls.astype(_U32) << 17) | (cs.astype(_U32) << 22)
    )


def _lcp_lag_kernel(*refs, lag, payload_words, big_endian):
    """Payload context words -> LCP (bytes, capped at 4*payload_words)
    vs the ``lag``-above sorted neighbor. Standalone so the operand-heavy
    word ladder never shares a VMEM stack with merge temporaries (the
    combined kernels OOM past ~16 MB — scripts/probe_suffix_pallas*.log)."""
    out_ref = refs[-1]
    pays = [r[0] for r in refs[:payload_words]]
    payload_bytes = 4 * payload_words
    byte_fn = _lz_bytes if big_endian else _tz_bytes
    lcp = jnp.full(pays[0].shape, payload_bytes, _I32)
    alive = jnp.ones(pays[0].shape, jnp.bool_)
    for k, w in enumerate(pays):
        x = w ^ _shift_right_flat(w, lag)
        hit = jnp.logical_and(alive, x != 0)
        lcp = jnp.where(hit, 4 * k + byte_fn(x), lcp)
        alive = jnp.logical_and(alive, x == 0)
    out_ref[0] = lcp


def _hash_merge_kernel(lo_ref, sk_ref, *refs, pos_bits, lags, max_dist,
                       payload_bytes):
    """(sorted key, per-lag LCPs) -> best recency candidate per slot."""
    sp_ref, packed_ref = refs[-2], refs[-1]
    lcps = [r[0] for r in refs[:lags]]
    sk = sk_ref[0]
    lo = lo_ref[pl.program_id(0)]
    pos_mask = jnp.uint32((1 << pos_bits) - 1)
    sp = (sk & pos_mask).astype(_I32)
    sh = sk >> jnp.uint32(pos_bits)
    row = jax.lax.broadcasted_iota(_I32, sp.shape, 0)
    col = jax.lax.broadcasted_iota(_I32, sp.shape, 1)
    flat = row * LANES + col

    ls = jnp.zeros_like(sp)
    ds = jnp.zeros_like(sp)
    cs = jnp.zeros_like(sp)
    first = True
    for lag in range(1, lags + 1):
        edge = flat < lag
        cpos = jnp.where(edge, -1, _shift_right_flat(sp, lag))
        csame = jnp.logical_and(~edge, _shift_right_flat(sh, lag) == sh)
        dist = sp - cpos
        valid = jnp.logical_and(
            jnp.logical_and(csame, cpos >= lo),
            jnp.logical_and(dist >= 1, dist <= max_dist),
        )
        lcp = lcps[lag - 1]
        c2 = jnp.logical_and(valid, lcp >= payload_bytes).astype(_I32)
        l2 = jnp.where(valid, lcp, 0)
        if first:
            ls, ds, cs = l2, dist, c2
            first = False
        else:
            a_wins = jnp.logical_or(
                ls > l2, jnp.logical_and(ls == l2, ds < dist)
            )
            ls = jnp.where(a_wins, ls, l2)
            ds = jnp.where(a_wins, ds, dist)
            cs = jnp.where(a_wins, cs, c2)

    ds = jnp.where(ls > 0, ds, 0)
    sp_ref[0] = sp.astype(_U32)
    packed_ref[0] = (
        ds.astype(_U32) | (ls.astype(_U32) << 17) | (cs.astype(_U32) << 22)
    )


def lcp_lags_pallas(pays3, lags, *, big_endian, interpret):
    """Per-lag LCP arrays from reshaped [B, rows, LANES] payload words."""
    b, rows, _ = pays3[0].shape
    pw = len(pays3)
    vspec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return [
        pl.pallas_call(
            functools.partial(
                _lcp_lag_kernel, lag=lag, payload_words=pw,
                big_endian=big_endian,
            ),
            grid=(b,),
            in_specs=[vspec for _ in range(pw)],
            out_specs=[vspec],
            out_shape=[jax.ShapeDtypeStruct((b, rows, LANES), _I32)],
            interpret=interpret,
        )(*pays3)[0]
        for lag in range(1, lags + 1)
    ]


def neighbor_pallas(sk, pays, halo_start, *, pos_bits, lags, max_dist,
                    interpret=False):
    """sorted key + payloads [B, Np] -> (sp, packed) for the restore sort.

    ``halo_start`` is [B] int32 (minimum valid source position). Three
    kernel strategies by VMEM footprint (device bisects,
    scripts/probe_suffix_pallas*.log): the proven fused kernel for
    payload_words <= 3 and lags <= 2 (the level <= 5 production
    configs); a fori-loop variant for more lags at small payloads; and
    a split per-lag-LCP + merge pipeline for wide payloads (the suffix
    hybrid's hash pass carries 7 context words), where the fused AND
    loop forms both blow the 16 MB scoped-VMEM stack."""
    interpret = _auto_interpret(interpret)
    b, npad = sk.shape
    rows = npad // LANES
    pw = len(pays)
    vspec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if pw > 3:
        assert lags <= 4, "split hash-merge kernel holds one LCP block/lag"
        pays3 = [p.reshape(b, rows, LANES) for p in pays]
        lcps = lcp_lags_pallas(pays3, lags, big_endian=False,
                               interpret=interpret)
        sp, packed = pl.pallas_call(
            functools.partial(
                _hash_merge_kernel, pos_bits=pos_bits, lags=lags,
                max_dist=max_dist, payload_bytes=4 * pw,
            ),
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec]
            + [vspec for _ in range(lags)],
            out_specs=[vspec, vspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, rows, LANES), _U32)
                for _ in range(2)
            ],
            interpret=interpret,
        )(halo_start.astype(_I32), sk.reshape(b, rows, LANES), *lcps)
        return sp.reshape(b, npad), packed.reshape(b, npad)
    base_kern = (
        _neighbor_kernel if lags <= 2 else _neighbor_loop_kernel
    )
    kern = functools.partial(
        base_kern, pos_bits=pos_bits, lags=lags, max_dist=max_dist,
        payload_words=pw,
    )
    sp, packed = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [B] array
            vspec,
        ] + [vspec for _ in range(pw)],
        out_specs=[vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, LANES), _U32) for _ in range(2)
        ],
        interpret=interpret,
    )(halo_start.astype(_I32), sk.reshape(b, rows, LANES),
      *[p.reshape(b, rows, LANES) for p in pays])
    return sp.reshape(b, npad), packed.reshape(b, npad)


# ---------------------------------------------------------------------------
# Kernel 3: position-order tail (runs, extension, heuristics)
# ---------------------------------------------------------------------------


def _tail_kernel(len_ref, lo_ref, d_ref, packed_ref, ln_ref, dist_ref, *,
                 n, base, payload_bytes, max_match, min_emit, lazy):
    d = d_ref[0].astype(_I32)
    packed = packed_ref[0]
    length = len_ref[pl.program_id(0)]  # whole-array SMEM inputs
    lo = lo_ref[pl.program_id(0)]
    row = jax.lax.broadcasted_iota(_I32, d.shape, 0)
    col = jax.lax.broadcasted_iota(_I32, d.shape, 1)
    i_idx = row * LANES + col
    end = base + length
    len_limit = end - i_idx

    ln = ((packed >> 17) & 0x1F).astype(_I32)
    dist = (packed & 0x1FFFF).astype(_I32)
    capped = (packed >> 22) == 1

    # ---- distance-1 runs: suffix segmented count of eq, exact ----
    prev = _shift_right_flat(d, 1)
    eq = jnp.logical_and(d == prev, i_idx >= 1)
    # run[i] = eq[i] ? 1 + run[i+1] : 0, via log-shift suffix ladder:
    # carry (count, saturated) — count of leading True from i over a
    # window of 2^k, then compose
    cnt = eq.astype(_I32)
    full = eq  # window is all-True
    s = 1
    while s < n:
        cnt_r = _shift_left_flat(cnt, s)
        full_r = _shift_left_flat(full.astype(_I32), s) == 1
        cnt = jnp.where(full, cnt + cnt_r, cnt)
        full = jnp.logical_and(full, full_r)
        s *= 2
    l3 = cnt
    l3 = jnp.where((i_idx - 1) >= lo, l3, 0)
    run_wins = jnp.logical_or(l3 > ln, jnp.logical_and(l3 == ln, dist > 1))
    dist = jnp.where(run_wins, 1, dist)
    # bool payloads in jnp.where fail the Mosaic compile (see
    # _neighbor_kernel) — mask the flag in integer space
    capped = jnp.logical_and(~run_wins, capped)
    ln = jnp.where(run_wins, l3, ln)

    # ---- extension doubling ----
    cap = payload_bytes
    while cap < max_match:
        ln_next = _shift_left_flat(ln, cap)
        dist_next = _shift_left_flat(dist, cap)
        cap_next = _shift_left_flat(capped.astype(_I32), cap) == 1
        chain = jnp.logical_and(capped, dist_next == dist)
        ln = jnp.where(chain, cap + jnp.where(ln_next > 0, ln_next, 0), ln)
        capped = jnp.logical_and(chain, cap_next)
        cap *= 2

    ln = jnp.minimum(ln, jnp.minimum(len_limit, max_match))
    ln = jnp.where(ln >= min_emit, ln, 0)
    ln = jnp.where(jnp.logical_and(ln == 3, dist > 4096), 0, ln)
    valid_pos = jnp.logical_and(i_idx >= base, i_idx < end)
    ln = jnp.where(valid_pos, ln, 0)

    if lazy:
        ln_next = _shift_left_flat(ln, 1)
        demote = jnp.logical_and(
            ln > 0, jnp.logical_and(ln < 32, ln_next > ln)
        )
        ln = jnp.where(demote, 0, ln)

    ln_ref[0] = ln
    dist_ref[0] = dist


def match_tail_pallas(data_u8, packed_pos, lengths, halo_start, *, base,
                      payload_bytes, max_match, min_emit, lazy,
                      interpret=False):
    """(bytes, restored packed candidates) -> final (match_len, match_dist).

    ``packed_pos`` is [B, Np]; outputs are [B, N] (pad sliced off).
    """
    interpret = _auto_interpret(interpret)
    b, n = data_u8.shape
    rows = _rows_for(n)
    npad = rows * LANES
    if npad != n:
        data_u8 = jnp.concatenate(
            [data_u8, jnp.zeros((b, npad - n), jnp.uint8)], axis=1
        )
    kern = functools.partial(
        _tail_kernel, n=npad, base=base, payload_bytes=payload_bytes,
        max_match=max_match, min_emit=min_emit, lazy=lazy,
    )
    ln, dist = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole [B] arrays
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, LANES), _I32) for _ in range(2)
        ],
        interpret=interpret,
    )(lengths.astype(_I32), halo_start.astype(_I32),
      data_u8.reshape(b, rows, LANES),
      packed_pos.reshape(b, rows, LANES))
    return ln.reshape(b, npad)[:, :n], dist.reshape(b, npad)[:, :n]


# ---------------------------------------------------------------------------
# Suffix-matcher kernels (levels >= 6)
# ---------------------------------------------------------------------------


def _bswap32(x):
    return (
        (x << 24)
        | ((x & jnp.uint32(0xFF00)) << 8)
        | ((x >> 8) & jnp.uint32(0xFF00))
        | (x >> 24)
    )


def _lz_bytes(x):
    """Leading-zero BYTES (0..4) of a uint32 in big-endian byte order —
    the per-word LCP rule after :func:`_bswap32`. Formulated as nested
    byte-mask selects (``jax.lax.clz`` was not in the round-4 Mosaic
    bisection's proven construct set; this is 3 compares either way)."""
    return jnp.where(
        (x & jnp.uint32(0xFF000000)) != 0,
        0,
        jnp.where(
            (x & jnp.uint32(0xFFFF0000)) != 0,
            1,
            jnp.where((x & jnp.uint32(0xFFFFFF00)) != 0, 2,
                      jnp.where(x != 0, 3, 4)),
        ),
    ).astype(_I32)


def _build_suffix_keys_kernel(d_ref, *out_refs, payload_words):
    """bytes -> byte-swapped context words (sort keys) + position."""
    d = d_ref[0].astype(_U32)
    w4 = (
        d
        | (_shift_left_flat(d, 1) << 8)
        | (_shift_left_flat(d, 2) << 16)
        | (_shift_left_flat(d, 3) << 24)
    )
    for k in range(payload_words):
        w = w4 if k == 0 else _shift_left_flat(w4, 4 * k)
        out_refs[k][0] = _bswap32(w)
    row = jax.lax.broadcasted_iota(_I32, d.shape, 0)
    col = jax.lax.broadcasted_iota(_I32, d.shape, 1)
    out_refs[payload_words][0] = (row * LANES + col).astype(_U32)


def build_suffix_keys_pallas(data_u8, *, payload_words, interpret=False):
    """bytes [B, N] -> (keys: list of ``payload_words`` [B, Np] u32
    byte-swapped context words, pos [B, Np] u32). Lexicographic sort of
    ``(*keys, pos)`` is suffix order truncated at ``4*payload_words``
    bytes (mirrors lz.best_matches suffix=True key construction)."""
    interpret = _auto_interpret(interpret)
    b, n = data_u8.shape
    rows = _rows_for(n)
    npad = rows * LANES
    if npad != n:
        data_u8 = jnp.concatenate(
            [data_u8, jnp.zeros((b, npad - n), jnp.uint8)], axis=1
        )
    kern = functools.partial(
        _build_suffix_keys_kernel, payload_words=payload_words
    )
    outs = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(payload_words + 1)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, LANES), _U32)
            for _ in range(payload_words + 1)
        ],
        interpret=interpret,
    )(data_u8.reshape(b, rows, LANES))
    keys = [o.reshape(b, npad) for o in outs[:payload_words]]
    return keys, outs[payload_words].reshape(b, npad)


def _dyn_shift_right_lane(x, s):
    """out[flat i] = x[flat i - s] for a TRACED 0 <= s < LANES (zero
    fill), via two dynamic lane rolls (dynamic-shift ``pltpu.roll`` is
    in the proven construct set, scripts/probe_mosaic.log)."""
    rolled = pltpu.roll(x, 1, 0)
    row = jax.lax.broadcasted_iota(_I32, x.shape, 0)
    b = jnp.where(row >= 1, rolled, jnp.zeros_like(x))  # down-by-one-row
    ra = pltpu.roll(x, s, 1)
    rb = pltpu.roll(b, s, 1)
    col = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    return jnp.where(col >= s, ra, rb)


def _dyn_shift_left_lane(x, s):
    """out[flat i] = x[flat i + s] for a TRACED 1 <= s < LANES (zero
    fill)."""
    rows = x.shape[0]
    rolled = pltpu.roll(x, rows - 1, 0)
    row = jax.lax.broadcasted_iota(_I32, x.shape, 0)
    b = jnp.where(row < rows - 1, rolled, jnp.zeros_like(x))  # up-by-one-row
    ra = pltpu.roll(x, LANES - s, 1)
    rb = pltpu.roll(b, LANES - s, 1)
    col = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    return jnp.where(col < LANES - s, ra, rb)


def _suffix_merge_kernel(lo_ref, sp_ref, adj_ref, packed_ref, *, lags,
                         max_dist, payload_bytes):
    """(pos, adjacent LCP) in sorted suffix order -> best +/-lags
    candidate per sorted slot.

    The XLA formulation recomputes a full ``payload_words``-word LCP
    ladder per lag (~300 ops at lags=16 — the soup behind level 6's
    20-minute compiles, rung32_level6_r5). Here lag-k LCPs come from
    the suffix-array lemma: for lexicographically sorted strings,
    ``lcp(s_i, s_{i-k}) = min(adj[i-k+1..i])`` — the identity survives
    truncation at ``payload_bytes`` because min composes with
    saturation. The lag loop is an in-kernel ``fori_loop`` with dynamic
    lane rolls: the UNROLLED form kept every per-lag temporary live on
    Mosaic's scoped-VMEM stack and OOM'd at lags=16 on 1024-row tiles
    (19.7-29.5 MB vs the 16 MB limit, scripts/probe_suffix_pallas*.log);
    the loop form's live set is constant in ``lags``. Differences vs
    the XLA path exist only in invalid (edge-fill) lanes, which both
    paths mask to zero — bit-equivalence is test-enforced."""
    assert lags < LANES
    sp = sp_ref[0].astype(_I32)
    adj = adj_ref[0]
    lo = lo_ref[pl.program_id(0)]
    npad = sp.shape[0] * LANES
    row = jax.lax.broadcasted_iota(_I32, sp.shape, 0)
    col = jax.lax.broadcasted_iota(_I32, sp.shape, 1)
    flat = row * LANES + col

    def body(lag, carry):
        m_up, ls, ds, cs = carry
        # min-compose the adjacent LCP window (lag=1: min(adj, adj))
        m_up = jnp.minimum(m_up, _dyn_shift_right_lane(adj, lag - 1))

        def consider(ls, ds, cs, lcp, cpos):
            dist = sp - cpos
            valid = jnp.logical_and(
                cpos >= lo, jnp.logical_and(dist >= 1, dist <= max_dist)
            )
            c2 = jnp.logical_and(valid, lcp >= payload_bytes).astype(_I32)
            l2 = jnp.where(valid, lcp, 0)
            a_wins = jnp.logical_or(
                ls > l2, jnp.logical_and(ls == l2, ds < dist)
            )
            return (
                jnp.where(a_wins, ls, l2),
                jnp.where(a_wins, ds, dist),
                jnp.where(a_wins, cs, c2),
            )

        ls, ds, cs = consider(
            ls, ds, cs, m_up,
            jnp.where(flat < lag, -1, _dyn_shift_right_lane(sp, lag)),
        )
        ls, ds, cs = consider(
            ls, ds, cs, _dyn_shift_left_lane(m_up, lag),
            jnp.where(flat >= npad - lag, -1, _dyn_shift_left_lane(sp, lag)),
        )
        return m_up, ls, ds, cs

    zero = jnp.zeros_like(sp)
    _, ls, ds, cs = jax.lax.fori_loop(
        1, lags + 1, body, (adj, zero, zero, zero)
    )

    ds = jnp.where(ls > 0, ds, 0)
    packed_ref[0] = (
        ds.astype(_U32) | (ls.astype(_U32) << 17) | (cs.astype(_U32) << 22)
    )


def suffix_neighbor_pallas(skeys, sp, halo_start, *, lags, max_dist,
                           interpret=False):
    """sorted (keys, pos) [B, Np] -> (sp, packed) for the restore sort.

    Two launches: adjacent-LCP build over the key operands, then the
    lag-merge loop over just (pos, adj) — the split keeps each kernel
    inside the 16 MB scoped-VMEM stack (probe_suffix_pallas.log)."""
    interpret = _auto_interpret(interpret)
    b, npad = sp.shape
    rows = npad // LANES
    pw = len(skeys)
    vspec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    adj = lcp_lags_pallas(
        [k.reshape(b, rows, LANES) for k in skeys], 1,
        big_endian=True, interpret=interpret,
    )[0]
    packed = pl.pallas_call(
        functools.partial(
            _suffix_merge_kernel, lags=lags, max_dist=max_dist,
            payload_bytes=4 * pw,
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec, vspec],
        out_specs=[vspec],
        out_shape=[jax.ShapeDtypeStruct((b, rows, LANES), _U32)],
        interpret=interpret,
    )(halo_start.astype(_I32), sp.reshape(b, rows, LANES), adj)[0]
    return sp, packed.reshape(b, npad)


def _tail2_kernel(len_ref, lo_ref, d_ref, ph_ref, ps_ref, ln_ref, dist_ref,
                  *, n, base, payload_bytes, max_match, min_emit, lazy):
    """Two-candidate-field tail: distance-1 runs merge into the HASH
    field, both fields extend independently (extension chains need a
    coherent single-source distance field — ARCHITECTURE §10 /
    lz.best_matches extend docstring), then suffix wins on (len, dist)
    and the clamp/heuristic/lazy epilogue runs once. Mirrors
    lz.best_matches(suffix=True) op for op."""
    d = d_ref[0].astype(_I32)
    length = len_ref[pl.program_id(0)]
    lo = lo_ref[pl.program_id(0)]
    row = jax.lax.broadcasted_iota(_I32, d.shape, 0)
    col = jax.lax.broadcasted_iota(_I32, d.shape, 1)
    i_idx = row * LANES + col
    end = base + length
    len_limit = end - i_idx

    def unpack(p):
        return (
            ((p >> 17) & 0x1F).astype(_I32),
            (p & 0x1FFFF).astype(_I32),
            (p >> 22) == 1,
        )

    ln, dist, capped = unpack(ph_ref[0])
    ln_s, dist_s, capped_s = unpack(ps_ref[0])

    # ---- distance-1 runs (into the hash field, as in the XLA path) ----
    prev = _shift_right_flat(d, 1)
    eq = jnp.logical_and(d == prev, i_idx >= 1)
    cnt = eq.astype(_I32)
    full = eq
    s = 1
    while s < n:
        cnt_r = _shift_left_flat(cnt, s)
        full_r = _shift_left_flat(full.astype(_I32), s) == 1
        cnt = jnp.where(full, cnt + cnt_r, cnt)
        full = jnp.logical_and(full, full_r)
        s *= 2
    l3 = jnp.where((i_idx - 1) >= lo, cnt, 0)
    run_wins = jnp.logical_or(l3 > ln, jnp.logical_and(l3 == ln, dist > 1))
    dist = jnp.where(run_wins, 1, dist)
    capped = jnp.logical_and(~run_wins, capped)
    ln = jnp.where(run_wins, l3, ln)

    # ---- extension doubling, each field separately ----
    def extend(ln, dist, capped):
        cap = payload_bytes
        while cap < max_match:
            ln_next = _shift_left_flat(ln, cap)
            dist_next = _shift_left_flat(dist, cap)
            cap_next = _shift_left_flat(capped.astype(_I32), cap) == 1
            chain = jnp.logical_and(capped, dist_next == dist)
            ln = jnp.where(chain, cap + jnp.where(ln_next > 0, ln_next, 0), ln)
            capped = jnp.logical_and(chain, cap_next)
            cap *= 2
        return ln, dist, capped

    ln, dist, capped = extend(ln, dist, capped)
    ln_s, dist_s, _ = extend(ln_s, dist_s, capped_s)
    wins = jnp.logical_or(
        ln_s > ln, jnp.logical_and(ln_s == ln, dist_s < dist)
    )
    ln = jnp.where(wins, ln_s, ln)
    dist = jnp.where(wins, dist_s, dist)

    ln = jnp.minimum(ln, jnp.minimum(len_limit, max_match))
    ln = jnp.where(ln >= min_emit, ln, 0)
    ln = jnp.where(jnp.logical_and(ln == 3, dist > 4096), 0, ln)
    valid_pos = jnp.logical_and(i_idx >= base, i_idx < end)
    ln = jnp.where(valid_pos, ln, 0)

    if lazy:
        ln_next = _shift_left_flat(ln, 1)
        demote = jnp.logical_and(ln > 0, jnp.logical_and(ln < 32, ln_next > ln))
        ln = jnp.where(demote, 0, ln)

    ln_ref[0] = ln
    dist_ref[0] = dist


def match_tail2_pallas(data_u8, packed_hash_pos, packed_suffix_pos, lengths,
                       halo_start, *, base, payload_bytes, max_match,
                       min_emit, lazy, interpret=False):
    """(bytes, hash candidates, suffix candidates) -> (match_len, dist)."""
    interpret = _auto_interpret(interpret)
    b, n = data_u8.shape
    rows = _rows_for(n)
    npad = rows * LANES
    if npad != n:
        data_u8 = jnp.concatenate(
            [data_u8, jnp.zeros((b, npad - n), jnp.uint8)], axis=1
        )
    kern = functools.partial(
        _tail2_kernel, n=npad, base=base, payload_bytes=payload_bytes,
        max_match=max_match, min_emit=min_emit, lazy=lazy,
    )
    vspec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    ln, dist = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vspec, vspec, vspec,
        ],
        out_specs=[vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, LANES), _I32) for _ in range(2)
        ],
        interpret=interpret,
    )(lengths.astype(_I32), halo_start.astype(_I32),
      data_u8.reshape(b, rows, LANES),
      packed_hash_pos.reshape(b, rows, LANES),
      packed_suffix_pos.reshape(b, rows, LANES))
    return ln.reshape(b, npad)[:, :n], dist.reshape(b, npad)[:, :n]


def best_matches_suffix_pallas(
    data_u8,
    lengths,
    *,
    max_dist: int,
    max_match: int,
    min_emit: int,
    base: int = 0,
    halo_start=None,
    lazy: bool = False,
    payload_words: int = 7,
    lags: int = 16,
    suffix_keys: int = 0,
    interpret: bool = False,
):
    """Drop-in for :func:`gzp_tpu.ops.lz.best_matches` with
    ``suffix=True`` (levels >= 6): the content-sort candidate pass, the
    shallow recency (hash) pass the hybrid keeps for extension-chain
    coherence, and the merged tail — four XLA sorts (suffix + hash
    candidate sorts, two order-restoring sorts) around the fused
    Pallas launches. Replaces the XLA formulation whose op soup took
    1100+ s to compile and ran 0.0431 GB/s at 32x128 KiB
    (scripts/rung32_level6_r5.log). ``suffix_keys`` limits the content
    sort's comparator depth (sort cost is ~0.4 ns/elem per KEY,
    scripts/probe_sortkeys.log); the carried words still feed the
    adjacent-LCP kernel, so matches stay genuine. Bit-identical to the
    XLA path (tests/test_pallas_kernels.py).
    """
    b, n_ext = data_u8.shape
    pos_bits = _pos_bits(n_ext)
    if halo_start is None:
        halo_start = jnp.zeros((b,), _I32)

    # -- suffix (content-order) candidate pass
    kw = min(suffix_keys, payload_words) if suffix_keys else payload_words
    skeys_raw, pos = build_suffix_keys_pallas(
        data_u8, payload_words=payload_words, interpret=interpret
    )
    sorted_ops = jax.lax.sort(
        (*skeys_raw[:kw], pos, *skeys_raw[kw:]),
        dimension=1, num_keys=kw + 1,
    )
    sp_s, packed_s = suffix_neighbor_pallas(
        list(sorted_ops[:kw]) + list(sorted_ops[kw + 1:]),
        sorted_ops[kw], halo_start,
        lags=lags, max_dist=max_dist, interpret=interpret,
    )
    _, packed_s_pos = jax.lax.sort((sp_s, packed_s), dimension=1, num_keys=1)

    # -- shallow hash (recency-order) pass: hash_lags=2, as in the hybrid
    key, pays = build_keys_pallas(
        data_u8, pos_bits=pos_bits, payload_words=payload_words,
        interpret=interpret,
    )
    sorted_h = jax.lax.sort((key, *pays), dimension=1, num_keys=1)
    sp_h, packed_h = neighbor_pallas(
        sorted_h[0], list(sorted_h[1:]), halo_start,
        pos_bits=pos_bits, lags=2, max_dist=max_dist, interpret=interpret,
    )
    _, packed_h_pos = jax.lax.sort((sp_h, packed_h), dimension=1, num_keys=1)

    return match_tail2_pallas(
        data_u8, packed_h_pos, packed_s_pos, lengths, halo_start,
        base=base, payload_bytes=4 * payload_words, max_match=max_match,
        min_emit=min_emit, lazy=lazy, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Full matcher: XLA sorts + Pallas everything-else
# ---------------------------------------------------------------------------


def best_matches_pallas(
    data_u8,
    lengths,
    *,
    max_dist: int,
    max_match: int,
    min_emit: int,
    base: int = 0,
    halo_start=None,
    lazy: bool = False,
    payload_words: int = 3,
    lags: int = 2,
    interpret: bool = False,
):
    """Drop-in for :func:`gzp_tpu.ops.lz.best_matches` (hash matcher,
    no hash3/suffix/sampling) with the op soup fused into three Pallas
    launches. Bit-identical output (tests/test_lz_pallas.py)."""
    b, n_ext = data_u8.shape
    pos_bits = _pos_bits(n_ext)
    if halo_start is None:
        halo_start = jnp.zeros((b,), _I32)
    key, pays = build_keys_pallas(
        data_u8, pos_bits=pos_bits, payload_words=payload_words,
        interpret=interpret,
    )
    sorted_ops = jax.lax.sort((key, *pays), dimension=1, num_keys=1)
    sp, packed = neighbor_pallas(
        sorted_ops[0], list(sorted_ops[1:]), halo_start,
        pos_bits=pos_bits, lags=lags, max_dist=max_dist,
        interpret=interpret,
    )
    _, packed_pos = jax.lax.sort((sp, packed), dimension=1, num_keys=1)
    ln, dist = match_tail_pallas(
        data_u8, packed_pos, lengths, halo_start, base=base,
        payload_bytes=4 * payload_words, max_match=max_match,
        min_emit=min_emit, lazy=lazy, interpret=interpret,
    )
    return ln, dist
