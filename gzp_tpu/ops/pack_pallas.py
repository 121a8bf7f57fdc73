"""Pallas TPU kernel: the sortscan packer's pre-sort pipeline in VMEM.

The round-4 ``pack_entries_sortscan`` (gzp_tpu.ops.deflate_kernel)
assembles the DEFLATE bit stream with zero scatters: a width cumsum
gives every entry's absolute bit position, a segmented OR-scan builds
each output word's value, and ONE 2-operand sort places (word, value)
pairs. Under XLA the cumsum and the segmented scan each lower to
~log2(N) HBM round-trips over [B, N] u32 arrays plus a dozen
elementwise passes — measured together at ~1-2 ns/B (ARCHITECTURE §8),
all of it memory traffic, none of it compute-bound.

This kernel runs that whole pre-sort pipeline (cumsum -> bit phases ->
segment flags -> segmented OR-scan -> sort keys) in ONE pass per block
with every intermediate VMEM-resident: HBM traffic drops to reading
(bits, nbits) once and writing (key, payload, total_bits) once. The
placement sort itself stays in XLA (``jax.lax.sort``) — per the
round-4 Mosaic bisection (ARCHITECTURE §7) Pallas cannot address the
LANE dimension dynamically, so sort-based placement remains the only
vectorizable option; this kernel is the "fused emit+pack"-adjacent
production kernel the round-4 verdict asked for (VERDICT r4 task 2),
scoped to the provably-compilable construct space: static lane rolls,
sublane-regular layouts, elementwise u32 ops.

Scan construction: entries are laid out row-major on a (R, 128) tile
(lanes minor). Both scans are two-level — a 7-step log-shift scan along
lanes, a row-aggregate scan along sublanes (log2(R) steps), then a
row-offset broadcast. ``jnp.cumsum`` has no Pallas lowering (probe log
scripts/probe_mosaic.log), so the log-shift ladders are written by
hand with ``pltpu.roll`` + iota masks.

Reference role: the serial bit writer inside zlib-ng/libdeflate
(reference Cargo.toml:28-52) — rebuilt as a parallel scan because TPU
has no scalar bit-buffer loop worth running (ARCHITECTURE §6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
_I32 = jnp.int32

LANES = 128


def _shift_right_lanes(x, s):
    """out[r, c] = x[r, c-s] (zeros shifted in): roll + mask, lane axis."""
    rolled = pltpu.roll(x, s, 1)
    col = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    return jnp.where(col >= s, rolled, jnp.zeros_like(x))


def _shift_right_rows(x, s):
    """out[r, c] = x[r-s, c] (zeros shifted in): roll + mask, sublane axis."""
    rolled = pltpu.roll(x, s, 0)
    row = jax.lax.broadcasted_iota(_I32, x.shape, 0)
    return jnp.where(row >= s, rolled, jnp.zeros_like(x))


def _kernel(bits_ref, nbits_ref, key_ref, val_ref, *, rows, base_bits, e_valid):
    v = bits_ref[0]
    nb = nbits_ref[0]
    inf = jnp.uint32(0xFFFFFFFF)

    # ---- inclusive cumsum of widths over row-major (R, 128) ----
    x = nb
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = x + _shift_right_lanes(x, s)
    # row totals, inclusive-scanned down the sublanes
    tot = jax.lax.broadcast_in_dim(x[:, LANES - 1], x.shape, (0,))
    run = tot
    s = 1
    while s < rows:
        run = run + _shift_right_rows(run, s)
        s *= 2
    # exclusive row offset = inclusive run shifted down one row
    row_off = _shift_right_rows(run, 1)
    csum = x + row_off  # inclusive cumsum over the flattened order

    bitpos = base_bits + csum - nb
    cnt = jnp.bitwise_and(bitpos, 31).astype(_U32)
    w = jnp.right_shift(bitpos, 5).astype(_U32)
    lo = v << cnt
    hi = (v >> (jnp.uint32(31) - cnt)) >> jnp.uint32(1)
    endw = jnp.right_shift(bitpos + nb, 5).astype(_U32)
    flush = endw > w

    # start[i] = flush[i-1] (True at i == 0), over the flattened order
    fl = flush.astype(_U32)
    fl_shift = _shift_right_lanes(fl, 1)
    # lane 0 of each row takes the previous row's lane-127 value
    prev_row_last = _shift_right_rows(
        jax.lax.broadcast_in_dim(fl[:, LANES - 1], fl.shape, (0,)), 1
    )
    col = jax.lax.broadcasted_iota(_I32, fl.shape, 1)
    row = jax.lax.broadcasted_iota(_I32, fl.shape, 0)
    fl_shift = jnp.where(col == 0, prev_row_last, fl_shift)
    first = jnp.logical_and(row == 0, col == 0)
    start = jnp.logical_or(fl_shift == 1, first)

    hi_shift = _shift_right_lanes(hi, 1)
    prev_row_hi = _shift_right_rows(
        jax.lax.broadcast_in_dim(hi[:, LANES - 1], hi.shape, (0,)), 1
    )
    hi_prev = jnp.where(col == 0, prev_row_hi, hi_shift)
    c = lo | jnp.where(start, hi_prev, jnp.uint32(0))

    # ---- segmented OR-scan of (c, start) over the flattened order ----
    # operator: (v1,r1) . (v2,r2) = (r2 ? v2 : v1|v2, r1|r2)
    val = c
    res = start

    def seg_step_lanes(val, res, s):
        v_l = _shift_right_lanes(val, s)
        r_l = _shift_right_lanes(res.astype(_U32), s) == 1
        # elements with col < s combine with identity (v=0, r=True):
        # value stays, reset stays
        edge = col < s
        v_new = jnp.where(res, val, jnp.where(edge, val, v_l | val))
        r_new = jnp.logical_or(res, jnp.logical_and(~edge, r_l))
        return v_new, r_new

    for s in (1, 2, 4, 8, 16, 32, 64):
        val, res = seg_step_lanes(val, res, s)
    # row-level combine down sublanes: each row's aggregate is its
    # lane-127 (v, r); propagate prefixes of row aggregates, then apply
    # to rows whose own prefix (lane c) has not hit a reset yet
    rv = jax.lax.broadcast_in_dim(val[:, LANES - 1], val.shape, (0,))
    rr = jax.lax.broadcast_in_dim(res[:, LANES - 1], res.shape, (0,))
    s = 1
    while s < rows:
        rv_s = _shift_right_rows(rv, s)
        rr_s = _shift_right_rows(rr.astype(_U32), s) == 1
        edge = row < s
        rv = jnp.where(rr, rv, jnp.where(edge, rv, rv_s | rv))
        rr = jnp.logical_or(rr, jnp.logical_and(~edge, rr_s))
        s *= 2
    # prefix entering each row = previous row's inclusive aggregate
    pv = _shift_right_rows(rv, 1)
    pr_u = _shift_right_rows(rr.astype(_U32), 1)
    pr = jnp.logical_or(pr_u == 1, row == 0)  # row 0 enters with identity
    del pr  # value-only apply: identity prefix value is 0
    val = jnp.where(res, val, pv | val)

    # ---- sort keys ----
    idx = row * LANES + col
    # the appended zero-width tail entry sits at idx == e_valid - 1;
    # its bitpos equals total_bits and its scan value is the final
    # partial word
    key = jnp.where(flush, w, inf)
    is_tail = idx == (e_valid - 1)
    tail_valid = jnp.bitwise_and(bitpos, 31) > 0
    key = jnp.where(is_tail, jnp.where(tail_valid, w, inf), key)
    key = jnp.where(idx > (e_valid - 1), inf, key)

    key_ref[0] = key
    val_ref[0] = val


def _auto_interpret(flag: bool) -> bool:
    """Pallas has no CPU lowering: on the cpu backend (the virtual test
    mesh) run the kernel in interpret mode automatically."""
    return flag or jax.default_backend() == "cpu"


def pack_prescan_pallas(bits, nbits, base_bits: int, interpret: bool = False):
    """Fused pre-sort pipeline of :func:`pack_entries_sortscan`.

    Args:
      bits:  [B, E] uint32 entry values (< 2**31)
      nbits: [B, E] int32 entry widths in [0, 31]
      base_bits: static bit offset of entry 0

    Returns (key [B, Ep] uint32, payload [B, Ep] uint32,
    total_bits [B] int32) where Ep = E+1 padded up to a whole (8, 128)
    tile; trailing pad carries key == 0xFFFFFFFF so the caller's
    placement sort drops it like the XLA version's pad.
    """
    interpret = _auto_interpret(interpret)
    b, e = bits.shape
    ev = e + 1  # + zero-width tail entry
    rows = max(-(-ev // LANES), 8)
    rows = -(-rows // 8) * 8  # sublane multiple
    ep = rows * LANES
    v = jnp.concatenate([bits, jnp.zeros((b, ep - e), _U32)], axis=1)
    nb = jnp.concatenate([nbits, jnp.zeros((b, ep - e), _I32)], axis=1)
    v3 = v.reshape(b, rows, LANES)
    nb3 = nb.reshape(b, rows, LANES)

    kern = functools.partial(
        _kernel, rows=rows, base_bits=base_bits, e_valid=ev
    )
    key3, val3 = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, LANES), _U32),
            jax.ShapeDtypeStruct((b, rows, LANES), _U32),
        ],
        interpret=interpret,
    )(v3, nb3)
    # total bits is a cheap XLA reduction (a (1, 1) SMEM output block
    # fails the Mosaic block-shape divisibility rule)
    total_bits = base_bits + jnp.sum(nbits, axis=1)
    return (
        key3.reshape(b, ep),
        val3.reshape(b, ep),
        total_bits.astype(_I32),
    )


def pack_entries_sortscan_pallas(
    bits, nbits, base_bits: int, out_words: int, interpret: bool = False
):
    """Drop-in replacement for ``pack_entries_sortscan`` with the
    pre-sort pipeline fused into the Pallas kernel above; bit-identical
    output contract (tests/test_pack_sortscan.py covers equivalence)."""
    b, _ = bits.shape
    inf = jnp.uint32(0xFFFFFFFF)
    key, payload, total_bits = pack_prescan_pallas(
        bits, nbits, base_bits, interpret=interpret
    )
    bw = base_bits // 32  # static header region: dummy zero words
    if bw:
        dk = jnp.broadcast_to(jnp.arange(bw, dtype=_U32)[None, :], (b, bw))
        key = jnp.concatenate([dk, key], axis=1)
        payload = jnp.concatenate([jnp.zeros((b, bw), _U32), payload], axis=1)
    k = key.shape[1]
    if k < out_words:
        pad = out_words - k
        key = jnp.concatenate([key, jnp.full((b, pad), inf, _U32)], axis=1)
        payload = jnp.concatenate([payload, jnp.zeros((b, pad), _U32)], axis=1)
    _, sorted_vals = jax.lax.sort((key, payload), dimension=1, num_keys=1)
    words = sorted_vals[:, :out_words]
    n_words = (total_bits + 31) >> 5
    keep = jnp.arange(out_words, dtype=_I32)[None, :] < n_words[:, None]
    return jnp.where(keep, words, jnp.uint32(0)), total_bits
