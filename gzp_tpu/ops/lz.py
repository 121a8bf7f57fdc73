"""Batched LZ77 match finding and parallel greedy parse.

TPU-native replacement for the hash-chain match finders inside zlib-ng /
libdeflate (the reference's L0 codec backends, reference Cargo.toml:28-52).
Everything operates on a batch of independent blocks ``[B, N]`` with static
shapes; there is no per-byte sequential loop anywhere:

* **Candidate discovery** is sort-based: a 32-bit key packs
  ``(hash(4 bytes) << 17) | position``; after an in-block sort, the nearest
  (and second-nearest) previous occurrence of each hash is the left
  neighbor in sorted order. This replaces data-dependent hash-chain walks
  with one parallel sort + gathers.
* **Run detection** (distance-1 matches, the RLE workhorse) uses a
  segmented associative scan over byte-equality, capturing up to
  258-byte runs that the capped gather-LCP would truncate.
* **Match verification/extension** compares 4-byte words via gathers with
  a first-mismatch byte refinement (lengths up to ``4*lcp_words`` bytes).
* **Greedy parse** is windowed: each ``window``-byte span of a block is
  parsed greedily and independently (matches are clamped at window ends;
  match *sources* may still reach anywhere back in the block), which turns
  the inherently sequential greedy walk into a pointer-doubling mark
  propagation: log2(window) rounds of gather+scatter.

The result is a compacted per-block token list (literal / match-with-
length-and-distance) in stream order, ready for format-specific emission.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
_I32 = jnp.int32

HASH_MUL = np.uint32(0x9E3779B1)  # Fibonacci hashing constant


def _pos_bits(n: int) -> int:
    """Bits needed to index ``n`` positions (the sort key packs
    ``hash << pos_bits | pos`` into 32 bits; bigger blocks get fewer hash
    bits)."""
    return max((n - 1).bit_length(), 1)


def _rows(b: int) -> jax.Array:
    return jnp.arange(b, dtype=_I32)[:, None]


def words4(data_u8: jax.Array) -> jax.Array:
    """[B, N] uint8 -> [B, N] uint32 little-endian 4-byte word starting at
    each position (zero padded past the end)."""
    b, n = data_u8.shape
    d = data_u8.astype(_U32)
    pad = jnp.zeros((b, 3), dtype=_U32)
    dp = jnp.concatenate([d, pad], axis=1)
    return (
        dp[:, 0:n]
        | (dp[:, 1 : n + 1] << 8)
        | (dp[:, 2 : n + 2] << 16)
        | (dp[:, 3 : n + 3] << 24)
    )


def hash_positions(w4: jax.Array, hash_bits: int) -> jax.Array:
    """Multiplicative hash of each 4-byte window -> [B, N] uint32 in
    [0, 2**hash_bits)."""
    return (w4 * HASH_MUL) >> np.uint32(32 - hash_bits)


def prev_occurrences(w4: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Nearest and second-nearest previous positions with the same hash.

    Returns (cand1, cand2), each ``[B, N]`` int32, -1 where absent.
    """
    b, n = w4.shape
    pos_bits = _pos_bits(n)
    h = hash_positions(w4, 32 - pos_bits)
    pos = jnp.arange(n, dtype=_U32)[None, :]
    key = (h << np.uint32(pos_bits)) | pos
    skey = jnp.sort(key, axis=1)
    sh = (skey >> np.uint32(pos_bits)).astype(_I32)
    sp = (skey & np.uint32((1 << pos_bits) - 1)).astype(_I32)

    minus1 = jnp.full((b, 1), -1, dtype=_I32)
    prev_pos1 = jnp.concatenate([minus1, sp[:, :-1]], axis=1)
    prev_h1 = jnp.concatenate([jnp.full((b, 1), -1, _I32), sh[:, :-1]], axis=1)
    prev_pos2 = jnp.concatenate([minus1, minus1, sp[:, :-2]], axis=1)
    prev_h2 = jnp.concatenate(
        [jnp.full((b, 2), -1, _I32), sh[:, :-2]], axis=1
    )
    c1_sorted = jnp.where(prev_h1 == sh, prev_pos1, -1)
    c2_sorted = jnp.where(prev_h2 == sh, prev_pos2, -1)

    rows = _rows(b)
    cand1 = jnp.full((b, n), -1, _I32).at[rows, sp].set(c1_sorted)
    cand2 = jnp.full((b, n), -1, _I32).at[rows, sp].set(c2_sorted)
    return cand1, cand2


def lcp_via_words(
    w4: jax.Array, i_idx: jax.Array, j_pos: jax.Array, valid: jax.Array, max_words: int
) -> jax.Array:
    """Byte LCP of the suffixes at ``i_idx`` and ``j_pos`` (capped at
    ``4*max_words``), compared word-at-a-time with a trailing-byte refinement
    on the first mismatching word. Out-of-range gathers clip; callers must
    clamp the result by the real block length."""
    n = w4.shape[1]
    lcp0 = jnp.zeros(j_pos.shape, dtype=_I32)

    def body(k, carry):
        lcp, alive = carry
        off = 4 * k
        wi = jnp.take_along_axis(w4, jnp.clip(i_idx + off, 0, n - 1), axis=1, mode="clip")
        wj = jnp.take_along_axis(w4, jnp.clip(j_pos + off, 0, n - 1), axis=1, mode="clip")
        x = wi ^ wj
        eq = x == 0
        tz = jnp.where(
            (x & 0xFF) != 0,
            0,
            jnp.where((x & 0xFFFF) != 0, 1, jnp.where((x & 0xFFFFFF) != 0, 2, 3)),
        ).astype(_I32)
        lcp = lcp + jnp.where(alive, jnp.where(eq, 4, tz), 0)
        alive = jnp.logical_and(alive, eq)
        return lcp, alive

    # rolled loop: keeps the compiled graph small (the unrolled form was a
    # dominant share of a 343 s whole-encoder compile in round 1)
    lcp, _ = jax.lax.fori_loop(0, max_words, body, (lcp0, valid))
    return lcp


def run_lengths(data_u8: jax.Array) -> jax.Array:
    """``run[i]`` = number of consecutive positions p >= i with
    ``data[p] == data[p-1]`` — i.e. the match length of the distance-1
    candidate at i. Computed with a reversed segmented-count associative
    scan (no sequential loop)."""
    b, n = data_u8.shape
    d = data_u8.astype(_I32)
    eq = jnp.concatenate(
        [jnp.zeros((b, 1), dtype=jnp.bool_), d[:, 1:] == d[:, :-1]], axis=1
    )
    rev = eq[:, ::-1]
    cnt = rev.astype(_I32)
    reset = jnp.logical_not(rev)

    def op(a, bb):
        c1, r1 = a
        c2, r2 = bb
        return jnp.where(r2, c2, c1 + c2), jnp.logical_or(r1, r2)

    cnt_scan, _ = jax.lax.associative_scan(op, (cnt, reset), axis=1)
    return cnt_scan[:, ::-1]


def best_matches(
    data_u8: jax.Array,
    lengths: jax.Array,
    *,
    max_dist: int,
    max_match: int,
    min_emit: int,
    max_words: int = 8,
    base: int = 0,
    halo_start: jax.Array | None = None,
    lazy: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Best match (length, distance) at every position of every block.

    ``data_u8`` is ``[B, base + N]``: an optional ``base``-byte halo (the
    previous block's trailing dictionary, reference
    src/par/compress.rs:417-423) followed by the block payload. Valid
    payload spans ``[base, base + length)``; match *sources* may reach
    back to ``halo_start[b]`` (=``base - dict_len``).

    Returns ``(match_len, match_dist)`` each ``[B, base+N]`` int32 with
    ``match_len == 0`` where the position should be a literal. Lengths are
    clamped to the payload end and ``max_match``; distances respect
    ``max_dist`` (32768 for DEFLATE, 65535 for snappy).

    ``lazy=True`` applies zlib's lazy-match heuristic: a match is demoted
    to a literal when the next position holds a strictly longer match —
    local, so it parallelizes for free.
    """
    b, n_ext = data_u8.shape
    w4 = words4(data_u8)
    i_idx = jnp.broadcast_to(jnp.arange(n_ext, dtype=_I32)[None, :], (b, n_ext))
    end = base + lengths[:, None]
    len_limit = end - i_idx  # bytes remaining at each position
    if halo_start is None:
        lo = jnp.zeros((b, 1), _I32)
    else:
        lo = halo_start[:, None].astype(_I32)

    cand1, cand2 = prev_occurrences(w4)

    def score_candidate(cand):
        valid = jnp.logical_and(cand >= lo, (i_idx - cand) <= max_dist)
        lcp = lcp_via_words(w4, i_idx, cand, valid, max_words)
        lcp = jnp.where(valid, lcp, 0)
        dist = i_idx - cand
        return lcp, dist

    l1, d1 = score_candidate(cand1)
    l2, d2 = score_candidate(cand2)
    # distance-1 run candidate (full 258-length runs via scan)
    l3 = run_lengths(data_u8)
    l3 = jnp.where((i_idx - 1) >= lo, l3, 0)
    d3 = jnp.ones_like(i_idx)

    # pick by longest length, tie-break on smaller distance
    def better(la, da, lb, db):
        a_wins = jnp.logical_or(la > lb, jnp.logical_and(la == lb, da < db))
        return jnp.where(a_wins, la, lb), jnp.where(a_wins, da, db)

    ln, dist = better(l1, d1, l2, d2)
    ln, dist = better(ln, dist, l3, d3)

    ln = jnp.minimum(ln, jnp.minimum(len_limit, max_match))
    ln = jnp.where(ln >= min_emit, ln, 0)
    valid_pos = jnp.logical_and(i_idx >= base, i_idx < end)
    ln = jnp.where(valid_pos, ln, 0)

    if lazy:
        ln_next = jnp.concatenate([ln[:, 1:], jnp.zeros((b, 1), _I32)], axis=1)
        demote = jnp.logical_and(ln > 0, jnp.logical_and(ln < 32, ln_next > ln))
        ln = jnp.where(demote, 0, ln)
    return ln, dist


def parse_tokens(
    match_len: jax.Array,
    match_dist: jax.Array,
    lengths: jax.Array,
    *,
    window: int,
    min_emit: int,
    base: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Windowed greedy parse via pointer-doubling mark propagation.

    Every ``window``-aligned position seeds a parse; matches are clamped at
    window boundaries so walks stay inside their window and token starts
    self-synchronize at window edges. After log2(window) doubling rounds the
    marked set is exactly the token-start set of the greedy parse.

    Returns ``(tok_pos, tok_len, tok_dist, ntok)``: token arrays ``[B, N+1]``
    compacted in stream order (``tok_len == 0`` -> literal at ``tok_pos``),
    and per-block token counts ``[B]``.
    """
    b, n = match_len.shape
    assert window & (window - 1) == 0, "window must be a power of two"
    assert base % window == 0, "halo must be window-aligned"
    rounds = window.bit_length() - 1
    i_idx = jnp.broadcast_to(jnp.arange(n, dtype=_I32)[None, :], (b, n))
    w_end = (i_idx // window + 1) * window

    end = base + lengths[:, None]
    l = jnp.minimum(match_len, w_end - i_idx)
    l = jnp.where(l >= min_emit, l, 0)
    step = jnp.where(l > 0, l, 1)
    nxt = i_idx + step  # <= w_end <= n

    rows = _rows(b)
    sink = jnp.full((b, 1), n, dtype=_I32)
    j_arr = jnp.concatenate([nxt, sink], axis=1)  # [B, N+1], J[n] = n

    seeds = jnp.logical_and(
        jnp.logical_and(i_idx % window == 0, i_idx >= base), i_idx < end
    )
    marked = jnp.concatenate(
        [seeds.astype(_I32), jnp.zeros((b, 1), dtype=_I32)], axis=1
    )
    def body(_, carry):
        marked, j_arr = carry
        marked = marked.at[rows, j_arr].max(marked)
        j_arr = jnp.take_along_axis(j_arr, j_arr, axis=1)
        return marked, j_arr

    marked, j_arr = jax.lax.fori_loop(0, rounds, body, (marked, j_arr))

    valid = jnp.logical_and(
        marked[:, :n] == 1, jnp.logical_and(i_idx >= base, i_idx < end)
    )

    tidx = jnp.cumsum(valid.astype(_I32), axis=1) - 1
    ntok = jnp.sum(valid.astype(_I32), axis=1)
    scat = jnp.where(valid, tidx, n)  # n = drop slot in [B, N+1] outputs

    tok_pos = jnp.zeros((b, n + 1), _I32).at[rows, scat].set(i_idx)
    tok_len = jnp.zeros((b, n + 1), _I32).at[rows, scat].set(l)
    tok_dist = jnp.zeros((b, n + 1), _I32).at[rows, scat].set(match_dist)
    return tok_pos, tok_len, tok_dist, ntok
