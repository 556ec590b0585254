"""Stride-level hierarchy + kernel-map construction, fully on device.

Replaces MinkowskiEngine's coordinate manager. The reference model
(/root/reference/model/resunet.py:173-232) runs 18 sparse convolutions whose
geometry (which input voxel feeds which output voxel under which kernel
offset) ME resolves with C++ hash maps per call. Here the full geometry of a
forward pass — every stride level's coordinates and every conv's gather
table — is built once per batch as one static-shape XLA subprogram:

  * level coords: floor-divide + composite-key sort + first-occurrence dedup
  * kernel maps:  vectorized lexicographic binary search per kernel offset

Every map is a pure GATHER table: kmap[k, i] = input row for output i under
offset k (or -1). Because for a fixed offset each output voxel has at most
one contributing input, sparse conv needs no scatter at all — see
sparse_ops.sparse_conv.

ME transpose-conv parity note: ME computes out[f] += in[c] @ W[d] for
f = c + d·s·dil; we gather in[f + d'·s·dil] @ W'[d'], so W'[d'] = W[-d'].
The torch checkpoint importer flips transpose kernels accordingly.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .coords import coord_keys, kernel_offsets, lookup, sort_by_keys
from .types import (INVALID_BATCH, FusedMap, LevelCoords, SparseGraph,
                    map_key)

# Off-TPU check legs set this (gcl_tpu.testing.kernel_interpret) so
# method='auto' still selects the fused Mosaic conv path, traced in
# Pallas interpret mode — kernel breakage then fails on CPU too.
FORCE_FUSED_INTERPRET = False


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """Static description of one sparse convolution's geometry."""

    name: str
    in_stride: int
    out_stride: int
    kernel_size: int
    dilation: int = 1

    @property
    def offset_scale(self) -> int:
        # Offsets are in units of the finer of the two tensor strides
        # (matches ME: conv offsets in input-stride units, transpose-conv
        # offsets in output-stride units).
        return min(self.in_stride, self.out_stride) * self.dilation

    @property
    def key(self) -> str:
        return map_key(self.in_stride, self.out_stride, self.kernel_size,
                       self.dilation)

    @property
    def is_identity_map(self) -> bool:
        # 1x1x1 convs on the same level need no kernel map at all.
        return (self.kernel_size == 1 and self.in_stride == self.out_stride)


def _index_level(coords: jax.Array, mask: jax.Array,
                 stride: int) -> LevelCoords:
    """Build the sorted-key index of an existing coordinate set."""
    hi, lo = coord_keys(coords, stride)
    perm0 = jnp.arange(coords.shape[0], dtype=jnp.int32)
    hi_s, lo_s, perm = sort_by_keys(hi, lo, perm0)
    return LevelCoords(coords, mask, hi_s, lo_s, perm)


_SEN = jnp.int32(0x7FFFFFFF)


def _index_level_sorted(coords: jax.Array, mask: jax.Array) -> LevelCoords:
    """Sorted-key index of level-0 coords that are ALREADY cloud-blocked
    and per-cloud key-sorted (voxelize_per_cloud output: ascending cloud
    blocks, each key-sorted, padding inline at block tails).

    The globally-sorted view is then just the valid rows compacted to the
    front — one cumsum + scatter instead of an O(N log N) sort.
    """
    hi, lo = coord_keys(coords, 1)
    n = coords.shape[0]
    slot = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask, slot, n)
    khi = jnp.full((n + 1,), _SEN, jnp.int32).at[slot].set(
        hi, mode="drop")[:n]
    klo = jnp.full((n + 1,), _SEN, jnp.int32).at[slot].set(
        lo, mode="drop")[:n]
    perm = jnp.full((n + 1,), n - 1, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:n]
    return LevelCoords(coords, mask, khi, klo, perm)


# NOTE: lex order is NOT preserved under per-component floor division
# ((x=-6,y=6) < (x=-5,y=2) but both map to x//2=-3 with y descending), so
# coarse keys of the sorted fine keys are NOT sorted — downsampling needs
# its own sort. Only the compacted OUTPUT of that sort is key-ordered,
# which lets _downsample_level skip a second indexing sort.


def _downsample_level(coords0: jax.Array, mask0: jax.Array, stride: int,
                      cap: int, n_clouds: int | None = None,
                      align: int = 256) -> LevelCoords:
    """Unique coords at `stride` derived from level-0 coordinates.

    Matches ME's tensor-stride semantics: coarse coords are the distinct
    values of floor(c / stride) * stride. (floor(floor(x/a)/b) ==
    floor(x/(ab)), so deriving every level straight from level 0 equals
    chaining per-conv strides.)

    With ``n_clouds`` set, each cloud's rows start at an ``align``-aligned
    base (pad rows inline between blocks) instead of one globally
    compacted run. Conv output TILEs then never span two clouds and the
    fused conv windows never bridge a cloud boundary — the window
    chunk-count tail this removes costs a full replay of the per-offset
    gather pass per extra chunk (pallas_conv). The caller must budget
    ``cap >= total + n_clouds * align`` slack; the dead pad tiles are
    skipped in-kernel (nch == 0).
    """
    b = coords0[:, 0:1]
    xyz = (coords0[:, 1:4] // stride) * stride
    coords = jnp.concatenate([b, xyz], axis=1)
    if n_clouds is not None:
        # Single-int32 sort key: under the blocked gate clouds are < 31
        # and coords sit inside the conv key window (voxelize drops the
        # rest), so (cloud, x/s, y/s, z/s) packs into <= 31 bits — the
        # dedup sort drops from 3 int32 operands to 2. Key order equals
        # (hi, lo) lex order for in-window coords; the emitted key index
        # is recomputed from the sorted coords so outputs are identical.
        import math as _m
        los, bits = [], []
        for half in (512, 512, 64):
            lo_c = _m.floor(-half / stride)
            hi_c = _m.floor((half - 1) / stride)
            los.append(lo_c)
            bits.append(max(1, (hi_c - lo_c).bit_length()))
        if 5 + sum(bits) > 31:
            # stride too small for the packed single-key dedup: distinct
            # voxels would alias. (stride >= 2 fits; a stride-1 caller
            # must use the two-key path below.)
            raise ValueError(
                f"packed dedup key needs {5 + sum(bits)} bits > 31 "
                f"(stride={stride}, per-axis bits={bits}); use "
                "n_clouds=None (two-key sort) for this stride")
        q = coords[:, 1:4] // stride
        u = q - jnp.asarray(los, jnp.int32)[None, :]
        key = coords[:, 0]
        for a in range(3):
            key = (key << bits[a]) | u[:, a]
        sen = jnp.int32(0x7FFFFFFF)
        in_r = jnp.all((u >= 0) & (u < (1 << jnp.asarray(bits))[None, :]),
                       axis=1)
        ok = in_r & (coords[:, 0] < 31)
        key = jnp.where(ok, key, sen)
        iota = jnp.arange(key.shape[0], dtype=jnp.int32)
        key_s, perm = jax.lax.sort((key, iota), num_keys=1,
                                   is_stable=True)
        coords_s = coords[perm]
        hi_s, lo_s = coord_keys(coords_s, stride)
        first = jnp.concatenate([
            jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
        valid = first & (key_s != sen)
    else:
        hi, lo = coord_keys(coords, stride)
        hi_s, lo_s, coords_s = sort_by_keys(hi, lo, coords)
        first = jnp.concatenate([
            jnp.ones((1,), bool),
            (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
        ])
        valid = first & (coords_s[:, 0] != INVALID_BATCH)
    vcum = jnp.cumsum(valid.astype(jnp.int32))  # inclusive valid count
    vr = vcum - 1                               # global valid rank
    if n_clouds is None:
        slot = jnp.where(valid & (vr < cap), vr, cap)
        cslot = slot
        kept_slot = jnp.minimum(vr, cap - 1)
    else:
        # aligned per-cloud bases: cloud c's kept rows occupy
        # [base[c], base[c] + count[c]) with base[c] a multiple of align
        b_s = coords_s[:, 0]  # ascending (keys are cloud-major)
        ends = jnp.searchsorted(
            b_s, jnp.arange(n_clouds, dtype=b_s.dtype), side="right")
        vcum0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), vcum])
        prefix = vcum0[ends]                       # valid rows in clouds <= c
        vstart = jnp.concatenate([jnp.zeros((1,), jnp.int32), prefix[:-1]])
        counts = prefix - vstart
        sizes = -(-counts // align) * align
        base = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(sizes)[:-1].astype(jnp.int32),
        ])
        delta = base - vstart                      # [n_clouds]
        d_row = jnp.take(delta, jnp.clip(b_s, 0, n_clouds - 1))
        blocked = vr + d_row
        keep = valid & (blocked < cap)
        slot = jnp.where(keep, blocked, cap)
        # compact key index: kept rows stay a contiguous prefix in rank
        # order (bases are increasing, so drops are a suffix)
        cslot = jnp.where(keep, vr, cap)
        kept_slot = jnp.minimum(blocked, cap - 1)
    # Packed two-column scatter: a [cap, 4] T(4,128)-layout row scatter
    # costs ~8x a single-column one on TPU (xprof: 20.5 ms vs 2.5 ms at
    # bench scale), so pack (b, x) and (y, z) into one int32 each. b's
    # INVALID_BATCH sentinel maps to 0x7FFF in 16 bits; coordinates are
    # far below the 16-bit range the packed conv keys already require.
    b16 = jnp.minimum(coords_s[:, 0], 0x7FFF)
    p1s = (b16 << 16) | (coords_s[:, 1] & 0xFFFF)
    p2s = (coords_s[:, 2] << 16) | (coords_s[:, 3] & 0xFFFF)
    p1 = jnp.full((cap + 1,), 0x7FFFFFFF, jnp.int32).at[slot].set(
        p1s, mode="drop")[:cap]
    p2 = jnp.full((cap + 1,), -1, jnp.int32).at[slot].set(
        p2s, mode="drop")[:cap]
    bb = p1 >> 16  # arithmetic; packed b is always >= 0
    out = jnp.stack([
        jnp.where(bb == 0x7FFF, INVALID_BATCH, bb),
        (p1 << 16) >> 16, p2 >> 16, (p2 << 16) >> 16], axis=1)
    out_mask = bb != 0x7FFF
    # the compaction is in coarse-key-sorted order, so the key index
    # needs no second sort: scatter the sorted keys into compact
    # positions; perm maps sorted position -> blocked row
    okhi = jnp.full((cap + 1,), _SEN, jnp.int32).at[cslot].set(
        hi_s, mode="drop")[:cap]
    oklo = jnp.full((cap + 1,), _SEN, jnp.int32).at[cslot].set(
        lo_s, mode="drop")[:cap]
    if n_clouds is None:
        perm = jnp.arange(cap, dtype=jnp.int32)
    else:
        perm = jnp.full((cap + 1,), cap - 1, jnp.int32).at[cslot].set(
            kept_slot, mode="drop")[:cap]
    return LevelCoords(out, out_mask, okhi, oklo, perm)


def _build_kmap_sortjoin(out_level: LevelCoords, in_level: LevelCoords,
                         in_stride: int, offsets: np.ndarray,
                         key_bits=None) -> jax.Array:
    """Sort-join kernel-map builder — the TPU-fast path.

    Random-access binary search runs at XLA's gather speed (~50-90M
    rows/s on v5e — hours of accumulated lookups per epoch). This builder
    instead does ONE sequential-access sort per map:

      1. pack every in-voxel and every (out-voxel + offset) query into a
         single injective int32 key (coords.pack_keys);
      2. sort [targets | queries] by (key, payload) with the payload's
         top flag bit ordering targets before equal-key queries;
      3. a last-valid associative scan carries each target's row to the
         queries that follow it; a key-equality check confirms the match;
      4. scatter matches back into the [K, N_out] gather table.

    Sorts/scans/scatters stream at memory bandwidth — no random reads.
    """
    from .coords import pack_keys, pack_query_keys, DEFAULT_KEY_BITS

    bits = key_bits or DEFAULT_KEY_BITS
    n_in = in_level.coords.shape[0]
    n_out = out_level.coords.shape[0]
    k = offsets.shape[0]
    assert k * n_out < (1 << 30), "query payload bits exhausted"

    tkeys = pack_keys(in_level.coords, in_stride, bits)
    off = jnp.asarray(offsets)
    qkeys = jax.vmap(
        lambda o: pack_query_keys(out_level.coords, o, in_stride, bits)
    )(off).reshape(-1)  # [K * N_out]

    all_keys = jnp.concatenate([tkeys, qkeys])
    # payload: targets = row index (flag bit 30 clear -> sort first
    # within equal keys); queries = flat query id | flag
    payload = jnp.concatenate([
        jnp.arange(n_in, dtype=jnp.int32),
        jnp.arange(k * n_out, dtype=jnp.int32) | jnp.int32(1 << 30),
    ])
    keys_s, pay_s = jax.lax.sort((all_keys, payload), num_keys=2)

    is_target = (pay_s & (1 << 30)) == 0
    tval = jnp.where(is_target, pay_s, -1)

    # joint last-valid scan over (key, row) pairs: each position learns
    # the most recent preceding target's key and row
    def last_valid_pair(l, r):
        kl, rl = l
        kr, rr = r
        take_r = rr >= 0
        return jnp.where(take_r, kr, kl), jnp.where(take_r, rr, rl)

    carry_key, carry_row = jax.lax.associative_scan(
        last_valid_pair, (keys_s, tval))
    match = (carry_key == keys_s) & ~is_target & (carry_row >= 0)
    row = jnp.where(match, carry_row, -1)

    qid = pay_s & jnp.int32((1 << 30) - 1)
    slot = jnp.where(is_target, k * n_out, qid)  # targets -> dump slot
    kmap_flat = jnp.full((k * n_out + 1,), -1, jnp.int32)
    kmap_flat = kmap_flat.at[slot].set(row, mode="drop")
    return kmap_flat[:k * n_out].reshape(k, n_out)


def _query_keys(out_level: LevelCoords, in_stride: int,
                offsets: np.ndarray):
    """(qhi, qlo) int32[K, N_out] lookup keys for out_coords + offsets.
    Off-lattice / padded queries carry the max sentinel key."""
    oc = out_level.coords

    def per_offset(off):
        qxyz = oc[:, 1:4] + off[None, :]
        q = jnp.concatenate([oc[:, 0:1], qxyz], axis=1)
        qh, ql = coord_keys(q, in_stride)
        if in_stride > 1:
            on_lattice = jnp.all(qxyz % in_stride == 0, axis=1)
            sent = jnp.int32(0x7FFFFFFF)
            qh = jnp.where(on_lattice, qh, sent)
            ql = jnp.where(on_lattice, ql, sent)
        return qh, ql

    return jax.vmap(per_offset)(jnp.asarray(offsets))


def _build_kmap_pallas(out_level: LevelCoords, in_level: LevelCoords,
                       in_stride: int, offsets: np.ndarray,
                       interpret: bool = False) -> jax.Array:
    """Windowed sorted merge-join on the Mosaic path (pallas_join.py) —
    replaces the global sort + scatter of the one-sort builder (~2.3 s
    per KITTI-scale step) with per-tile target windows."""
    from .pallas_join import join_kmap

    qh, ql = _query_keys(out_level, in_stride, offsets)
    return join_kmap(in_level.key_hi, in_level.key_lo, in_level.perm,
                     qh, ql, interpret=interpret)


def _fold_clouds(coords: jax.Array) -> jax.Array:
    """Fold the cloud id into [0, 31) for packed keys (PAD_CLOUD = 31 is
    reserved). The fold is injective — hence collision-free — only when
    the device batch holds at most 31 clouds: with more, clouds 31 apart
    can alias, and if the clouds between them are empty (fully padded
    tail samples) their rows can land in one conv window and produce
    false key matches. build_graph therefore only auto-selects the fused
    path when the caller declares n_clouds <= 31."""
    c = coords[:, 0]
    fc = jnp.where(c >= INVALID_BATCH, c, c % 31)
    return jnp.concatenate([fc[:, None], coords[:, 1:]], axis=1)


def _level_tkeys(level: LevelCoords, stride: int, t_pad: int) -> jax.Array:
    """[8, t_pad] stacked packed keys of a level in ORIGINAL row order,
    with 16-row SHIFT REPLICAS: row r holds keys of rows i + 16*r.

    The conv kernels' key-window DMA must start at a 128-multiple lane
    offset, which used to force window starts to 128-aligned rows (up to
    127 rows of alignment slack inside every window). Rows 1-7 of this
    array were dead padding (the DMA needs 8 int32 sublanes anyway);
    filling them with shifted copies lets a kernel realise any
    16-granular window start s by DMAing at lane base = s & ~127 and
    comparing against sublane row r = (s >> 4) & 7 — same DMA volume,
    slack cut from <=127 to <=15 rows, so the half-tile windows
    (pallas_conv) fit 1.5x narrower compare/gather widths."""
    from .coords import pack_keys

    pk = pack_keys(_fold_clouds(level.coords), stride)
    # tail pad: PAD_CLOUD base — never equals a (bit-26-set) pad query
    # key nor a valid (cloud < 31) key
    pad_const = jnp.int32(np.int64(31 << 27) - (1 << 32))
    tk = jnp.full((8, t_pad), pad_const, jnp.int32)
    n = pk.shape[0]
    for r in range(8):
        m = max(0, n - 16 * r)
        if m:
            tk = tk.at[r, :m].set(pk[16 * r:16 * r + m])
    return tk


_SIGN = jnp.int32(-2 ** 31)  # XOR flips int32 compare to unsigned order
# first pad key (cloud 31 << 27 = 0xF8000000), sign-flipped: 0x78000000
_UPAD = jnp.int32(0x78000000)


def _row_last(pos_hi, hq, pos_lo, in_level, upk_sorted, n_valid, n):
    """Row of the LAST possibly-matching target for a max-query-key
    lower-bound position: pos_hi when the key is present, else
    pos_hi - 1 (which can sit a whole cloud block away under the
    blocked layout)."""
    pos_hi_c = jnp.clip(jnp.minimum(pos_hi, n_valid - 1), 0, n - 1)
    exact = upk_sorted[pos_hi_c] == hq
    last = jnp.where(exact, pos_hi_c, jnp.maximum(pos_hi - 1, pos_lo))
    last = jnp.clip(jnp.minimum(last, n_valid - 1), 0, n - 1)
    return in_level.perm[last]


def _finalize_windows(halves, grp_any, in_level, upk_sorted, n_valid,
                      t_pad: int, win: int, win_h: int, grp: int,
                      n_tiles: int, want_split: bool = False):
    """Classic AND half-tile window tables from per-half key positions.

    halves: ((pos_lo, pos_hi, hq, any), ...) for the tile's two 128-row
    output halves (pos_* are lower-bound positions of the half's
    conservative min/max query keys in the level's sorted keys; hq the
    max bound key itself; any = half has valid outputs).

    Returns (starts, nch, rows) [G, n_tiles] classic windows (derived
    from the union of the half extents — for the c1z / folded / split
    kernels and any consumer ignoring halves) and (hstarts, hnch, hrows)
    [2G, n_tiles] per-half windows: 16-granular starts (row r =
    (start >> 4) & 7 of the shift-replica tkeys holds the matching
    compare lane layout) of static width win_h.

    want_split: additionally NEGATE classic rows on tiles qualifying for
    the legacy TILE==256 split variant (see FusedMap.rows)."""
    n = upk_sorted.shape[0]
    row_lo_h, row_hi_h, has_h = [], [], []
    for pos_lo, pos_hi, hq, any_h in halves:
        has = any_h & (pos_lo < n_valid)
        row_lo = in_level.perm[jnp.clip(pos_lo, 0, n - 1)]
        row_hi = _row_last(pos_hi, hq, pos_lo, in_level, upk_sorted,
                           n_valid, n)
        has_h.append(has)
        row_lo_h.append(jnp.where(has, row_lo, jnp.int32(2 ** 30)))
        row_hi_h.append(jnp.where(has, row_hi, -1))

    # classic window = union of the half extents
    has = has_h[0] | has_h[1]
    row_lo = jnp.minimum(row_lo_h[0], row_lo_h[1])
    row_hi = jnp.maximum(row_hi_h[0], row_hi_h[1])
    start = jnp.clip(jnp.where(has, row_lo, 0) & ~127,
                     0, max(t_pad - win, 0))
    span = row_hi - start + 1
    nch = jnp.where(has, -(-span // win), 0)
    nch = jnp.clip(nch, 0, t_pad // win)
    # rows covered by chunk 0 (<= win): the kernels narrow the one-hot
    # compare + gather GEMM to the smallest sufficient 128-multiple
    rows = jnp.where(has, jnp.clip(span, 1, win), 0)
    if want_split and win > 128:
        # both 128-row halves' matches fit the (win-128)-wide static
        # slice at their half's 128-lane offset of THIS chunk-0 window
        ws = win - 128
        split_ok = (has_h[0] & has_h[1] & (nch == 1)
                    & (row_hi_h[0] < start + ws)
                    & (row_lo_h[1] >= start + 128)
                    & (row_hi_h[1] < start + 128 + ws))
        # encoded in rows' SIGN (FusedMap.rows docstring): no new
        # field/argument anywhere between the builder and the kernels
        rows = jnp.where(split_ok, -rows, rows)

    # per-half windows: 16-granular starts against the replica rows
    hs, hn, hr = [], [], []
    for h in range(2):
        s_h = jnp.clip(jnp.where(has_h[h], row_lo_h[h], 0) & ~15,
                       0, max(t_pad - win_h, 0))
        span_h = row_hi_h[h] - s_h + 1
        n_h = jnp.where(has_h[h], -(-span_h // win_h), 0)
        hs.append(s_h)
        hn.append(jnp.clip(n_h, 0, t_pad // win_h))
        hr.append(jnp.where(has_h[h], jnp.clip(span_h, 1, win_h), 0))
    # [2G, n_tiles] with row 2g + h
    hstarts = jnp.stack(hs, 1).reshape(grp, n_tiles, 2)
    hnch = jnp.stack(hn, 1).reshape(grp, n_tiles, 2)
    hrows = jnp.stack(hr, 1).reshape(grp, n_tiles, 2)
    hstarts = jnp.swapaxes(hstarts, 1, 2).reshape(2 * grp, n_tiles)
    hnch = jnp.swapaxes(hnch, 1, 2).reshape(2 * grp, n_tiles)
    hrows = jnp.swapaxes(hrows, 1, 2).reshape(2 * grp, n_tiles)
    return ((start.reshape(grp, n_tiles).astype(jnp.int32),
             nch.reshape(grp, n_tiles).astype(jnp.int32),
             rows.reshape(grp, n_tiles).astype(jnp.int32)),
            (hstarts.astype(jnp.int32), hnch.astype(jnp.int32),
             hrows.astype(jnp.int32)))


def _build_fused_maps(levels: Dict[int, LevelCoords], specs):
    """FusedMap per unique conv geometry (qkey + windows + level keys)."""
    from .coords import pack_keys, pack_query_keys
    from .pallas_conv import max_win, win_for_map

    tkeys = {}
    upks = {}
    for s, lv in levels.items():
        # 1024-aligned (= F*128 at the deepest fold) so the folded conv
        # kernels' [t_pad/F, ...] arrays keep 128-multiple row counts
        t_pad = -(-(lv.coords.shape[0] + max_win()) // 1024) * 1024
        tkeys[s] = _level_tkeys(lv, s, t_pad)
        # sign-flipped packed keys in the level's sorted-key order (the
        # window search space; same order as (key_hi, key_lo)). A valid
        # row outside the packed z-range would scatter a large pad key
        # mid-array and break sortedness — such rows are unmatchable by
        # the kernel anyway, so clamp them down to the running maximum
        # (the trailing mask-pad region keeps its large keys).
        upk = (pack_keys(_fold_clouds(lv.coords), s) ^ _SIGN)[lv.perm]
        n_valid = jnp.sum(lv.mask.astype(jnp.int32))
        iota = jnp.arange(upk.shape[0], dtype=jnp.int32)
        mid_pad = (upk >= _UPAD) & (iota < n_valid)
        upks[s] = jax.lax.cummax(
            jnp.where(mid_pad, jnp.int32(-2 ** 31), upk))

    folded_out = {s: _fold_clouds(lv.coords) for s, lv in levels.items()}
    # pass 1: query keys for the kernels + EXACT per-(group, tile,
    # half) key extrema for the windows — masked min/max reductions
    # over the [K, N] query-key arrays themselves. Exact extremes are
    # both SOUND and tight. (An earlier build derived conservative
    # bounds from each tile's first/last coords plus the dx-group's
    # componentwise offset extremes in O(n_tiles); that argument is
    # provably correct only when queries divide by in_stride == 1 or
    # stay on-lattice — for UPSAMPLE maps the floor-division by
    # in_stride > 1 can collapse the leading key component and let a
    # trailing one overshoot the "bound", silently dropping matches at
    # window edges. The reductions cost a few ms of XLA time per graph
    # and buy exactness plus ~40 rows narrower windows.)
    from .pallas_conv import TILE
    ht = TILE // 2

    # pending: (sp, qk, bounds[lo0, hi0, lo1, hi1], any_h, grp, n_tiles)
    pending = []
    for sp in specs:
        offsets = kernel_offsets(sp.kernel_size) * sp.offset_scale
        qk = jax.vmap(
            lambda o, sp=sp: pack_query_keys(
                folded_out[sp.out_stride], o, sp.in_stride)
        )(jnp.asarray(offsets))
        from .pallas_conv import num_offset_groups
        k = offsets.shape[0]
        grp = num_offset_groups(k)
        kg = k // grp
        n_out = qk.shape[1]
        n_tiles = -(-n_out // TILE)
        pad = n_tiles * TILE - n_out
        qf = qk ^ _SIGN
        if pad:
            qf = jnp.pad(qf, ((0, 0), (0, pad)),
                         constant_values=jnp.int32(0x7FFFFFFF))
        # two-stage reductions keep the big pass contiguous: min needs
        # no validity mask at all (pad keys sit at/above _UPAD in the
        # flipped space, above every valid key); max masks pads in one
        # elementwise pass; any-valid falls out of the min for free
        qg = qf.reshape(grp, kg, n_tiles * TILE)
        lo_n = jnp.min(qg, axis=1)                      # [G, nt*TILE]
        hi_n = jnp.max(jnp.where(qg < _UPAD, qg, jnp.int32(-2 ** 31)),
                       axis=1)
        lo = jnp.min(lo_n.reshape(grp, n_tiles, 2, ht), axis=3)
        hi = jnp.max(hi_n.reshape(grp, n_tiles, 2, ht), axis=3)
        any_h = lo < _UPAD
        bounds = [lo[:, :, 0].reshape(-1), hi[:, :, 0].reshape(-1),
                  lo[:, :, 1].reshape(-1), hi[:, :, 1].reshape(-1)]
        anys = [any_h[:, :, 0].reshape(-1), any_h[:, :, 1].reshape(-1)]
        pending.append((sp, qk, bounds, anys, grp, n_tiles))

    # pass 2: ONE bounded binary search for ALL levels at once — the
    # per-level key arrays concatenate into one search space and each
    # query's [lo, hi) bounds confine it to its level's segment, so a
    # single ~20-iteration serial gather loop replaces one per level.
    from .coords import searchsorted1_bounded
    lev_order = [s for s in levels
                 if any(p[0].in_stride == s for p in pending)]
    seg_off: Dict[int, int] = {}
    total, max_seg = 0, 1
    for s in lev_order:
        seg_off[s] = total
        total += upks[s].shape[0]
        max_seg = max(max_seg, upks[s].shape[0])
    allk = jnp.concatenate([upks[s] for s in lev_order])
    cats, metas = [], []
    for s in lev_order:
        qs = [p for p in pending if p[0].in_stride == s]
        cat = jnp.concatenate([x for p in qs for x in p[2]])
        cats.append(cat)
        metas.append((s, cat.shape[0]))
    q_all = jnp.concatenate(cats)
    lo0 = jnp.concatenate([
        jnp.full((cnt,), seg_off[s], jnp.int32) for s, cnt in metas])
    hi0 = jnp.concatenate([
        jnp.full((cnt,), seg_off[s] + upks[s].shape[0], jnp.int32)
        for s, cnt in metas])
    pos_all = searchsorted1_bounded(allk, q_all, lo0, hi0, max_seg)
    pos: Dict[int, jax.Array] = {}
    o = 0
    for s, cnt in metas:
        pos[s] = pos_all[o:o + cnt] - seg_off[s]
        o += cnt

    fused: Dict[str, FusedMap] = {}
    off: Dict[int, int] = {s: 0 for s in levels}
    c1z_cache: Dict[int, jax.Array] = {}
    from .pallas_conv import SPLIT, TILE, win_half_for_map
    for sp, qk, bounds, anys, grp, n_tiles in pending:
        s = sp.in_stride
        m = bounds[0].shape[0]
        o = off[s]
        p4 = [pos[s][o + j * m:o + (j + 1) * m] for j in range(4)]
        off[s] = o + 4 * m
        n_valid = jnp.sum(levels[s].mask.astype(jnp.int32))
        win = win_for_map(s, sp.out_stride)
        win_h = win_half_for_map(s, sp.out_stride)
        halves = ((p4[0], p4[1], bounds[1], anys[0]),
                  (p4[2], p4[3], bounds[3], anys[1]))
        (starts, nch, rows), (hstarts, hnch, hrows) = _finalize_windows(
            halves, None, levels[s], upks[s], n_valid,
            tkeys[s].shape[1], win, win_h, grp, n_tiles,
            want_split=SPLIT and TILE == 256)
        c1z = None
        if (sp.in_stride == sp.out_stride == 1 and sp.dilation == 1
                and sp.kernel_size % 2 == 1):
            if 1 not in c1z_cache:
                c1z_cache[1] = _c1z_aux(levels[1])
            c1z = c1z_cache[1]
        fused[sp.key] = FusedMap(qk, starts, nch, tkeys[s], win, c1z,
                                 rows=rows, hstarts=hstarts, hnch=hnch,
                                 hrows=hrows, hwin=win_h)
    return fused


def _c1z_aux(level: LevelCoords) -> jax.Array:
    """Per-voxel aux for the occupancy-conv presence kernels
    (pallas_conv._fwd_c1z_kernel): col 0 the voxel's own packed key in
    query-pad convention (pack_query_keys at offset 0 — invalid rows get
    the PAD_CLOUD | 1<<26 space, disjoint from target pad keys so pad
    queries can never read presence off pad targets), cols 1-3 the
    grid-shifted unsigned coords for neighbourhood range masking."""
    from .coords import DEFAULT_KEY_BITS, pack_query_keys

    bx, by, bz = DEFAULT_KEY_BITS
    folded = _fold_clouds(level.coords)
    q0 = pack_query_keys(folded, jnp.zeros((3,), jnp.int32), 1)
    half = jnp.array([1 << (bx - 1), 1 << (by - 1), 1 << (bz - 1)],
                     jnp.int32)
    u = level.coords[:, 1:4] + half[None, :]
    u = jnp.where(level.mask[:, None], u, -(1 << 20))
    n = q0.shape[0]
    aux = jnp.zeros((n, 8), jnp.int32)
    aux = aux.at[:, 0].set(q0)
    aux = aux.at[:, 1:4].set(u)
    return aux


def _build_kmap(out_level: LevelCoords, in_level: LevelCoords,
                in_stride: int, offsets: np.ndarray) -> jax.Array:
    """Gather table: kmap[k, i] = row of in_level at out_coords[i]+off[k]."""
    oc = out_level.coords

    def per_offset(off):
        qxyz = oc[:, 1:4] + off[None, :]
        q = jnp.concatenate([oc[:, 0:1], qxyz], axis=1)
        qh, ql = coord_keys(q, in_stride)
        # Padded output rows have batch INVALID -> key sentinel -> -1.
        res = lookup(in_level.key_hi, in_level.key_lo, in_level.perm,
                     qh, ql)
        if in_stride > 1:
            # A query off the coarse lattice has no input (key building
            # floor-divides by stride, which would otherwise alias it onto
            # a real coarse voxel). Matters for transpose convs.
            on_lattice = jnp.all(qxyz % in_stride == 0, axis=1)
            res = jnp.where(on_lattice, res, -1)
        return res

    return jax.vmap(per_offset)(jnp.asarray(offsets))


def build_graph(coords: jax.Array, mask: jax.Array,
                specs: Sequence[ConvSpec],
                level_caps: Dict[int, int],
                method: str = "auto",
                key_bits=None,
                sorted_blocks: bool = False,
                n_clouds: int | None = None) -> SparseGraph:
    """Build all stride levels + kernel maps needed by a conv plan.

    Args:
      coords: int32[N0, 4] level-0 voxel coords (from voxelize_points).
      mask: bool[N0].
      specs: the model's convolutions (duplicate geometry is deduped).
      level_caps: static dict stride -> capacity. Must contain every stride
        appearing in `specs`; stride 1 capacity must equal N0.
      method: 'auto' (default; 'fused' on TPU, sortjoin elsewhere),
        'fused' (implicit maps — packed query keys + windows resolved
        inside the Mosaic conv kernels, no join pass), 'pallas' (explicit
        maps via the Mosaic merge-join), 'sortjoin' (one streaming sort)
        or 'bsearch' (vectorized binary search; reference
        implementation).
      key_bits: (bx, by, bz) per-axis bit budget for sortjoin keys
        (coords.DEFAULT_KEY_BITS when None).
      sorted_blocks: promise that `coords` is cloud-blocked with each
        block key-sorted and padding inline at block tails
        (voxelize_per_cloud output) — the level-0 index then compacts
        instead of sorting.
      n_clouds: static upper bound on the number of clouds in `coords`.
        The fused path folds cloud ids mod 31 into its packed keys, which
        is only injective for <= 31 clouds per device batch; 'auto'
        selects fused only when the caller declares n_clouds <= 31 and
        falls back to explicit Mosaic merge-join maps otherwise.

    This function is jittable (specs/level_caps static via closure).
    """
    strides = sorted({s for sp in specs for s in (sp.in_stride, sp.out_stride)})
    # cloud-blocked deeper levels (aligned per-cloud bases) whenever the
    # fused kernels may consume them: conv tiles then never span two
    # clouds and windows never bridge blocks (see _downsample_level).
    blocked = (sorted_blocks and n_clouds is not None and n_clouds <= 31
               and method in ("auto", "fused"))
    blk = n_clouds if blocked else None
    levels: Dict[int, LevelCoords] = {}
    for s in strides:
        if s == 1:
            levels[1] = (_index_level_sorted(coords, mask) if sorted_blocks
                         else _index_level(coords, mask, 1))
        else:
            cap = level_caps[s] + (n_clouds * 256 if blocked else 0)
            # floor(floor(x/a)/b) == floor(x/(ab)): derive each level
            # from the coarsest finer level already built — its dedup
            # sort is over far fewer rows than level 0's
            src = max((p for p in levels if s % p == 0), default=None)
            if src is not None:
                levels[s] = _downsample_level(levels[src].coords,
                                              levels[src].mask, s,
                                              cap, n_clouds=blk)
            else:
                levels[s] = _downsample_level(coords, mask, s,
                                              cap, n_clouds=blk)

    uniq: list = []
    seen = set()
    # Every map also gets its reverse-direction twin (in/out strides
    # swapped): sparse_conv's scatter-free backward gathers dX through it.
    # For the ResUNet family this adds nothing — same-level maps are their
    # own reverse and each strided conv has a matching transpose conv.
    want = []
    for sp in specs:
        want.append(sp)
        if sp.kernel_size % 2 == 1:
            want.append(dataclasses.replace(sp, name=sp.name + "_rev",
                                            in_stride=sp.out_stride,
                                            out_stride=sp.in_stride))
    for sp in want:
        if sp.is_identity_map or sp.key in seen:
            continue
        seen.add(sp.key)
        uniq.append(sp)

    if method == "auto":
        from .pallas_conv import pallas_available
        # fused windows require the original row order to be
        # cloud-blocked key-sorted (queries monotone per offset,
        # level perm increasing on the valid prefix) AND a declared
        # cloud count small enough for the mod-31 fold to be exact
        fused_ok = (sorted_blocks and n_clouds is not None
                    and n_clouds <= 31)
        if pallas_available():
            method = "fused" if fused_ok else "pallas"
        elif FORCE_FUSED_INTERPRET and fused_ok:
            # CPU check legs (tests/__graft_entry__) trace the Mosaic
            # conv kernels in interpret mode so signature/shape breakage
            # fails off-TPU too (sparse_ops.FORCE_INTERPRET must be on)
            method = "fused"
        else:
            method = "sortjoin"

    if method == "fused":
        assert sorted_blocks, \
            "method='fused' requires sorted_blocks coords layout"
        assert n_clouds is None or n_clouds <= 31, \
            "fused path folds cloud ids mod 31; > 31 clouds per device " \
            "batch can alias (use method='pallas')"
        # Even-kernel geometries have no reverse-direction twin (their
        # offset set is not symmetric), which the fused backward needs —
        # give them explicit maps instead; SparseConv falls back per-map.
        fusable = [sp for sp in uniq if sp.kernel_size % 2 == 1]
        rest = [sp for sp in uniq if sp.kernel_size % 2 == 0]
        from .pallas_conv import pallas_available
        interp = FORCE_FUSED_INTERPRET and not pallas_available()
        kmaps = {}
        for sp in rest:
            offsets = kernel_offsets(sp.kernel_size) * sp.offset_scale
            kmaps[sp.key] = _build_kmap_pallas(levels[sp.out_stride],
                                               levels[sp.in_stride],
                                               sp.in_stride, offsets,
                                               interpret=interp)
        return SparseGraph(levels=levels, kmaps=kmaps,
                           fused=_build_fused_maps(levels, fusable))

    kmaps: Dict[str, jax.Array] = {}
    if method == "sortjoin":
        kmaps = _build_all_kmaps_one_sort(levels, uniq, key_bits)
    else:
        for sp in uniq:
            offsets = kernel_offsets(sp.kernel_size) * sp.offset_scale
            if method == "pallas":
                kmaps[sp.key] = _build_kmap_pallas(levels[sp.out_stride],
                                                   levels[sp.in_stride],
                                                   sp.in_stride, offsets)
            else:
                kmaps[sp.key] = _build_kmap(levels[sp.out_stride],
                                            levels[sp.in_stride],
                                            sp.in_stride, offsets)
    return SparseGraph(levels=levels, kmaps=kmaps)


def _build_all_kmaps_one_sort(levels: Dict[int, LevelCoords], specs,
                              key_bits=None) -> Dict[str, jax.Array]:
    """All kernel maps of the network in ONE sort-join.

    One XLA sort instance instead of one per map — sorts dominate both
    the runtime and (critically) the TPU compiler's memory footprint; a
    12-sort graph program OOM-killed the compile helper. Rows carry
    (map_id, packed key, payload); a last-valid associative scan over
    (map_id, key, target-row) triples propagates target rows to equal-key
    queries within the same map; one scatter materializes every gather
    table, then the flat result is sliced per map.
    """
    from .coords import pack_keys, pack_query_keys, DEFAULT_KEY_BITS

    bits = key_bits or DEFAULT_KEY_BITS
    all_keys, all_mapid, all_payload = [], [], []
    q_offsets = []  # (spec, start, k, n_out) for output slicing
    q_total = 0
    for m, sp in enumerate(specs):
        out_l = levels[sp.out_stride]
        in_l = levels[sp.in_stride]
        offsets = jnp.asarray(kernel_offsets(sp.kernel_size)
                              * sp.offset_scale)
        k = offsets.shape[0]
        n_out = out_l.coords.shape[0]
        n_in = in_l.coords.shape[0]
        tkeys = pack_keys(in_l.coords, sp.in_stride, bits)
        qkeys = jax.vmap(
            lambda o: pack_query_keys(out_l.coords, o, sp.in_stride, bits)
        )(offsets).reshape(-1)
        all_keys += [tkeys, qkeys]
        all_mapid += [jnp.full((n_in,), m, jnp.int32),
                      jnp.full((k * n_out,), m, jnp.int32)]
        all_payload += [
            jnp.arange(n_in, dtype=jnp.int32),
            (q_total + jnp.arange(k * n_out, dtype=jnp.int32))
            | jnp.int32(1 << 30),
        ]
        q_offsets.append((sp, q_total, k, n_out))
        q_total += k * n_out
    assert q_total < (1 << 30), "query payload bits exhausted"

    keys = jnp.concatenate(all_keys)
    mapid = jnp.concatenate(all_mapid)
    payload = jnp.concatenate(all_payload)
    # num_keys=3: (map, key, payload) — the payload flag bit orders
    # targets before equal-key queries
    mid_s, keys_s, pay_s = jax.lax.sort((mapid, keys, payload), num_keys=3)

    is_target = (pay_s & (1 << 30)) == 0
    tval = jnp.where(is_target, pay_s, -1)

    # Bounded last-target propagation. Within one map an equal-key run
    # holds at most one target plus <= K queries (each offset contributes
    # at most one query with a given key), so the target reaches every
    # query of its run after ceil(log2(K_max+1)) doubling passes. A full
    # associative_scan would be unbounded-length-correct but its unrolled
    # lowering blows up the TPU compiler at 1e8 rows.
    k_max = max(kernel_offsets(sp.kernel_size).shape[0] for sp in specs)
    passes = max(1, math.ceil(math.log2(k_max + 1)))
    c_key, c_mid, c_row = keys_s, mid_s, tval

    for p in range(passes):
        shift = 1 << p
        pk = jnp.concatenate([c_key[:shift], c_key[:-shift]])
        pm = jnp.concatenate([c_mid[:shift], c_mid[:-shift]])
        pr = jnp.concatenate([jnp.full((shift,), -1, jnp.int32),
                              c_row[:-shift]])
        take_self = c_row >= 0
        c_key = jnp.where(take_self, c_key, pk)
        c_mid = jnp.where(take_self, c_mid, pm)
        c_row = jnp.where(take_self, c_row, pr)

    match = ((c_key == keys_s) & (c_mid == mid_s) & ~is_target
             & (c_row >= 0))
    row = jnp.where(match, c_row, -1)

    qid = pay_s & jnp.int32((1 << 30) - 1)
    slot = jnp.where(is_target, q_total, qid)
    flat = jnp.full((q_total + 1,), -1, jnp.int32)
    flat = flat.at[slot].set(row, mode="drop")

    kmaps: Dict[str, jax.Array] = {}
    for sp, start, k, n_out in q_offsets:
        kmaps[sp.key] = jax.lax.dynamic_slice_in_dim(
            flat, start, k * n_out).reshape(k, n_out)
    return kmaps


def graph_builder(specs: Sequence[ConvSpec], level_caps: Dict[int, int]):
    """Return a jitted (coords, mask) -> SparseGraph closure."""
    specs = tuple(specs)
    caps = dict(level_caps)

    @jax.jit
    def build(coords, mask):
        return build_graph(coords, mask, specs, caps)

    return build


def default_level_caps(n_cap: int, strides: Sequence[int],
                       shrink: float = 0.5) -> Dict[int, int]:
    """Heuristic per-level capacities: LiDAR voxel counts roughly halve per
    2x stride (surfaces are ~2D). Rounded up to multiples of 8."""
    caps = {}
    for i, s in enumerate(sorted(set(strides))):
        c = n_cap if s == 1 else int(n_cap * (shrink ** i))
        caps[s] = max(8, -(-c // 8) * 8)
    return caps
