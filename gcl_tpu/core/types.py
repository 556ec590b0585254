"""Core pytree types for the TPU-native sparse-voxel engine.

The reference (liuQuan98/GCL) represents sparse voxel tensors with
MinkowskiEngine's ``ME.SparseTensor`` (dynamic-shape C++/CUDA hash maps,
see /root/reference/lib/trainer.py:243-251). On TPU every program must be
static-shape, so we use fixed-capacity padded arrays plus validity masks.

All structures here are registered pytrees and flow freely through jit /
grad / shard_map.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Sentinel batch index marking padded (invalid) voxel rows. Sorts after all
# real batch indices, so padding always lands at the tail of a key sort.
INVALID_BATCH = jnp.int32(0x000FFFFF)  # 2**20 - 1


class SparseBatch(NamedTuple):
    """A batch of sparse voxel tensors, fixed capacity.

    Equivalent of ``ME.SparseTensor`` built by ``ME.utils.sparse_collate``
    (reference lib/colocation_data_loader.py:446): each cloud in the batch
    is a distinct batch index in ``coords[:, 0]``.

    Attributes:
      coords: int32[N_cap, 4] — (batch, x, y, z) integer voxel coordinates.
        Padded rows have batch == INVALID_BATCH.
      feats:  float[N_cap, C] — per-voxel features. Padded rows are zero.
      mask:   bool[N_cap]     — True for valid rows.
    """

    coords: jax.Array
    feats: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_valid(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def replace_feats(self, feats: jax.Array) -> "SparseBatch":
        return SparseBatch(self.coords, feats, self.mask)


class LevelCoords(NamedTuple):
    """Voxel coordinates at one stride level of the U-Net hierarchy.

    ``coords`` are in units of level-0 voxels and are exact multiples of
    ``stride`` (matching MinkowskiEngine tensor-stride semantics used by the
    reference model, /root/reference/model/resunet.py:38-45).
    """

    coords: jax.Array  # int32[Ncap_l, 4]
    mask: jax.Array  # bool[Ncap_l]
    # Sorted composite keys + permutation for O(log N) coordinate lookup.
    key_hi: jax.Array  # int32[Ncap_l] sorted
    key_lo: jax.Array  # int32[Ncap_l] sorted
    perm: jax.Array  # int32[Ncap_l]: row in `coords` for each sorted key

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]


@jax.tree_util.register_pytree_node_class
class FusedMap:
    """Implicit kernel map: geometry the Mosaic conv kernels resolve
    in-flight by key equality, skipping the explicit join pass.

    The windowed gather kernels rebuild the one-hot routing per use
    anyway, so comparing packed coordinate keys against the window's
    target keys costs the same as comparing precomputed indices — and the
    whole merge-join pass that materialized those indices disappears.

    Attributes:
      qkey: int32[K, N_out] packed query keys (coords.pack_query_keys of
        out_coords + offset_k at the input stride); padded / off-lattice
        queries carry never-matching keys.
      starts: int32[G, n_tiles] per-(dx-group, output-tile) input-window
        start rows (input-level row space, 128-aligned).
      nch: int32[G, n_tiles] window chunk counts (0 = no matches).
      tkeys: int32[8, T_pad] stacked packed input-level keys in ORIGINAL
        row order (row 0; rows 1-7 zero), sentinel-padded to the padded
        feature length. Shared by every map reading the same level.
      win: STATIC window width (rows per DMA chunk) the starts/nch were
        computed with — carried as pytree aux data so the consuming
        kernel can never disagree with the builder (a mismatched width
        silently under-covers windows).
      c1z: None, or int32[N_out, 8] per-output aux for the occupancy
        (Cin==1) presence-bitmask kernels: column 0 the output voxel's
        own packed key (pad rows carry the never-matching query-pad
        key), columns 1-3 the grid-shifted (ux, uy, uz) coordinates for
        range masking. Built only for same-level dilation-1 odd maps at
        stride 1 (conv1 geometries).
      rows: None, or int32[G, n_tiles] rows actually covered by window
        chunk 0 (row_hi - start + 1, clamped to win; 0 where nch == 0).
        Lets the conv kernels run the one-hot compare + gather GEMM at
        the narrowest sufficient 128-multiple width instead of the full
        win (pallas_conv seg_widths). NEGATIVE rows (-r encodes r) mark
        tiles where each 128-row output HALF's matches fit the
        (win - 128)-wide static window slice at offset half*128 — the
        kernels then compare each half against only its slice
        (pallas_conv split variant). Optional: None keeps full-width.
      hstarts/hnch/hrows: None, or int32[2G, n_tiles] HALF-TILE window
        tables (row 2g + h = dx-group g, 128*(TILE//256)-row output half
        h): starts are 16-GRANULAR — the kernels DMA at start & ~127 and
        compare against shift-replica row (start >> 4) & 7 of tkeys —
        with static width `hwin` (~win/2). The generic kernels prefer
        these (1.5-2x narrower one-hot compares + gather GEMMs); the
        c1z / folded / legacy-split paths use the classic tables.
      hwin: static half-window width the hstarts/hnch were computed with
        (0 when absent).

    """

    def __init__(self, qkey, starts, nch, tkeys, win: int, c1z=None,
                 rows=None, hstarts=None, hnch=None, hrows=None,
                 hwin: int = 0):
        self.qkey = qkey
        self.starts = starts
        self.nch = nch
        self.tkeys = tkeys
        self.win = win
        self.c1z = c1z
        self.rows = rows
        self.hstarts = hstarts
        self.hnch = hnch
        self.hrows = hrows
        self.hwin = hwin

    def tree_flatten(self):
        return (self.qkey, self.starts, self.nch, self.tkeys,
                self.c1z, self.rows, self.hstarts, self.hnch,
                self.hrows), (self.win, self.hwin)

    @classmethod
    def tree_unflatten(cls, aux, children):
        win, hwin = aux
        return cls(*children[:4], win, children[4], children[5],
                   children[6], children[7], children[8], hwin)


class SparseGraph(NamedTuple):
    """The full static geometry of one U-Net forward pass.

    Built once per batch from level-0 coordinates; the model's feature
    compute is then pure gathers + GEMMs with no dynamic shapes. This
    replaces MinkowskiEngine's coordinate manager + kernel-map machinery.

    Attributes:
      levels: dict mapping stride (int, static pytree key) -> LevelCoords.
      kmaps: dict mapping map-key (str) -> int32[K, N_out_cap] gather
        indices. kmaps[key][k, i] is the row in the *input* level's coords
        holding the voxel at ``out_coords[i] + offset_k``, or -1 if absent.
      fused: None, or dict mapping map-key (str) -> FusedMap (the Mosaic
        TPU path; kmaps is empty then).
    """

    levels: dict
    kmaps: dict
    fused: Optional[dict] = None


def map_key(in_stride: int, out_stride: int, kernel_size: int, dilation: int) -> str:
    """Canonical name for a kernel map between two stride levels."""
    return f"s{in_stride}->s{out_stride}/k{kernel_size}d{dilation}"


class ColocationGroups(NamedTuple):
    """Fixed-capacity colocation groups (GCL positive clusters).

    Static-shape equivalent of the reference's ragged (group, index,
    finest_flag) triple built by get_matching_indices_colocation
    (util/pointcloud.py:69-132). One group slot per center voxel; invalid
    slots are masked rather than dropped.

    Attributes:
      member_idx: int32[G, Kc] — global voxel rows of group members
        (center-cloud hits first, then per-neighbor-cloud hits); -1 pad.
      member_mask: bool[G, Kc].
      finest_pos: int32[G] — column of the finest member (member closest
        to its own LiDAR origin; 0 = the center voxel itself).
      valid: bool[G] — group exists (center voxel valid and has at least
        one cross-cloud hit).
      anchor_xyz: float32[G, 3] — coordinates of the first member (used by
        the circle loss's safe-radius mask; reference passes integer voxel
        coords, lib/colocation_trainer.py:858).
      anchor_item: int32[G] — batch-sample index of the group (for the
        circle loss's in-batch block-diagonal mask).
    """

    member_idx: jax.Array
    member_mask: jax.Array
    finest_pos: jax.Array
    valid: jax.Array
    anchor_xyz: jax.Array
    anchor_item: jax.Array
