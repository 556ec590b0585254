"""On-device data pipeline: per-cloud voxelization, radius-KNN search,
colocation-group construction, pair correspondences.

In the reference all of this runs on CPU inside DataLoader workers
(ME.utils.sparse_quantize + Open3D KDTreeFlann radius searches,
lib/colocation_data_loader.py:372-394, util/pointcloud.py:53-132) and is a
training bottleneck. Here the host only reads scans and poses; everything
else is one static-shape XLA program: voxelize -> transform -> brute-force
radius-KNN (distance tiles ride the MXU) -> masked group tables.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.types import INVALID_BATCH, ColocationGroups, SparseBatch
from ..core.voxelize import voxelize_points

# Off-TPU check legs set this (gcl_tpu.testing.kernel_interpret) to run
# the Mosaic group-search kernels in Pallas interpret mode instead of the
# XLA fallback — kernel breakage then fails on CPU too.
FORCE_INTERPRET = False


class VoxelizedClouds(NamedTuple):
    """Per-cloud voxelization output, fixed per-cloud capacity.

    coords: int32[C, Nv, 4] (cloud, x, y, z); mask: bool[C, Nv];
    xyz: float32[C, Nv, 3] representative original points
    (= `xyz[sel]` of ME.utils.sparse_quantize(return_index=True)).
    """

    coords: jax.Array
    mask: jax.Array
    xyz: jax.Array

    def flatten(self) -> SparseBatch:
        """Concatenate clouds into one SparseBatch (global row = c*Nv+i),
        the analog of ME.utils.sparse_collate."""
        c, nv, _ = self.coords.shape
        coords = self.coords.reshape(c * nv, 4)
        mask = self.mask.reshape(c * nv)
        feats = mask[:, None].astype(jnp.float32)
        return SparseBatch(coords, feats, mask)


@partial(jax.jit, static_argnames=("nv_cap",))
def voxelize_per_cloud(points: jax.Array, pmask: jax.Array, voxel_size,
                       nv_cap: int) -> VoxelizedClouds:
    """Quantize each cloud independently (own frame, own capacity).

    points: float[C, P, 3]; pmask: bool[C, P].
    """
    def one(p, m):
        batch, rep = voxelize_points(p[None], m[None], voxel_size, nv_cap)
        xyz = p[rep[:, 1]]
        xyz = jnp.where(batch.mask[:, None], xyz, 0.0)
        return batch.coords, batch.mask, xyz

    coords, mask, xyz = jax.vmap(one)(points, pmask)
    c = points.shape[0]
    cloud_id = jnp.arange(c, dtype=jnp.int32)[:, None]
    coords = coords.at[:, :, 0].set(
        jnp.where(mask, cloud_id, INVALID_BATCH))
    return VoxelizedClouds(coords, mask, xyz)


def transform_points(xyz: jax.Array, t: jax.Array) -> jax.Array:
    """Apply a 4x4 transform to [..., 3] points."""
    return xyz @ t[:3, :3].T + t[:3, 3]


@partial(jax.jit, static_argnames=("k", "chunk"))
def radius_knn(queries: jax.Array, q_mask: jax.Array, targets: jax.Array,
               t_mask: jax.Array, radius, k: int, chunk: int = 512
               ) -> Tuple[jax.Array, jax.Array]:
    """K nearest targets within `radius` of each query (brute force, tiled).

    Matches o3d KDTreeFlann.search_radius_vector_3d(...)[:K] semantics
    (hits sorted by distance). Returns (idx int32[Q, k], hit bool[Q, k]);
    idx is only meaningful where hit.
    """
    q = queries.shape[0]
    pad = (-q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    t2 = jnp.sum(targets * targets, axis=1)
    big = jnp.float32(1e30)

    def per_chunk(qc):
        d2 = (jnp.sum(qc * qc, 1)[:, None] + t2[None, :]
              - 2.0 * qc @ targets.T)
        d2 = jnp.where(t_mask[None, :], d2, big)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    idx, d2 = jax.lax.map(per_chunk, qp.reshape(-1, chunk, 3))
    idx = idx.reshape(-1, k)[:q]
    d2 = d2.reshape(-1, k)[:q]
    hit = (d2 <= radius * radius) & q_mask[:, None]
    return idx, hit


_CELL_BITS = 10
_CELL_HALF = 1 << (_CELL_BITS - 1)


def _cell_key(cxyz: jax.Array, valid: jax.Array):
    """Pack integer cell coords [..., 3] into one int30 key (< 2^30).

    Returns (key, ok); rows that are invalid or out of the +-2^9 cell range
    get the max sentinel key and ok=False.
    """
    u = cxyz + _CELL_HALF
    ok = valid & jnp.all((u >= 0) & (u < 2 * _CELL_HALF), axis=-1)
    key = ((u[..., 0] << (2 * _CELL_BITS)) | (u[..., 1] << _CELL_BITS)
           | u[..., 2])
    return jnp.where(ok, key, jnp.int32((1 << 30) - 1)), ok


_OCTANT = jnp.asarray(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], jnp.int32)


def _octant_base(xyz: jax.Array, mask: jax.Array, cell):
    """Masked query positions + the MIN-CORNER key of each query's
    2x2x2 probe block (the windowed_cell_topk kernel resolves all 8
    octant cells from it with one subtract + bit test).

    Same probe-cell rule as _octant_probes: home cell plus the
    midpoint-side neighbour per axis — that set is exactly the unit
    block at base = qcell + min(step, 0). Queries whose block cannot
    pack injectively (invalid, or within one cell of the +-2^9 grid
    edge — beyond any LiDAR range) get the sentinel base: they then
    key-match only sentinel'd invalid targets, whose +-1e30 coords
    never pass the radius test.
    """
    qx = jnp.where(mask[..., None], xyz, -1e30)
    qc = qx * jnp.float32(1.0 / cell)
    qcell = jnp.floor(qc).astype(jnp.int32)
    step = jnp.where(qc - qcell >= 0.5, 1, -1).astype(jnp.int32)
    ub = qcell + jnp.minimum(step, 0) + _CELL_HALF
    ok = mask & jnp.all((ub >= 0) & (ub + 1 < 2 * _CELL_HALF), axis=-1)
    key = ((ub[..., 0] << (2 * _CELL_BITS)) | (ub[..., 1] << _CELL_BITS)
           | ub[..., 2])
    return qx, jnp.where(ok, key, jnp.int32(0x7FFFFFFF))


def _octant_probes(xyz: jax.Array, mask: jax.Array, cell):
    """Masked query positions + their 8-cell octant probe keys.

    xyz: float[..., 3]; mask: bool[...]. Returns (qx float[..., 3] with
    -1e30 fill, probes int32[..., 8], ok bool[..., 8]). A radius
    <= cell/2 sphere intersects at most 2 cells per axis: the home cell
    plus the neighbour on the side of the cell midpoint. Shared by
    grid_radius_knn and _batched_grid_core so the midpoint probe rule
    cannot drift between the XLA fallback and the Pallas path.
    """
    qx = jnp.where(mask[..., None], xyz, -1e30)
    qc = qx * jnp.float32(1.0 / cell)
    qcell = jnp.floor(qc).astype(jnp.int32)
    step = jnp.where(qc - qcell >= 0.5, 1, -1).astype(jnp.int32)
    probe_cells = qcell[..., None, :] + step[..., None, :] * _OCTANT
    probes, ok = _cell_key(probe_cells, mask[..., None])
    return qx, probes, ok


@partial(jax.jit, static_argnames=("k", "cell", "cell_cap"))
def grid_radius_knn(queries: jax.Array, q_mask: jax.Array,
                    targets: jax.Array, t_mask: jax.Array, radius,
                    k: int, cell: float, cell_cap: int = 8
                    ) -> Tuple[jax.Array, jax.Array]:
    """radius_knn via a sorted hash grid — the TPU-fast path.

    Brute force computes a Q x T distance matrix and top_k's 18k-wide rows
    (11 s/step at KITTI scale); this does ONE streaming sort instead:

      1. bin targets into cells of size `cell` (static; must satisfy
         cell >= 2*radius — the traced radius is clamped to cell/2);
      2. a sphere of radius <= cell/2 intersects at most 2 cells per axis,
         so each query probes only its 8-cell octant (home cell + the
         neighbor on the side of the cell midpoint per axis);
      3. one combined sort of [target keys | 8 query keys] + a prefix sum
         yields, per probe, the START of that cell's run in the
         target-sorted order (targets order before equal-key queries via
         the flag bit) — candidates are the next `cell_cap` contiguous
         rows, validated by key equality;
      4. exact distances to <= 8*cell_cap candidates, top_k over that
         narrow axis.

    Exact up to per-cell truncation: only the first `cell_cap` targets of
    one cell (in sort order) are visible. Voxelized LiDAR at 0.3 m holds
    ~2-4 voxels per 0.9 m cell, so cell_cap=8 loses essentially nothing
    (and the reference truncates radius hits to K=5 anyway,
    util/pointcloud.py:89).
    """
    qn = queries.shape[0]
    tn = targets.shape[0]
    r = jnp.minimum(jnp.asarray(radius, jnp.float32), cell * 0.5)

    tkey, t_ok = _cell_key(jnp.floor(
        jnp.where(t_mask[:, None], targets, 1e30) / cell).astype(jnp.int32),
        t_mask)
    tx = jnp.where(t_ok[:, None], targets, 1e30)

    qx, qkey, _ = _octant_probes(queries, q_mask, cell)  # [Q,8]

    # flag bit 1 = target, so queries sort BEFORE equal-key targets and a
    # query's target-prefix-count is searchsorted-left (the run start).
    # Both key kinds stay < 2^31 (non-negative int32).
    keys = jnp.concatenate([tkey * 2 + 1, qkey.reshape(-1) * 2])
    payload = jnp.concatenate([jnp.arange(tn, dtype=jnp.int32),
                               jnp.arange(8 * qn, dtype=jnp.int32)])
    keys_s, pay_s = jax.lax.sort((keys, payload), num_keys=1)

    is_t = (keys_s & 1) == 1
    it32 = is_t.astype(jnp.int32)
    t_before = jnp.cumsum(it32) - it32  # targets strictly before position

    # target rows in sorted-key order
    tslot = jnp.where(is_t, t_before, tn)
    tsorted = jnp.zeros((tn + 1,), jnp.int32).at[tslot].set(
        pay_s, mode="drop")[:tn]
    # per-probe run start in the target-sorted order
    qslot = jnp.where(is_t, 8 * qn, pay_s)
    qstart = jnp.zeros((8 * qn + 1,), jnp.int32).at[qslot].set(
        t_before, mode="drop")[:8 * qn].reshape(qn, 8)

    tkey_s = tkey[tsorted]
    txyz_s = tx[tsorted]

    cpos = qstart[:, :, None] + jnp.arange(cell_cap,
                                           dtype=jnp.int32)  # [Q,8,C]
    in_arr = cpos < tn
    cposc = jnp.minimum(cpos, tn - 1)
    same_cell = tkey_s[cposc] == qkey[:, :, None]
    d2 = jnp.sum((qx[:, None, None, :] - txyz_s[cposc]) ** 2, -1)
    d2 = jnp.where(in_arr & same_cell, d2, 1e30)

    neg, ci = jax.lax.top_k(-d2.reshape(qn, 8 * cell_cap), k)
    d2k = -neg
    sel_pos = jnp.take_along_axis(cposc.reshape(qn, 8 * cell_cap), ci, 1)
    idx = tsorted[sel_pos]
    hit = (d2k <= r * r) & q_mask[:, None]
    return idx, hit


def _knn(queries, q_mask, targets, t_mask, radius, k, chunk, cell,
         cell_cap):
    if cell is not None:
        return grid_radius_knn(queries, q_mask, targets, t_mask, radius,
                               k, cell=cell, cell_cap=cell_cap)
    return radius_knn(queries, q_mask, targets, t_mask, radius, k, chunk)


@partial(jax.jit, static_argnames=("k", "cell"))
def batched_grid_radius_knn(queries: jax.Array, q_mask: jax.Array,
                            targets: jax.Array, t_mask: jax.Array,
                            radius: jax.Array, k: int, cell: float
                            ) -> Tuple[jax.Array, jax.Array]:
    """Batched grid search on the Mosaic windowed top-k kernel.

    queries: float[S, Q, 3]; targets: float[S, T, 3]; radius: float[S].
    Semantics of grid_radius_knn (octant probes, radius clamped to
    cell/2), with the candidate gathers + top_k replaced by
    core.pallas_radius.windowed_cell_topk (XLA gathers ran the
    colocation-group search at ~0.9 s/step at KITTI scale).
    """
    s_n, q_n, _ = queries.shape
    r = jnp.minimum(radius.astype(jnp.float32), cell * 0.5)

    rows_s, d2_s, qperm = _batched_grid_core(queries, q_mask, targets,
                                             t_mask, r, k, cell,
                                             presorted=False)
    sidx = jnp.broadcast_to(jnp.arange(s_n, dtype=jnp.int32)[:, None],
                            (s_n, q_n))
    rows = jnp.zeros((s_n, q_n, k), jnp.int32).at[sidx, qperm].set(rows_s)
    d2 = jnp.full((s_n, q_n, k), 1e30, jnp.float32).at[sidx, qperm].set(
        d2_s)
    hit = (d2 <= (r * r)[:, None, None]) & (rows >= 0) & q_mask[..., None]
    return jnp.maximum(rows, 0), hit


def _batched_grid_core(queries, q_mask, targets, t_mask, r, k, cell,
                       presorted: bool, interpret: bool = False):
    """Kernel-side of the batched grid search.

    When presorted=False, queries are sorted by home-cell key internally
    and results come back in that SORTED order (the caller unscatters —
    batched_grid_radius_knn API). When presorted=True, queries must
    already be ~monotone in home-cell key and results come back in the
    given query order — batch_colocation_groups uses this and keeps its
    group tables in the permuted order instead of paying two
    [S, Q, K]-sized unscatters.
    """
    from ..core.pallas_radius import windowed_cell_topk

    s_n, q_n, _ = queries.shape
    t_n = targets.shape[1]

    # invalid rows carry the KERNEL's sentinel (pallas_radius._SENTINEL,
    # 0x7FFFFFFF), not _cell_key's int30 one: sentinel probes are then
    # excluded from the per-tile window extrema (fully-padded tiles skip
    # their DMA+compute entirely) and can never key-match the
    # sentinel'd invalid-target run. (_cell_key's own sentinel stays
    # int30 for grid_radius_knn's 2*key+1 merge trick.)
    ksen = jnp.int32(0x7FFFFFFF)
    tkey, t_ok = _cell_key(jnp.floor(
        jnp.where(t_mask[..., None], targets, 1e30) / cell
    ).astype(jnp.int32), t_mask)
    tkey = jnp.where(t_ok, tkey, ksen)
    tx = jnp.where(t_ok[..., None], targets, 1e30)
    iota_t = jnp.broadcast_to(jnp.arange(t_n, dtype=jnp.int32),
                              (s_n, t_n))
    tkey_s, trow_s = jax.lax.sort((tkey, iota_t), num_keys=1)
    txyz_s = jnp.take_along_axis(tx, trow_s[..., None], axis=1)

    qx, pbase = _octant_base(queries, q_mask, cell)  # [S, Q]

    qperm = None
    if not presorted:
        iota_q = jnp.broadcast_to(jnp.arange(q_n, dtype=jnp.int32),
                                  (s_n, q_n))
        _, qperm = jax.lax.sort((pbase, iota_q), num_keys=1)
        pbase = jnp.take_along_axis(pbase, qperm, axis=1)
        qx = jnp.take_along_axis(qx, qperm[..., None], axis=1)

    rows, d2 = windowed_cell_topk(tkey_s, trow_s, txyz_s, pbase, qx,
                                  r * r, k, interpret=interpret)
    return rows, d2, qperm


@partial(jax.jit, static_argnames=("k", "chunk", "cell", "cell_cap"))
def build_colocation_groups(vox: VoxelizedClouds, transforms: jax.Array,
                            search_radius, k: int = 5, chunk: int = 512,
                            cell: float = None, cell_cap: int = 8
                            ) -> ColocationGroups:
    """Device rebuild of get_matching_indices_colocation
    (util/pointcloud.py:69-132), for one sample of C clouds (cloud 0 =
    center). vmap over samples for batches; see batch_colocation_groups.

    transforms: float[C, 4, 4] mapping each cloud into the center frame
    (row 0 must be identity). Global member rows are c*Nv + i.

    Group semantics: for each center voxel, the K nearest voxels within
    `search_radius` in the center cloud itself and in every aligned
    neighbor cloud form one group; the finest member is the first hit of
    the cloud whose nearest hit lies closest to its own LiDAR origin
    (default: the center voxel). Groups with no cross-cloud hit are
    invalid.
    """
    c, nv, _ = vox.xyz.shape
    center_xyz = vox.xyz[0]
    center_mask = vox.mask[0]

    aligned = jax.vmap(lambda x, t: transform_points(x, t))(vox.xyz,
                                                            transforms)

    def search(cloud_xyz, cloud_mask):
        return _knn(center_xyz, center_mask, cloud_xyz, cloud_mask,
                    search_radius, k, chunk, cell, cell_cap)

    idx, hit = jax.vmap(search)(aligned, vox.mask)  # [C, Q, k]
    return _assemble_groups(vox, idx, hit)


def _assemble_groups(vox: VoxelizedClouds, idx: jax.Array,
                     hit: jax.Array,
                     qperm: jax.Array = None) -> ColocationGroups:
    """Group tables from per-cloud radius-KNN results (idx/hit [C, Q, k]).

    When `qperm` is given, query q is center voxel row qperm[q] (the
    searches ran over home-cell-sorted queries) and the group SLOTS come
    out in that permuted order — semantically neutral: member rows are
    target rows (unaffected), and the loss only samples group slots.
    Callers must permute per-group side arrays (anchor_xyz/anchor_item)
    with the same qperm.
    """
    c, nv, _ = vox.xyz.shape
    k = idx.shape[-1]
    center_xyz = vox.xyz[0]
    center_mask = vox.mask[0]
    if qperm is not None:
        center_xyz = center_xyz[qperm]
        center_mask = center_mask[qperm]
    own_norms = jnp.linalg.norm(vox.xyz, axis=-1)  # distance to own LiDAR
    own_norms = jnp.where(vox.mask, own_norms, 1e30)

    # member table: [Q, C*k] with global rows
    row_off = (jnp.arange(c, dtype=jnp.int32) * nv)[:, None, None]
    gidx = (idx + row_off).transpose(1, 0, 2).reshape(-1, c * k)
    ghit = hit.transpose(1, 0, 2).reshape(-1, c * k)
    member_idx = jnp.where(ghit, gidx, -1)

    # finest: EXACT reference semantics (util/pointcloud.py:92-114):
    # the reference compares, per NEIGHBOR cloud, only the norm of that
    # cloud's FIRST radius hit (idx[0], nearest to the query) against
    # the center point's own norm (the default), taking the earliest
    # cloud on ties (strict <). argmin over [center_norm, first-hit
    # norms] with first-occurrence tie-break reproduces this exactly;
    # tests/test_device_pipeline.py holds the faithful numpy oracle.
    first_norm = jnp.where(hit[:, :, 0],
                           own_norms[jnp.arange(c)[:, None], idx[:, :, 0]],
                           1e30)  # [C, Q]
    center_norm = own_norms[0] if qperm is None else own_norms[0][qperm]
    cand = first_norm.T.at[:, 0].set(
        jnp.where(center_mask, center_norm, 1e30))  # [Q, C]
    win = jnp.argmin(cand, axis=1).astype(jnp.int32)
    finest_pos = win * k  # column of that cloud's first hit

    cross_hit = jnp.any(hit[1:], axis=(0, 2))
    valid = center_mask & cross_hit
    # anchor = the center voxel's INTEGER voxel coordinates, exactly what
    # the reference circle loss uses (lib/colocation_trainer.py:858
    # passes sinput_C[:, 1:]) — same semantics on every code path.
    anchor = vox.coords[0, :, 1:4]
    if qperm is not None:
        anchor = anchor[qperm]
    return ColocationGroups(
        member_idx=member_idx,
        member_mask=ghit & valid[:, None],
        finest_pos=finest_pos,
        valid=valid,
        anchor_xyz=anchor.astype(jnp.float32),
        anchor_item=jnp.zeros(nv, jnp.int32),
    )


def batch_colocation_groups(vox_b: VoxelizedClouds, transforms_b: jax.Array,
                            search_radius, k: int = 5,
                            chunk: int = 512, cell: float = None,
                            cell_cap: int = 8,
                            _interpret: bool = False) -> ColocationGroups:
    """Batched group construction: vox_b fields have a leading sample dim
    [B, C, Nv, ...]; returns groups with global rows into the flattened
    [B*C*Nv] voxel array and anchor_item = sample index. `search_radius`
    may be a scalar or a per-sample [B] array (random scaling scales the
    matching radius per sample, lib/colocation_data_loader.py:361-365).

    anchor_xyz follows the reference circle loss exactly: the *integer
    voxel coordinates* of the center voxel (lib/colocation_trainer.py:858
    passes sinput_C[:, 1:]).
    """
    b, c, nv, _ = vox_b.xyz.shape
    radius_b = jnp.broadcast_to(jnp.asarray(search_radius,
                                            jnp.float32), (b,))

    from ..core.pallas_conv import pallas_available
    _interpret = _interpret or (FORCE_INTERPRET and not pallas_available())
    if cell is not None and (pallas_available() or _interpret):
        # Batched Mosaic search (S = B*C searches share one kernel
        # launch). All C searches of a sample share the SAME queries
        # (the center cloud), so sort them by home-cell key once per
        # sample and keep the group tables in that order — group-slot
        # order is semantically neutral and this skips two [S, Q, K]
        # result unscatters.
        aligned = jax.vmap(jax.vmap(transform_points))(vox_b.xyz,
                                                       transforms_b)
        center = vox_b.xyz[:, 0]
        cmask = vox_b.mask[:, 0]
        home, _ = _cell_key(jnp.floor(
            jnp.where(cmask[..., None], center, -1e30) / cell
        ).astype(jnp.int32), cmask)
        iota = jnp.broadcast_to(jnp.arange(nv, dtype=jnp.int32), (b, nv))
        _, qperm = jax.lax.sort((home, iota), num_keys=1)  # [b, nv]
        q_sorted = jnp.take_along_axis(center, qperm[..., None], axis=1)
        m_sorted = jnp.take_along_axis(cmask, qperm, axis=1)

        queries = jnp.broadcast_to(q_sorted[:, None], (b, c, nv, 3))
        q_mask = jnp.broadcast_to(m_sorted[:, None], (b, c, nv))
        r_c = jnp.minimum(radius_b, cell * 0.5)
        r_s = jnp.broadcast_to(r_c[:, None], (b, c)).reshape(b * c)
        rows, d2, _ = _batched_grid_core(
            queries.reshape(b * c, nv, 3), q_mask.reshape(b * c, nv),
            aligned.reshape(b * c, nv, 3), vox_b.mask.reshape(b * c, nv),
            r_s, k, cell, presorted=True, interpret=_interpret)
        hit = ((d2 <= (r_s * r_s)[:, None, None]) & (rows >= 0)
               & q_mask.reshape(b * c, nv)[..., None])
        idx = jnp.maximum(rows, 0)
        groups = jax.vmap(_assemble_groups)(
            vox_b, idx.reshape(b, c, nv, k), hit.reshape(b, c, nv, k),
            qperm)
    else:
        groups = jax.vmap(
            lambda v, t, r: build_colocation_groups(v, t, r, k, chunk,
                                                    cell, cell_cap)
        )(vox_b, transforms_b, radius_b)

    sample_off = (jnp.arange(b, dtype=jnp.int32) * (c * nv))[:, None, None]
    member_idx = jnp.where(groups.member_idx >= 0,
                           groups.member_idx + sample_off, -1)
    anchor_xyz = groups.anchor_xyz
    anchor_item = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, nv))

    g = c * k
    return ColocationGroups(
        member_idx=member_idx.reshape(b * nv, g),
        member_mask=groups.member_mask.reshape(b * nv, g),
        finest_pos=groups.finest_pos.reshape(b * nv),
        valid=groups.valid.reshape(b * nv),
        anchor_xyz=anchor_xyz.reshape(b * nv, 3),
        anchor_item=anchor_item.reshape(b * nv),
    )


@partial(jax.jit, static_argnames=("k", "chunk", "cell", "cell_cap"))
def build_correspondences(xyz0: jax.Array, mask0: jax.Array,
                          xyz1: jax.Array, mask1: jax.Array,
                          trans: jax.Array, search_radius,
                          k: int = 8, chunk: int = 512,
                          cell: float = None, cell_cap: int = 8):
    """GT correspondences for a pair: all target voxels within
    `search_radius` of each transformed source voxel, capped at k per
    source (reference get_matching_indices, util/pointcloud.py:53-66;
    radius = voxel_size * positive_pair_search_voxel_size_multiplier).

    Returns (pairs int32[N0*k, 2] of (i0, i1), mask bool[N0*k]).
    """
    src = transform_points(xyz0, trans)
    idx, hit = _knn(src, mask0, xyz1, mask1, search_radius, k, chunk,
                    cell, cell_cap)
    n0 = xyz0.shape[0]
    i0 = jnp.broadcast_to(jnp.arange(n0, dtype=jnp.int32)[:, None],
                          (n0, k)).reshape(-1)
    pairs = jnp.stack([i0, idx.reshape(-1)], axis=1)
    return pairs, hit.reshape(-1)
