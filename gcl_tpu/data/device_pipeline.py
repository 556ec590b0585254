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


@partial(jax.jit, static_argnames=("k", "chunk"))
def build_colocation_groups(vox: VoxelizedClouds, transforms: jax.Array,
                            search_radius, k: int = 5, chunk: int = 512
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
    own_norms = jnp.linalg.norm(vox.xyz, axis=-1)  # distance to own LiDAR
    own_norms = jnp.where(vox.mask, own_norms, 1e30)

    aligned = jax.vmap(lambda x, t: transform_points(x, t))(vox.xyz,
                                                            transforms)

    def search(cloud_xyz, cloud_mask):
        return radius_knn(center_xyz, center_mask, cloud_xyz, cloud_mask,
                          search_radius, k, chunk)

    idx, hit = jax.vmap(search)(aligned, vox.mask)  # [C, Q, k]

    # member table: [Q, C*k] with global rows
    row_off = (jnp.arange(c, dtype=jnp.int32) * nv)[:, None, None]
    gidx = (idx + row_off).transpose(1, 0, 2).reshape(-1, c * k)
    ghit = hit.transpose(1, 0, 2).reshape(-1, c * k)
    member_idx = jnp.where(ghit, gidx, -1)

    # finest: nearest hit of each cloud, compared by its own-frame norm;
    # center voxel (column 0) is the default with its own norm
    first_norm = jnp.where(hit[:, :, 0],
                           own_norms[jnp.arange(c)[:, None], idx[:, :, 0]],
                           1e30)  # [C, Q]
    cand = first_norm.T.at[:, 0].set(
        jnp.where(center_mask, own_norms[0], 1e30))  # [Q, C]
    win = jnp.argmin(cand, axis=1).astype(jnp.int32)
    finest_pos = win * k  # column of that cloud's first hit

    cross_hit = jnp.any(hit[1:], axis=(0, 2))
    valid = center_mask & cross_hit
    return ColocationGroups(
        member_idx=member_idx,
        member_mask=ghit & valid[:, None],
        finest_pos=finest_pos,
        valid=valid,
        anchor_xyz=jnp.floor(center_xyz).astype(jnp.float32),  # placeholder
        anchor_item=jnp.zeros(nv, jnp.int32),
    )


def batch_colocation_groups(vox_b: VoxelizedClouds, transforms_b: jax.Array,
                            voxel_size, search_radius, k: int = 5,
                            chunk: int = 512) -> ColocationGroups:
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

    groups = jax.vmap(
        lambda v, t, r: build_colocation_groups(v, t, r, k, chunk)
    )(vox_b, transforms_b, radius_b)

    sample_off = (jnp.arange(b, dtype=jnp.int32) * (c * nv))[:, None, None]
    member_idx = jnp.where(groups.member_idx >= 0,
                           groups.member_idx + sample_off, -1)
    anchor_xyz = vox_b.coords[:, 0, :, 1:4].astype(jnp.float32)
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


@partial(jax.jit, static_argnames=("k", "chunk"))
def build_correspondences(xyz0: jax.Array, mask0: jax.Array,
                          xyz1: jax.Array, mask1: jax.Array,
                          trans: jax.Array, search_radius,
                          k: int = 8, chunk: int = 512):
    """GT correspondences for a pair: all target voxels within
    `search_radius` of each transformed source voxel, capped at k per
    source (reference get_matching_indices, util/pointcloud.py:53-66;
    radius = voxel_size * positive_pair_search_voxel_size_multiplier).

    Returns (pairs int32[N0*k, 2] of (i0, i1), mask bool[N0*k]).
    """
    src = transform_points(xyz0, trans)
    idx, hit = radius_knn(src, mask0, xyz1, mask1, search_radius, k, chunk)
    n0 = xyz0.shape[0]
    i0 = jnp.broadcast_to(jnp.arange(n0, dtype=jnp.int32)[:, None],
                          (n0, k)).reshape(-1)
    pairs = jnp.stack([i0, idx.reshape(-1)], axis=1)
    return pairs, hit.reshape(-1)
