"""Grid-hash nearest-neighbor search — the engine's replacement for kd-trees.

The reference leans on pointer-chasing trees everywhere: FLANN kd-trees inside PCL ICP/GICP
correspondence search, fast_gicp's kd-tree k=20 covariance neighborhoods
(`lidar_scan_matcher/src/lidar_scan_matcher.cpp:43,48`), `pcl::KdTreeFLANN::radiusSearch` in
the dormant loop detector (`graph_based_slam/src/graph_based_slam.cpp:198-206`), and a
hand-rolled recursive KDTree (`lidar_graph_slam_utils/lib/kd_tree.hpp:48-139`). Trees are
hostile to TPUs (irregular control flow, scalar pointer chasing), so this module uses a
sorted uniform grid instead:

  build:  key each point by its cell, sort once (on-chip XLA sort).
  query:  for each query, binary-search the 27 (or 7) neighbor-cell keys and gather a
          bounded bucket of consecutive points per cell — pure vectorized gathers —
          then reduce with `top_k`.

Queries only see neighbors within one cell ring, i.e. a radius of `cell_size` is guaranteed
and up to 2*cell_size diagonal; callers pick `cell_size` >= their correspondence radius.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from lidar_graph_slam_tpu.core.pointcloud import PAD_VALUE, pad_points
from lidar_graph_slam_tpu.ops.voxel import (
    INVALID_KEY,
    TABLE_DIMS,
    _NX,
    _NY,
    _NZ,
    _flat_table_index,
    build_dense_table,
    min_corner,
    pack_key,
    voxel_coords,
)

_27_OFFSETS = jnp.stack(
    jnp.meshgrid(
        jnp.arange(-1, 2, dtype=jnp.int32),
        jnp.arange(-1, 2, dtype=jnp.int32),
        jnp.arange(-1, 2, dtype=jnp.int32),
        indexing="ij",
    ),
    axis=-1,
).reshape(27, 3)


@struct.dataclass
class HashGrid:
    """Points sorted by packed cell key; cells resolved by binary search at query time."""

    keys: jax.Array       # [N] int32, ascending, INVALID_KEY padding
    points: jax.Array     # [N, 3] sorted to match keys
    starts: jax.Array     # [N] int32: for each row, index of the first row of its cell
    origin: jax.Array     # [3]
    cell_size: jax.Array  # scalar
    num: jax.Array        # scalar int32 valid count
    table: jax.Array      # [prod(TABLE_DIMS)] int32 dense cell -> first sorted row (-1)


@jax.jit
def build_hash_grid(points: jax.Array, mask: jax.Array, cell_size) -> HashGrid:
    cell_size = jnp.asarray(cell_size, dtype=points.dtype)
    origin = min_corner(points, mask) - cell_size
    keys = pack_key(voxel_coords(points, origin, 1.0 / cell_size))
    keys = jnp.where(mask, keys, INVALID_KEY)
    keys_sorted, px, py, pz = jax.lax.sort(
        (keys, points[:, 0], points[:, 1], points[:, 2]), num_keys=1
    )
    pts_sorted = jnp.stack([px, py, pz], axis=-1)
    valid = keys_sorted != INVALID_KEY
    pts_sorted = pad_points(pts_sorted, valid)
    n = keys_sorted.shape[0]
    first = jnp.concatenate([jnp.ones((1,), bool), keys_sorted[1:] != keys_sorted[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    # starts[i] = index of first row sharing keys_sorted[i]'s cell (running max of firsts).
    starts = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    return HashGrid(
        keys=keys_sorted,
        points=pts_sorted,
        starts=starts,
        origin=origin,
        cell_size=cell_size,
        num=jnp.sum(mask.astype(jnp.int32)),
        table=build_dense_table(keys_sorted, first & valid, TABLE_DIMS),
    )


def _candidate_block(grid: HashGrid, queries: jax.Array, offsets: jax.Array, bucket_cap: int):
    """Gather up to `bucket_cap` candidate points from each of the offset cells.

    Returns (cand_idx [Q, C*B], cand_valid [Q, C*B]) with indices into grid.points.
    """
    n = grid.keys.shape[0]
    coords = voxel_coords(queries, grid.origin, 1.0 / grid.cell_size)       # [Q, 3]
    ncoords = coords[:, None, :] + offsets[None, :, :]                       # [Q, C, 3]
    cell_keys = pack_key(
        jnp.clip(ncoords, 0, jnp.array([_NX - 1, _NY - 1, _NZ - 1], dtype=jnp.int32))
    )                                                                        # [Q, C]
    flat, in_range = _flat_table_index(ncoords, TABLE_DIMS)
    start = jnp.concatenate([grid.table, jnp.full((1,), -1, jnp.int32)])[flat]  # [Q, C]
    cell_hit = (start >= 0) & in_range
    start = jnp.maximum(start, 0)
    cand = start[..., None] + jnp.arange(bucket_cap, dtype=jnp.int32)        # [Q, C, B]
    cand = jnp.minimum(cand, n - 1)
    same_cell = grid.keys[cand] == cell_keys[..., None]
    valid = same_cell & cell_hit[..., None]
    q = queries.shape[0]
    return cand.reshape(q, -1), valid.reshape(q, -1)


def _candidate_dist2(grid: HashGrid, queries: jax.Array, cand_idx, cand_valid):
    """Squared distances to candidates via per-component gathers.

    Gathering [Q, C*B, 3] directly is a trap on TPU: XLA pads the size-3 trailing dim to
    a full 128-lane tile (a 29 GB allocation at SOR capacities). Three [Q, C*B] gathers
    keep every tensor lane-dense.
    """
    d2 = jnp.zeros(cand_idx.shape, dtype=grid.points.dtype)
    for c in range(3):
        comp = grid.points[:, c][cand_idx]
        d2 = d2 + (comp - queries[:, c][:, None]) ** 2
    return jnp.where(cand_valid, d2, jnp.inf)


@partial(jax.jit, static_argnames=("k", "bucket_cap"))
def knn(grid: HashGrid, queries: jax.Array, k: int, bucket_cap: int = 32):
    """k nearest neighbors within the 27-cell neighborhood of each query.

    Returns (idx [Q, k] into grid.points, dist2 [Q, k], valid [Q, k]). Padded query rows
    (at PAD_VALUE) return all-invalid results naturally.
    """
    cand_idx, cand_valid = _candidate_block(grid, queries, _27_OFFSETS, bucket_cap)
    d2 = _candidate_dist2(grid, queries, cand_idx, cand_valid)
    neg_top, top_pos = jax.lax.top_k(-d2, k)
    top_d2 = -neg_top
    idx = jnp.take_along_axis(cand_idx, top_pos, axis=1)
    return idx, top_d2, jnp.isfinite(top_d2)


@partial(jax.jit, static_argnames=("bucket_cap",))
def nearest(grid: HashGrid, queries: jax.Array, bucket_cap: int = 32):
    """Single nearest neighbor within one cell ring: (idx [Q], dist2 [Q], found [Q])."""
    cand_idx, cand_valid = _candidate_block(grid, queries, _27_OFFSETS, bucket_cap)
    d2 = _candidate_dist2(grid, queries, cand_idx, cand_valid)
    j = jnp.argmin(d2, axis=1)
    best = jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]
    idx = jnp.take_along_axis(cand_idx, j[:, None], axis=1)[:, 0]
    return idx, best, jnp.isfinite(best)


def radius_mask(positions: jax.Array, mask: jax.Array, query: jax.Array, radius) -> jax.Array:
    """Dense radius search over a small point set (keyframe positions, <= O(10^4)): the
    TPU-appropriate stand-in for `pcl::KdTreeFLANN::radiusSearch` on keyframe centers
    (`graph_based_slam.cpp:198-206`). Plain vectorized distances beat any tree here."""
    d2 = jnp.sum((positions - query[None, :]) ** 2, axis=-1)
    return mask & (d2 < radius * radius)
