"""Device-side LBVH construction (Morton codes + radix tree), pure JAX.

TPU-native replacement for the Radeon Rays BVH builders: the reference's only
GPU-side build is the Morton/radix-sort HLBVH (``src/accelerator/hlbvh.cpp``
:65-201 + ``build_hlbvh.cl``); its CPU SAH builders (``bvh.cpp``,
``split_bvh.cpp``) don't map to TPU.  This module builds the same class of
structure — a linear BVH over Morton-sorted triangles — as a handful of dense,
fully-parallel XLA ops:

  1. triangle AABBs + centroids                      (elementwise)
  2. 30-bit Morton codes on normalized centroids     (elementwise bit ops)
  3. sort                                            (XLA sort)
  4. binary radix-tree topology (Karras 2012, the standard parallel
     construction also used by HLBVH-family builders): every internal node's
     range/split found independently with O(32) branch-free bit searches —
     perfectly data-parallel, no recursion                    (vectorized)
  5. bottom-up AABB fit by fixpoint iteration: internal boxes converge in
     tree-height steps of gather+union — replaces the GPU atomic-flag walk
     with a deterministic dense loop                          (while_loop)

The result is an SoA pytree (`LBVH`) that traversal kernels (JAX or Pallas)
consume; it shards/replicates like any other scene array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import BVHConfig
from ..scene.scene import Geometry

F32_MAX = jnp.finfo(jnp.float32).max


class LBVH(struct.PyTreeNode):
    """Linear BVH over L leaves of up to ``leaf_size`` morton-consecutive
    triangles.  2L-1 nodes: indices [0, L-1) internal, [L-1, 2L-1) leaves.
    Leaf k (node L-1+k) holds sorted triangles
    ``prim[k*leaf_size : (k+1)*leaf_size]`` (padding slots invalid).

    Traversal layouts are **transposed** (component-major): on TPU a gather
    must put the ray batch in the 128-lane minor dimension — gathering
    (C, L)-shaped tables along axis 1 yields (C, N) with N in lanes, ~10x
    faster than AoS row gathers whose tiny trailing dims get padded to 128.

    - ``packed_t`` (12, L-1): both children's slabs per internal node
      [lmin(3), lmax(3), rmin(3), rmax(3)];
    - ``children`` (2, L-1) i32: left/right child node ids;
    - ``leaf_t`` (9*leaf_size, L): each leaf's triangles as precomputed
      Möller-Trumbore (p0, e1, e2) components — the same precomputed-edge
      trick the reference's traversal kernels use per leaf;
    - ``unified_t`` ((24, 2L-1), with ``unified_ci`` (2, 2L-1) i32): one
      table holding internal rows AND leaf rows (leaf_size=2: 18 floats) so
      the hot loop issues exactly ONE gather per node visit — gather traffic
      is the measured bottleneck of TPU traversal.  Populated only when
      leaf_size == 2."""

    node_min: jax.Array  # (2L-1, 3)
    node_max: jax.Array  # (2L-1, 3)
    left: jax.Array  # (L-1,) child node index
    right: jax.Array  # (L-1,)
    prim: jax.Array  # (L*leaf_size,) global triangle id per leaf slot (-1 pad)
    prim_valid: jax.Array  # (L*leaf_size,) bool
    packed_t: jax.Array  # (12, L-1) transposed slab components
    children: jax.Array  # (2, L-1) i32
    leaf_t: jax.Array  # (9*leaf_size, L) transposed leaf triangle components
    unified_t: jax.Array | None  # (24, 2L-1) f32 unified node/leaf rows
    unified_ci: jax.Array | None  # (2, 2L-1) i32 children (leaf rows: -1)
    leaf_size: int = struct.field(pytree_node=False, default=4)

    @property
    def num_leaves(self) -> int:
        return self.leaf_t.shape[1]

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


def _clz32(x: jax.Array) -> jax.Array:
    """Count leading zeros of uint32, branch-free 5-step reduction."""
    x = x.astype(jnp.uint32)
    n = jnp.full(x.shape, 32, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        big = x >= (jnp.uint32(1) << shift)
        n = jnp.where(big, n - shift, n)
        x = jnp.where(big, x >> shift, x)
    return n - x.astype(jnp.int32)  # x is now 0 or 1


def _expand_bits10(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of v so they occupy every 3rd bit (Morton)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(p01: jax.Array) -> jax.Array:
    """30-bit Morton code from points normalized to [0,1]^3 ((..., 3))."""
    q = jnp.clip(p01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits10(q[..., 0]) << 2)
        | (_expand_bits10(q[..., 1]) << 1)
        | _expand_bits10(q[..., 2])
    )


def triangle_bounds(geom: Geometry):
    """(F,3) min / max / centroid over the triangle soup; padding faces get
    point boxes collapsed to the scene min so they never win a traversal."""
    idx = geom.indices
    p0 = jnp.take(geom.positions, idx[:, 0], axis=0)
    p1 = jnp.take(geom.positions, idx[:, 1], axis=0)
    p2 = jnp.take(geom.positions, idx[:, 2], axis=0)
    bmin = jnp.minimum(jnp.minimum(p0, p1), p2)
    bmax = jnp.maximum(jnp.maximum(p0, p1), p2)
    valid = geom.face_valid[:, None]
    bmin = jnp.where(valid, bmin, F32_MAX)
    bmax = jnp.where(valid, bmax, -F32_MAX)
    centroid = jnp.where(valid, 0.5 * (bmin + bmax), 0.0)
    return bmin, bmax, centroid


def _delta_fn(codes: jax.Array, n: int):
    """delta(i, j): common-prefix length of (code, index) keys — index bits
    break Morton ties (Karras §4); out-of-range j gives -1."""

    def delta(i, j):
        in_range = (j >= 0) & (j <= n - 1)
        jc = jnp.clip(j, 0, n - 1)
        ci = jnp.take(codes, jnp.clip(i, 0, n - 1))
        cj = jnp.take(codes, jc)
        same = ci == cj
        d_code = _clz32(ci ^ cj)
        d_idx = 32 + _clz32(i.astype(jnp.uint32) ^ jc.astype(jnp.uint32))
        return jnp.where(in_range, jnp.where(same, d_idx, d_code), -1)

    return delta


def _radix_tree(codes: jax.Array):
    """Karras 2012 binary radix tree topology, vectorized over the n-1
    internal nodes.  Returns (left, right) child node ids in the LBVH node
    numbering (internal i -> i, leaf k -> n-1+k)."""
    n = codes.shape[0]
    i = jnp.arange(n - 1, dtype=jnp.int32)
    delta = _delta_fn(codes, n)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # upper bound on range length: doubling search (bounded by 32 steps
    # since code+index keys are ≤64 bits → delta ≤ 64 → ranges ≤ n ≤ 2^31)
    lmax = jnp.full_like(i, 2)
    for _ in range(32):
        probe = delta(i, i + lmax * d) > delta_min
        lmax = jnp.where(probe, lmax << 1, lmax)
    # binary search for exact length l
    l = jnp.zeros_like(i)
    t = lmax >> 1
    for _ in range(32):
        cond = (t >= 1) & (delta(i, i + (l + t) * d) > delta_min)
        l = jnp.where(cond, l + t, l)
        t = t >> 1
    j = i + l * d

    # split position: largest s with delta(i, i + s*d) > delta(i, j)
    delta_node = delta(i, j)
    s = jnp.zeros_like(i)
    # ceil-halving series of l
    t = l
    for _ in range(32):
        t = (t + 1) >> 1
        cond = delta(i, i + (s + t) * d) > delta_node
        s = jnp.where(cond & (t >= 1), s + t, s)
        t = jnp.where(t == 1, 0, t)
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    leaf_base = n - 1
    left = jnp.where(lo == gamma, leaf_base + gamma, gamma)
    right = jnp.where(hi == gamma + 1, leaf_base + gamma + 1, gamma + 1)
    return left.astype(jnp.int32), right.astype(jnp.int32)


def build_lbvh(geom: Geometry, cfg: BVHConfig | None = None,
               leaf_size: int = 2) -> LBVH:
    """Full device-side build — the ``IntersectionApi::Commit`` analogue for
    the LBVH path (``hlbvh.cpp:65-201`` role).

    Triangles are Morton-sorted, grouped into leaves of ``leaf_size``
    consecutive triangles (the reference's builders likewise emit multi-
    primitive leaves, ``bvh.h:39-110`` max_leaf), and the Karras radix tree is
    built over the leaf keys."""
    if cfg is not None:
        leaf_size = cfg.max_leaf_size
    bmin, bmax, centroid = triangle_bounds(geom)
    n = bmin.shape[0]
    assert n % leaf_size == 0, (n, leaf_size)
    num_leaves = n // leaf_size

    scene_min = jnp.min(bmin, axis=0)
    scene_max = jnp.max(bmax, axis=0)
    extent = jnp.maximum(scene_max - scene_min, 1e-12)
    codes = morton3d((centroid - scene_min) / extent)
    # push padding faces to the end of the sort: max code
    codes = jnp.where(geom.face_valid, codes, jnp.uint32(0xFFFFFFFF))

    order = jnp.argsort(codes).astype(jnp.int32)
    codes_s = jnp.take(codes, order)
    bmin_s = jnp.take(bmin, order, axis=0)
    bmax_s = jnp.take(bmax, order, axis=0)
    valid_s = jnp.take(geom.face_valid, order)

    # leaf AABBs: union over each group of leaf_size sorted triangles
    leaf_min = jnp.min(bmin_s.reshape(num_leaves, leaf_size, 3), axis=1)
    leaf_max = jnp.max(bmax_s.reshape(num_leaves, leaf_size, 3), axis=1)
    leaf_codes = codes_s[::leaf_size]

    left, right = _radix_tree(leaf_codes)

    # node arrays: [0, L-1) internal, [L-1, 2L-1) leaves
    num_nodes = 2 * num_leaves - 1
    node_min = jnp.full((num_nodes, 3), F32_MAX, jnp.float32)
    node_max = jnp.full((num_nodes, 3), -F32_MAX, jnp.float32)
    node_min = node_min.at[num_leaves - 1 :].set(leaf_min)
    node_max = node_max.at[num_leaves - 1 :].set(leaf_max)

    # bottom-up fit: fixpoint of parent = union(children).  Converges in
    # tree-height iterations; loop until no box changes (capped).
    def fit_step(state):
        node_min, node_max, changed, it = state
        lmin = jnp.take(node_min, left, axis=0)
        lmax = jnp.take(node_max, left, axis=0)
        rmin = jnp.take(node_min, right, axis=0)
        rmax = jnp.take(node_max, right, axis=0)
        new_imin = jnp.minimum(lmin, rmin)
        new_imax = jnp.maximum(lmax, rmax)
        old_imin = node_min[: num_leaves - 1]
        old_imax = node_max[: num_leaves - 1]
        changed = jnp.any((new_imin != old_imin) | (new_imax != old_imax))
        node_min = node_min.at[: num_leaves - 1].set(new_imin)
        node_max = node_max.at[: num_leaves - 1].set(new_imax)
        return node_min, node_max, changed, it + 1

    def fit_cond(state):
        _, _, changed, it = state
        return changed & (it < num_nodes)

    node_min, node_max, _, _ = jax.lax.while_loop(
        fit_cond, fit_step, (node_min, node_max, jnp.asarray(True), jnp.asarray(0))
    )

    # ---- transposed traversal layouts ---------------------------------
    lmin = jnp.take(node_min, left, axis=0)
    lmax = jnp.take(node_max, left, axis=0)
    rmin = jnp.take(node_min, right, axis=0)
    rmax = jnp.take(node_max, right, axis=0)
    packed_t = jnp.concatenate([lmin, lmax, rmin, rmax], axis=1).T  # (12, L-1)
    children = jnp.stack([left, right], axis=0)  # (2, L-1)

    tri = jnp.take(geom.indices, jnp.maximum(order, 0), axis=0)
    p0 = jnp.take(geom.positions, tri[:, 0], axis=0)
    p1 = jnp.take(geom.positions, tri[:, 1], axis=0)
    p2 = jnp.take(geom.positions, tri[:, 2], axis=0)
    # degenerate rows for padding slots never report hits (zero edges)
    e1 = jnp.where(valid_s[:, None], p1 - p0, 0.0)
    e2 = jnp.where(valid_s[:, None], p2 - p0, 0.0)
    # (n, 9) -> (L, leaf_size*9) -> transpose to component-major (36, L)
    leaf_rows = jnp.concatenate([p0, e1, e2], axis=1).reshape(
        num_leaves, leaf_size * 9
    )
    leaf_t = leaf_rows.T

    # unified single-gather table (leaf_size == 2 only): node i ->
    # internal rows [0, L-1) hold 12 slab floats; leaf rows hold 18 tri floats
    unified_t = None
    unified_ci = None
    if leaf_size == 2:
        internal_rows = jnp.concatenate(
            [packed_t, jnp.zeros((12, num_leaves - 1), jnp.float32)], axis=0
        )  # (24, L-1)
        leaf_rows24 = jnp.concatenate(
            [leaf_t, jnp.zeros((6, num_leaves), jnp.float32)], axis=0
        )  # (24, L)
        unified_t = jnp.concatenate([internal_rows, leaf_rows24], axis=1)
        unified_ci = jnp.concatenate(
            [children, jnp.full((2, num_leaves), -1, jnp.int32)], axis=1
        )

    return LBVH(
        node_min=node_min,
        node_max=node_max,
        left=left,
        right=right,
        prim=order,
        prim_valid=valid_s,
        packed_t=packed_t,
        children=children,
        leaf_t=leaf_t,
        unified_t=unified_t,
        unified_ci=unified_ci,
        leaf_size=leaf_size,
    )
