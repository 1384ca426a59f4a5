"""Pallas blocked-dense intersection engine (the TPU-native "BVH").

Role of the reference's native intersection engine (Radeon Rays traversal
drivers + CL kernels, ``src/intersector/intersector_skip_links.cpp`` +
``kernels/CL/intersect_bvh2_skiplinks.cl``), redesigned for the TPU's dense
vector model instead of translated:

- A pointer-chasing BVH traversal is gather-bound, and Mosaic exposes no
  per-lane VMEM gather (measured: ``jnp.take``/``take_along_axis`` do not
  lower; one-hot matmul gathers are exact only at ``precision=HIGHEST`` and
  scale O(nodes x rays)).  So instead of a deep tree we build a *two-level
  wide structure*: triangles are Morton-ordered and packed into fixed-size
  blocks of ``BLOCK`` (=128) with one AABB per block.
- Grid = (ray_tiles, tri_chunks).  The chunk axis streams the triangle table
  through VMEM (auto double-buffered by the Pallas pipeline — scales to any
  scene size); the per-tile outputs are revisited across the chunk axis and
  act as the accumulator, like a matmul K-loop.
- Within a chunk, each block's AABB (scalars in SMEM) is slab-tested against
  the whole ray tile and the dense (BLOCK x T) Möller-Trumbore is *skipped*
  via ``lax.cond`` unless some live ray enters closer than its current best —
  tile-granularity traversal, the TPU analogue of warp-coherent BVH descent.

Layout rules learned on-chip (v5e):

- **rays live on lanes**: all per-ray running state is (1, T) — 8 vregs per
  1024 rays.  The transposed (T, 1) layout wastes a 128x-padded vreg per 8
  rays, and carrying four such accumulators through ``lax.cond`` spills
  ~512 vregs per block visit (measured 9 us/block — 25x slower).
- the (BLOCK, T) test matrix puts triangles on sublanes: per-ray reductions
  (min / argmin / any) are sublane reductions ending in (1, T).
- block AABBs are scalars in SMEM driving control flow; triangle block data
  is (BLOCK, 9) rows sliced from the streamed chunk.

Ray coherence: callers should pass rays Morton-sorted by direction/origin
so tiles are coherent and culling is effective — same mitigation as the
reference's wavefront pixel-order launches.

Differentiation: hits are discrete events; the queries carry a custom_vjp
returning zero cotangents (SURVEY §7 build-plan item 7) — parameter
gradients (materials/lights) never flow through intersection.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BuilderType, BVHConfig
from ..core.types import Hit, Rays
from ..scene.scene import Geometry

BLOCK = 128  # triangles per block (sublane axis of the test matrix)
TILE = 1024  # rays per grid step (lane axis; 8 lane-rows of 128)
SUPER = 8  # blocks per super-block (CHUNK_SUPERS must be >= 8 sublanes)
CHUNK_BLOCKS = 64  # tri blocks per streamed chunk
CHUNK = CHUNK_BLOCKS * BLOCK
CHUNK_SUPERS = CHUNK_BLOCKS // SUPER
F32_MAX = float(jnp.finfo(jnp.float32).max)
BIG = 3.0e38  # python float: jnp scalars would be captured consts in kernels


class BlockedAccel(struct.PyTreeNode):
    """Morton-blocked triangle table (the device accel pytree).

    ``tri``: (NT, 9) p0/e1/e2 rows, NT a multiple of CHUNK; padding rows are
    degenerate (e1=e2=0 -> det 0 -> miss).
    ``aabb``: (NB, 8) per-block lo.xyz/hi.xyz rows (cols 6..7 padding), kept
    in SMEM — block bounds are scalars driving the cull branch; padded
    blocks have lo=+BIG so the slab test culls them.
    ``slot_prim``: (NT,) sorted-slot -> original primitive id (-1 padding).
    """

    tri: jax.Array
    aabb: jax.Array
    saabb: jax.Array  # (NB // SUPER, 8) union AABBs, the second cull level
    slot_prim: jax.Array
    bounds: jax.Array  # (2, 3) scene lo/hi for the ray-coherence sort key
    num_blocks: int = struct.field(pytree_node=False)

    @property
    def num_slots(self) -> int:
        return self.tri.shape[0]


def _morton_u32(c01: np.ndarray) -> np.ndarray:
    """30-bit Morton code from (N, 3) coordinates in [0, 1] (host build)."""
    v = np.clip((c01 * 1024.0).astype(np.uint32), 0, 1023).astype(np.uint64)

    def expand(x):
        x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
        return x

    return (
        (expand(v[:, 0]) << np.uint64(2))
        | (expand(v[:, 1]) << np.uint64(1))
        | expand(v[:, 2])
    ).astype(np.uint64)


def build_blocked(geom: Geometry,
                  cfg: BVHConfig | None = None) -> BlockedAccel:
    """Host-side build (the ``IntersectionApi::Commit`` analogue for this
    strategy).  Two block decompositions, selected by ``cfg.builder``
    (mirroring the reference's SAH-vs-median builder option,
    ``PathTracingSettings.h:157-255``):

    - LBVH (default): Morton-order triangles, cut into fixed 128-slot
      blocks.  O(N log N) sort, no native dependency.
    - SAH: binned-SAH top-down partition (native C++,
      ``native/mcrt_native.cpp`` — ``Bvh::FindSahSplit`` analogue) whose
      leaves become blocks: tighter AABBs, fewer entered blocks per tile,
      at the cost of partially-filled blocks.  Falls back to LBVH when the
      native library is unavailable.
    """
    cfg = cfg or BVHConfig()
    pos = np.asarray(geom.positions)
    idx = np.asarray(geom.indices)
    valid = np.asarray(geom.face_valid)
    prim_ids = np.nonzero(valid)[0].astype(np.int32)
    tri_idx = idx[prim_ids]

    sah = None
    if cfg.builder == BuilderType.SAH:
        try:
            from ..runtime.native import sah_block_order

            sah = sah_block_order(pos, tri_idx, BLOCK, cfg.sah_bins)
        except ImportError:
            sah = None

    if sah is not None:
        order, bstart = sah
        # scatter each SAH leaf into its own fixed 128-slot block
        n_real_blocks = len(bstart) - 1
        slots = np.full((n_real_blocks * BLOCK,), -1, np.int64)
        for b in range(n_real_blocks):
            s0, e0 = bstart[b], bstart[b + 1]
            slots[b * BLOCK: b * BLOCK + (e0 - s0)] = order[s0:e0]
        filled = slots >= 0
        src = np.clip(slots, 0, None)
        p0 = np.where(filled[:, None], pos[tri_idx[src, 0]], 0.0)
        p1 = np.where(filled[:, None], pos[tri_idx[src, 1]], 0.0)
        p2 = np.where(filled[:, None], pos[tri_idx[src, 2]], 0.0)
        slot_ids = np.where(filled, prim_ids[src], -1).astype(np.int32)
        n = len(slots)
    else:
        cent_pos = (pos[tri_idx[:, 0]] + pos[tri_idx[:, 1]]
                    + pos[tri_idx[:, 2]]) / 3.0
        lo = cent_pos.min(0)
        span = np.maximum(cent_pos.max(0) - lo, 1e-12)
        order = np.argsort(_morton_u32((cent_pos - lo) / span), kind="stable")
        p0 = pos[tri_idx[order, 0]]
        p1 = pos[tri_idx[order, 1]]
        p2 = pos[tri_idx[order, 2]]
        slot_ids = prim_ids[order].astype(np.int32)
        n = p0.shape[0]

    nt = max(CHUNK, -(-n // CHUNK) * CHUNK)
    tri = np.zeros((nt, 9), np.float32)
    tri[:n, 0:3] = p0
    tri[:n, 3:6] = p1 - p0
    tri[:n, 6:9] = p2 - p0

    nb = nt // BLOCK
    aabb = np.empty((nb, 8), np.float32)
    aabb[:, 0:3] = BIG
    aabb[:, 3:6] = -BIG
    aabb[:, 6:8] = 0.0
    pmin = np.minimum(np.minimum(p0, p1), p2)
    pmax = np.maximum(np.maximum(p0, p1), p2)
    # per-block bounds over REAL slots only (padding/unfilled excluded)
    real = slot_ids >= 0 if sah is not None else np.ones((n,), bool)
    for b in range(nb):
        s, e = b * BLOCK, min((b + 1) * BLOCK, n)
        if s < n and real[s:e].any():
            m = real[s:e]
            aabb[b, 0:3] = pmin[s:e][m].min(0)
            aabb[b, 3:6] = pmax[s:e][m].max(0)

    ns = nb // SUPER
    saabb = np.empty((ns, 8), np.float32)
    saabb[:, 0:3] = aabb[:, 0:3].reshape(ns, SUPER, 3).min(1)
    saabb[:, 3:6] = aabb[:, 3:6].reshape(ns, SUPER, 3).max(1)
    saabb[:, 6:8] = 0.0

    # empty (padded) boxes must FAIL the slab test.  An inverted box
    # (lo=+BIG > hi=-BIG) *passes* it — the per-axis min/max swap turns it
    # into a full-range interval — so poison empties with NaN: NaN
    # comparisons are false, which culls unconditionally.
    for t in (aabb, saabb):
        empty = t[:, 0] > t[:, 3]
        t[empty, 0:6] = np.nan

    slot_prim = np.full((nt,), -1, np.int32)
    slot_prim[:n] = slot_ids
    if sah is not None:
        rm = real
        bounds = np.stack([pmin[rm].min(0), pmax[rm].max(0)]).astype(np.float32)
    else:
        bounds = np.stack([pmin.min(0), pmax.max(0)]).astype(np.float32)
    return BlockedAccel(
        tri=jnp.asarray(tri),
        aabb=jnp.asarray(aabb),
        saabb=jnp.asarray(saabb),
        slot_prim=jnp.asarray(slot_prim),
        bounds=jnp.asarray(bounds),
        num_blocks=nb,
    )


def _expand10(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.uint32)
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _coherence_order(rays: Rays, bounds: jax.Array) -> jax.Array:
    """6D Morton sort key (origin cell, high bits | direction cell): groups
    incoherent bounce rays so the kernel's tile-level culling bites —
    measured 2.1x on fully random rays at 244k tris.  The reference gets
    this for free from SIMT per-ray traversal; a lockstep tile machine has
    to create the coherence."""
    lo, hi = bounds[0], bounds[1]
    p01 = (rays.o - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((p01 * 64.0).astype(jnp.int32), 0, 63)
    dq = jnp.clip(((rays.d * 0.5 + 0.5) * 8.0).astype(jnp.int32), 0, 7)
    code = (_expand10(q[:, 0]) << 2) | (_expand10(q[:, 1]) << 1) | _expand10(q[:, 2])
    dcode = (_expand10(dq[:, 0]) << 2) | (_expand10(dq[:, 1]) << 1) | _expand10(dq[:, 2])
    return jnp.argsort((code << 9) | dcode).astype(jnp.int32)


def _pack_rays(rays: Rays) -> jax.Array:
    """(8, Npad) transposed ray table: rows o.xyz, d.xyz, tmin, tmax — rays
    on lanes.  Inactive rays get tmax=-BIG so every test fails."""
    n = rays.n
    npad = -(-n // TILE) * TILE
    tmax = jnp.where(rays.active, jnp.minimum(rays.tmax, BIG), -BIG)
    packed = jnp.concatenate(
        [rays.o, rays.d, rays.tmin[:, None], tmax[:, None]], axis=1
    ).T  # (8, N)
    if npad != n:
        pad = jnp.zeros((8, npad - n), jnp.float32).at[7].set(-BIG)
        packed = jnp.concatenate([packed, pad], axis=1)
    return packed


def _ray_rows(rt):
    ox, oy, oz = rt[0:1], rt[1:2], rt[2:3]  # (1, T)
    dx, dy, dz = rt[3:4], rt[4:5], rt[5:6]
    tmn, tmx = rt[6:7], rt[7:8]
    sd = lambda c: jnp.where(jnp.abs(c) > 1e-12, c, 1e-12)
    return ox, oy, oz, dx, dy, dz, 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz), tmn, tmx


def _mt_block(rows, ox, oy, oz, dx, dy, dz, tmn, tmx, best_t):
    """Dense (BLOCK, T) Möller-Trumbore: tri components (BLOCK, 1) against
    ray components (1, T)."""
    p0x, p0y, p0z = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
    e1x, e1y, e1z = rows[:, 3:4], rows[:, 4:5], rows[:, 5:6]
    e2x, e2y, e2z = rows[:, 6:7], rows[:, 7:8], rows[:, 8:9]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = jnp.abs(det) > 1e-9
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    hit = (
        ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmn) & (t < tmx) & (t < best_t)
    )
    return t, u, v, hit


def _slab_block(a6, ox, oy, oz, ix, iy, iz, tmn, tmx):
    """(1, T) slab test of the ray tile against one block AABB (scalars)."""
    tx0, tx1 = (a6[0] - ox) * ix, (a6[3] - ox) * ix
    ty0, ty1 = (a6[1] - oy) * iy, (a6[4] - oy) * iy
    tz0, tz1 = (a6[2] - oz) * iz, (a6[5] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), tmn),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), tmx),
    )
    return tn, tf


def _intersect_kernel(rays_ref, tri_ref, aabb_ref, saabb_ref,
                      t_ref, slot_ref, u_ref, v_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        t_ref[:] = jnp.full((1, TILE), BIG, jnp.float32)
        slot_ref[:] = jnp.full((1, TILE), -1, jnp.int32)
        u_ref[:] = jnp.zeros((1, TILE), jnp.float32)
        v_ref[:] = jnp.zeros((1, TILE), jnp.float32)

    rt = rays_ref[:]
    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmn, tmx = _ray_rows(rt)
    sub = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, TILE), 0)

    def slab_enter(table_ref, row, tmax_eff):
        a6 = [table_ref[row, i] for i in range(6)]
        tn, tf = _slab_block(a6, ox, oy, oz, ix, iy, iz, tmn, tmax_eff)
        return jnp.any(tn <= tf)

    def visit_block(b, carry):
        best_t = carry[0]
        g = c * CHUNK_BLOCKS + b  # global block id (for slot numbering)
        enter = slab_enter(aabb_ref, b, jnp.minimum(tmx, best_t))

        def run(cy):
            bt, bs, bu, bv = cy
            rows = tri_ref[pl.ds(b * BLOCK, BLOCK), :]  # (BLOCK, 9)
            t, u, v, hit = _mt_block(rows, ox, oy, oz, dx, dy, dz,
                                     tmn, tmx, bt)
            tm = jnp.where(hit, t, BIG)
            tnew = jnp.min(tm, axis=0, keepdims=True)  # (1, T)
            better = tnew < bt
            j = jnp.argmin(tm, axis=0)[None, :].astype(jnp.int32)
            onehot = sub == j
            pick = lambda x: jnp.sum(jnp.where(onehot, x, 0.0), axis=0,
                                     keepdims=True)
            bs = jnp.where(better, g * BLOCK + j, bs)
            bu = jnp.where(better, pick(u), bu)
            bv = jnp.where(better, pick(v), bv)
            bt = jnp.where(better, tnew, bt)
            return bt, bs, bu, bv

        return jax.lax.cond(enter, run, lambda cy: cy, carry)

    def visit_super(sidx, carry):
        enter = slab_enter(saabb_ref, sidx, jnp.minimum(tmx, carry[0]))
        return jax.lax.cond(
            enter,
            lambda cy: jax.lax.fori_loop(
                sidx * SUPER, (sidx + 1) * SUPER, visit_block, cy
            ),
            lambda cy: cy,
            carry,
        )

    init = (t_ref[:], slot_ref[:], u_ref[:], v_ref[:])
    best_t, best_slot, best_u, best_v = jax.lax.fori_loop(
        0, CHUNK_SUPERS, visit_super, init
    )
    t_ref[:] = best_t
    slot_ref[:] = best_slot
    u_ref[:] = best_u
    v_ref[:] = best_v


def _occluded_kernel(rays_ref, tri_ref, aabb_ref, saabb_ref, out_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros((1, TILE), jnp.float32)

    rt = rays_ref[:]
    ox, oy, oz, dx, dy, dz, ix, iy, iz, tmn, tmx = _ray_rows(rt)
    live0 = tmx > tmn  # inactive rays encoded with tmax=-BIG
    # blocked is carried as f32 0/1: i1 vectors carried across cond/while
    # boundaries hit Mosaic mask-layout mismatches (observed on v5e)

    def slab_enter(table_ref, row, open_t):
        a6 = [table_ref[row, i] for i in range(6)]
        tn, tf = _slab_block(a6, ox, oy, oz, ix, iy, iz, tmn, open_t)
        return jnp.any(tn <= tf)

    def visit_block(b, blocked):
        open_t = jnp.where(blocked > 0.0, -BIG, tmx)  # blocked lanes: no-op
        enter = slab_enter(aabb_ref, b, open_t)

        def run(blk):
            rows = tri_ref[pl.ds(b * BLOCK, BLOCK), :]
            _, _, _, hit = _mt_block(rows, ox, oy, oz, dx, dy, dz, tmn, tmx,
                                     jnp.where(blk > 0.0, -BIG, BIG))
            any_hit = jnp.max(hit.astype(jnp.float32), axis=0, keepdims=True)
            return jnp.maximum(blk, any_hit)

        return jax.lax.cond(enter, run, lambda x: x, blocked)

    def cond(state):
        sidx, blocked = state
        return (sidx < CHUNK_SUPERS) & jnp.any(live0 & (blocked == 0.0))

    def body(state):
        sidx, blocked = state
        open_t = jnp.where(blocked > 0.0, -BIG, tmx)
        enter = slab_enter(saabb_ref, sidx, open_t)
        blocked = jax.lax.cond(
            enter,
            lambda blk: jax.lax.fori_loop(
                sidx * SUPER, (sidx + 1) * SUPER, visit_block, blk
            ),
            lambda blk: blk,
            blocked,
        )
        return sidx + 1, blocked

    _, blocked = jax.lax.while_loop(
        cond, body, (jnp.int32(0), out_ref[:])
    )
    out_ref[:] = blocked


def _interpret() -> bool:
    # interpret off-TPU (CPU tests); jax.default_backend() can raise on
    # tunneled platforms, so probe the device list instead
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


_COMPILER_PARAMS = dict(
    dimension_semantics=("arbitrary", "arbitrary"),
    vmem_limit_bytes=64 * 2**20,
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _query_closest(rays_packed, tri, aabb, saabb, num_blocks):
    npad = rays_packed.shape[1]
    grid = (npad // TILE, tri.shape[0] // CHUNK)
    t, slot, u, v = pl.pallas_call(
        _intersect_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 9), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            # per-chunk SMEM windows: SMEM rows pad to 512 B each, so whole
            # tables would cap the scene at ~2000 blocks (1 MiB SMEM)
            pl.BlockSpec((CHUNK_BLOCKS, 8), lambda i, c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK_SUPERS, 8), lambda i, c: (c, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(**_COMPILER_PARAMS),
        interpret=_interpret(),
    )(rays_packed, tri, aabb, saabb)
    return t, slot, u, v


def _query_closest_fwd(rays_packed, tri, aabb, saabb, num_blocks):
    return _query_closest(rays_packed, tri, aabb, saabb, num_blocks), None


def _query_closest_bwd(num_blocks, _res, _ct):
    # hits are discrete events: zero cotangents into rays/geometry
    return None, None, None, None


_query_closest.defvjp(_query_closest_fwd, _query_closest_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _query_any(rays_packed, tri, aabb, saabb, num_blocks):
    npad = rays_packed.shape[1]
    grid = (npad // TILE, tri.shape[0] // CHUNK)
    out = pl.pallas_call(
        _occluded_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i, c: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, 9), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            # per-chunk SMEM windows: SMEM rows pad to 512 B each, so whole
            # tables would cap the scene at ~2000 blocks (1 MiB SMEM)
            pl.BlockSpec((CHUNK_BLOCKS, 8), lambda i, c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK_SUPERS, 8), lambda i, c: (c, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(**_COMPILER_PARAMS),
        interpret=_interpret(),
    )(rays_packed, tri, aabb, saabb)
    return out


_query_any.defvjp(lambda r, t, a, sa, n: (_query_any(r, t, a, sa, n), None),
                  lambda n, res, ct: (None, None, None, None))


def intersect_blocked(geom: Geometry, accel: BlockedAccel, rays: Rays,
                      sort: bool = True) -> Hit:
    """Closest-hit query (``QueryIntersection`` analogue,
    ``radeon_rays.h:267``)."""
    n = rays.n
    if sort:
        order = _coherence_order(rays, accel.bounds)
        rays_q = jax.tree.map(lambda a: jnp.take(a, order, axis=0), rays)
    else:
        rays_q = rays
    packed = _pack_rays(rays_q)
    t, slot, u, v = _query_closest(packed, accel.tri, accel.aabb,
                                   accel.saabb, accel.num_blocks)
    if sort:
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        flat = lambda a: jnp.take(a.reshape(-1)[:n], inv, axis=0)
    else:
        flat = lambda a: a.reshape(-1)[:n]
    t, slot, u, v = flat(t), flat(slot), flat(u), flat(v)
    found = slot >= 0
    prim = jnp.where(
        found, jnp.take(accel.slot_prim, jnp.maximum(slot, 0), axis=0), -1
    )
    valid = found & rays.active
    shape = jnp.where(
        valid,
        jnp.take(geom.face_shape, jnp.maximum(prim, 0), axis=0, mode="clip"),
        -1,
    )
    return Hit(
        t=jnp.where(valid, t, F32_MAX),
        prim=prim.astype(jnp.int32),
        shape=shape.astype(jnp.int32),
        u=u,
        v=v,
        valid=valid,
    )


def occluded_blocked(geom: Geometry, accel: BlockedAccel,
                     rays: Rays, sort: bool = True) -> jax.Array:
    """Any-hit query (``QueryOcclusion`` analogue, ``radeon_rays.h:270``)."""
    n = rays.n
    if sort:
        order = _coherence_order(rays, accel.bounds)
        rays_q = jax.tree.map(lambda a: jnp.take(a, order, axis=0), rays)
    else:
        rays_q = rays
    packed = _pack_rays(rays_q)
    out = _query_any(packed, accel.tri, accel.aabb, accel.saabb,
                     accel.num_blocks)
    blocked = out.reshape(-1)[:n] > 0.0
    if sort:
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        blocked = jnp.take(blocked, inv, axis=0)
    return blocked & rays.active
