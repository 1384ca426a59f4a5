"""Prototype the v2 kernel patterns on-chip before committing to the design:
- list-driven visits: per-tile visit list in VMEM, scalar-read per iteration
- dynamic while_loop trip count
- manual double-buffered DMA of triangle blocks from HBM (pl.ANY)
- MT test timing per visit
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
BLOCK = int(os.environ.get('PB','128'))
TILE = int(os.environ.get('PT','1024'))
BIG = 3.0e38


def kernel(count_ref,            # scalar prefetch (n_tiles,) i32
           rays_ref,             # (8, TILE) VMEM
           list_ref,             # (1, NBpad) i32 VMEM (per-tile slice)
           tri_hbm,              # (NT, 9) ANY/HBM
           t_ref,                # (1, TILE) out
           slot_ref,             # (1, TILE) out
           scratch,              # (2, BLOCK, 9) VMEM
           sems):                # DMA sems (2,)
    i = pl.program_id(0)
    row = i % 8
    cnt = count_ref[i]
    rt = rays_ref[:]
    ox, oy, oz = rt[0:1], rt[1:2], rt[2:3]
    dx, dy, dz = rt[3:4], rt[4:5], rt[5:6]
    tmn, tmx = rt[6:7], rt[7:8]

    t_ref[:] = jnp.full((1, TILE), BIG, jnp.float32)
    slot_ref[:] = jnp.full((1, TILE), -1, jnp.int32)

    def get_dma(slot, k):
        b = list_ref[row, k]
        start = pl.multiple_of(b * BLOCK, BLOCK)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(start, BLOCK)],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(cnt > 0)
    def _():
        get_dma(0, 0).start()

        def body(state):
            k, best_t, best_slot = state

            @pl.when(k + 1 < cnt)
            def _():
                get_dma((k + 1) % 2, k + 1).start()

            get_dma(k % 2, k).wait()
            rows = scratch[k % 2, 0:9].T  # wait: dynamic? k%2 static per branch
            b = list_ref[row, k]

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
            hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t > tmn) & (t < tmx) & (t < best_t))
            tm = jnp.where(hit, t, BIG)
            tnew = jnp.min(tm, axis=0, keepdims=True)
            j = jnp.argmin(tm, axis=0)[None, :].astype(jnp.int32)
            better = tnew < best_t
            best_slot = jnp.where(better, b * BLOCK + j, best_slot)
            best_t = jnp.where(better, tnew, best_t)
            return k + 1, best_t, best_slot

        def cond(state):
            k, _, _ = state
            return k < cnt

        _, bt, bs = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_ref[:], slot_ref[:])
        )
        t_ref[:] = bt
        slot_ref[:] = bs


@functools.partial(jax.jit, static_argnames=("nb",))
def run(counts, rays, lists, tri, nb):
    n_tiles = rays.shape[1] // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i, c: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nb), lambda i, c: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda i, c: (0, i), memory_space=pltpu.VMEM),
        ] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 16, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    npad = rays.shape[1]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(counts, rays, lists, tri)


def main():
    nt = 245760
    nb = nt // BLOCK
    n = 512 * 512
    n_tiles = n // TILE
    rng = np.random.default_rng(0)
    tri = rng.standard_normal((16, nt)).astype(np.float32)
    rays = np.zeros((8, n), np.float32)
    rays[0:3] = rng.standard_normal((3, n))
    d = rng.standard_normal((3, n))
    d /= np.linalg.norm(d, axis=0)
    rays[3:6] = d
    rays[6] = 1e-3
    rays[7] = BIG

    rays_d = jax.device_put(jnp.asarray(rays))
    tri_d = jax.device_put(jnp.asarray(tri))
    lists0 = np.tile(np.arange(nb, dtype=np.int32)[None], (n_tiles, 1))
    for r in range(n_tiles):
        lists0[r] = np.roll(lists0[r], r * 7)
    lists_d = jax.device_put(jnp.asarray(lists0))
    for visits in (80, 240, 560):
        counts_v = [jax.device_put(jnp.full((n_tiles,), visits - j, jnp.int32))
                    for j in range(4)]
        out = run(counts_v[3], rays_d, lists_d, tri_d, nb)
        _ = float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        acc = None
        for j in range(3):
            o = run(counts_v[j % 4], rays_d, lists_d, tri_d, nb)
            acc = jnp.sum(o[0])
        _ = float(acc)
        dt = (time.perf_counter() - t0) / 3
        per_visit = dt / (n_tiles * visits)
        print(f"visits/tile={visits:4d}: {dt*1e3:8.2f} ms "
              f"({per_visit*1e9:7.0f} ns/visit, "
              f"{n_tiles*visits*BLOCK*TILE/dt/1e9:6.1f} Gtests/s)")


if __name__ == "__main__":
    main()
