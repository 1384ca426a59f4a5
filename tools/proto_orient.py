"""Compare MT orientations at TILE=128, GROUP=4:
(a) tris-on-sublanes (needs per-group transpose of (9, 512))
(b) rays-on-sublanes (transpose rays once per tile, tri rows free)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
TILE = 128
G = 4
BIG = 3.0e38


def make_kernel(orient):
    def kernel(count_ref, rays_ref, list_ref, tri_hbm, t_ref, scratch, sems):
        i = pl.program_id(0)
        row = i % 8
        cnt = count_ref[i]
        nbpad = list_ref.shape[1]
        groups = (cnt + G - 1) // G

        def get_dma(slot, k, g):
            b = list_ref[row, jnp.minimum(k * G + g, nbpad - 1)]
            start = pl.multiple_of(b * BLOCK, BLOCK)
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(start, BLOCK)],
                scratch.at[slot, :, pl.ds(g * BLOCK, BLOCK)],
                sems.at[slot, g],
            )

        def start_group(slot, k):
            for g in range(G):
                get_dma(slot, k, g).start()

        def wait_group(slot, k):
            for g in range(G):
                get_dma(slot, k, g).wait()

        rt = rays_ref[:]
        if orient == "a":
            ox, oy, oz = rt[0:1], rt[1:2], rt[2:3]
            dx, dy, dz = rt[3:4], rt[4:5], rt[5:6]
            tmn, tmx = rt[6:7], rt[7:8]
            t_init = jnp.full((1, TILE), BIG, jnp.float32)
        else:
            rtt = rt[0:8].T  # (TILE, 8) once per tile
            ox, oy, oz = rtt[:, 0:1], rtt[:, 1:2], rtt[:, 2:3]
            dx, dy, dz = rtt[:, 3:4], rtt[:, 4:5], rtt[:, 5:6]
            tmn, tmx = rtt[:, 6:7], rtt[:, 7:8]
            t_init = jnp.full((TILE, 1), BIG, jnp.float32)

        @pl.when(cnt > 0)
        def _():
            start_group(0, 0)

            def cond(state):
                k, _ = state
                return k < groups

            def body(state):
                k, best_t = state

                @pl.when(k + 1 < groups)
                def _():
                    start_group((k + 1) % 2, k + 1)

                wait_group(k % 2, k)
                if orient == "a":
                    rows = scratch[k % 2, 0:9].T  # (G*BLOCK, 9)
                    p0x, p0y, p0z = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3]
                    e1x, e1y, e1z = rows[:, 3:4], rows[:, 4:5], rows[:, 5:6]
                    e2x, e2y, e2z = rows[:, 6:7], rows[:, 7:8], rows[:, 8:9]
                else:
                    s = scratch[k % 2]  # (16, G*BLOCK), comps on sublanes
                    p0x, p0y, p0z = s[0:1], s[1:2], s[2:3]  # (1, G*BLOCK)
                    e1x, e1y, e1z = s[3:4], s[4:5], s[5:6]
                    e2x, e2y, e2z = s[6:7], s[7:8], s[8:9]
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
                axis = 0 if orient == "a" else 1
                tnew = jnp.min(tm, axis=axis, keepdims=True)
                j = jnp.argmin(tm, axis=axis).astype(jnp.int32)
                j = j[None, :] if orient == "a" else j[:, None]
                base = list_ref[row, jnp.minimum(k * G + G - 1, nbpad - 1)]
                for g in reversed(range(G - 1)):
                    base = jnp.where(j < (g + 1) * BLOCK,
                                     list_ref[row, jnp.minimum(k * G + g, nbpad - 1)], base)
                better = tnew < best_t
                best_t = jnp.where(better, tnew, best_t)
                return k + 1, best_t

            _, bt = jax.lax.while_loop(cond, body, (jnp.int32(0), t_init))
            if orient == "a":
                t_ref[:] = bt
            else:
                t_ref[:] = bt.T

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "orient"))
def run(counts, rays, lists, tri, nb, orient):
    n_tiles = rays.shape[1] // TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i, c: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, nb), lambda i, c: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, G * BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2, G)),
        ],
    )
    return pl.pallas_call(
        make_kernel(orient),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, rays.shape[1]), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(counts, rays, lists, tri)


def main():
    nt = 245760
    nb = nt // BLOCK
    n = 512 * 512
    n_tiles = n // TILE
    rng = np.random.default_rng(0)
    tri = jax.device_put(jnp.asarray(rng.standard_normal((16, nt)), jnp.float32))
    rays = np.zeros((8, n), np.float32)
    rays[0:3] = rng.standard_normal((3, n))
    d = rng.standard_normal((3, n))
    d /= np.linalg.norm(d, axis=0)
    rays[3:6] = d
    rays[6] = 1e-3
    rays[7] = BIG
    rays = jax.device_put(jnp.asarray(rays))
    lists0 = np.tile(np.arange(nb, dtype=np.int32)[None], (n_tiles, 1))
    for r in range(n_tiles):
        lists0[r] = np.roll(lists0[r], r * 7)
    lists = jax.device_put(jnp.asarray(lists0))
    for orient in ("a", "b"):
        for visits in (16, 64, 160):
            counts = jax.device_put(jnp.full((n_tiles,), visits, jnp.int32))
            out = run(counts, rays, lists, tri, nb, orient)
            float(jnp.sum(out))
            t0 = time.perf_counter()
            for _ in range(3):
                out = run(counts, rays, lists, tri, nb, orient)
            float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / 3
            print(f"orient={orient} visits/tile={visits:4d}: {dt*1e3:8.2f} ms "
                  f"({dt/(n_tiles*visits)*1e9:6.0f} ns/visit, "
                  f"{n_tiles*visits*BLOCK*TILE/dt/1e9:6.1f} Gtests/s)")


if __name__ == "__main__":
    main()
