"""Raw VPU throughput: f32 vs bf16 elementwise chains, plus small-K matmul,
inside one Pallas kernel (grid-looped to amortize dispatch)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, N = 256, 1024
ITERS = 2000


def chain_kernel(x_ref, o_ref):
    x = x_ref[:]
    acc = x
    for _ in range(20):
        acc = acc * x + x          # fma
        acc = jnp.minimum(acc, x)  # min
        acc = jnp.abs(acc) - x     # abs+sub
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("dtype",))
def run_chain(x, dtype):
    x = x.astype(dtype)
    return pl.pallas_call(
        chain_kernel,
        grid=(ITERS,),
        in_specs=[pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), dtype),
    )(x)


def matmul_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def run_matmul(a, b, k):
    return pl.pallas_call(
        matmul_kernel,
        grid=(ITERS,),
        in_specs=[
            pl.BlockSpec((512, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((512, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, N), jnp.float32),
    )(a, b)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((M, N)), jnp.float32)
    for dtype in (jnp.float32, jnp.bfloat16):
        sync(run_chain(x, dtype))
        t0 = time.perf_counter()
        sync(run_chain(x, dtype))
        dt = time.perf_counter() - t0
        ops = ITERS * 20 * 5 * M * N  # ~5 ops per unrolled line group
        print(f"chain {dtype.__name__}: {dt*1e3:8.2f} ms  {ops/dt/1e12:6.2f} Tops/s")
    for k in (8, 128):
        a = jnp.asarray(np.random.default_rng(1).standard_normal((512, k)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(2).standard_normal((k, N)), jnp.float32)
        sync(run_matmul(a, b, k))
        t0 = time.perf_counter()
        sync(run_matmul(a, b, k))
        dt = time.perf_counter() - t0
        fl = ITERS * 2 * 512 * k * N
        print(f"matmul K={k:4d}: {dt*1e3:8.2f} ms  {fl/dt/1e12:6.2f} TF/s "
              f"({ITERS*512*N/dt/1e9:5.1f} Gout/s)")


if __name__ == "__main__":
    main()
