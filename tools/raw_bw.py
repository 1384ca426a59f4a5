"""Raw HBM bandwidth + dispatch floor measurement on the tunneled chip."""
import time

import jax
import jax.numpy as jnp

K = 32


def bench(name, nbytes_touched, fn, *args):
    @jax.jit
    def rep(*a):
        def body(i, x):
            return fn(x)
        return jax.lax.fori_loop(0, K, body, *a)

    r = rep(*args)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = rep(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / K
    print(f"{name:28s} {dt*1e3:8.3f} ms/iter  {nbytes_touched/dt/1e9:8.1f} GB/s")


def main():
    for mb in (3, 32, 256):
        n = mb * 1024 * 1024 // 4
        x = jnp.arange(n, dtype=jnp.float32)
        bench(f"x*1.0001+1 ({mb}MB)", 2 * n * 4, lambda v: v * 1.0001 + 1.0, x)

    # elementwise chain like shading code: 20 ops on (N,3)
    n = 512 * 512
    x = jnp.ones((n, 3), jnp.float32)

    def chain(v):
        for _ in range(20):
            v = v * 1.0001 + 0.001
        return v

    bench("20-op chain (262144,3)", 2 * n * 3 * 4, chain, x)

    # gather: take 262k rows from a (262k,3) table
    idx = jnp.arange(n, dtype=jnp.int32)[::-1]
    tbl = jnp.ones((n, 3), jnp.float32)
    bench("gather rows (262144,3)", 2 * n * 3 * 4,
          lambda v: jnp.take(tbl, idx, axis=0) + v, x)

    # argsort 262144 keys
    keys = jnp.arange(n, dtype=jnp.uint32)[::-1]
    bench("argsort (262144,) u32", 2 * n * 4,
          lambda v: jnp.argsort(v ^ jnp.uint32(1)).astype(jnp.uint32), keys)

    # tiny scalar body: dispatch/loop floor
    s = jnp.float32(1.0)
    bench("scalar mul (floor)", 8, lambda v: v * 1.0000001, s)


if __name__ == "__main__":
    main()
