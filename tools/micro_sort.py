"""Micro-timing of sort/gather variants on TPU (262144 rays)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 512 * 512
key = jnp.asarray(np.random.randint(0, 2**32, N, dtype=np.uint64)
                  .astype(np.uint32))
table = jnp.asarray(np.random.rand(N, 8).astype(np.float32))


def timed(fn, *a, n=5):
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


f_argsort = jax.jit(lambda k: jnp.argsort(k))
print(f"argsort u32          : {timed(f_argsort, key)*1e3:7.2f} ms")

f_single = jax.jit(lambda k: jnp.sort((k & jnp.uint32(0xFFFC0000))
                                      | jnp.arange(N, dtype=jnp.uint32))
                   & jnp.uint32(0x3FFFF))
print(f"single-key u32 sort  : {timed(f_single, key)*1e3:7.2f} ms")

f_single_i32 = jax.jit(
    lambda k: jnp.sort(((k >> 15).astype(jnp.int32) << 18)
                       | jnp.arange(N, dtype=jnp.int32)) & 0x3FFFF)
print(f"single-key i32 sort  : {timed(f_single_i32, key)*1e3:7.2f} ms")

order = f_argsort(key).astype(jnp.int32)
f_take_rows = jax.jit(lambda t, o: jnp.take(t, o, axis=0))
print(f"take (N,8) rows      : {timed(f_take_rows, table, order)*1e3:7.2f} ms")

f_take_cols = jax.jit(lambda t, o: jnp.take(t.T, o, axis=1))
print(f"take (8,N) cols      : {timed(f_take_cols, table, order)*1e3:7.2f} ms")

cols = [table[:, i] for i in range(8)]
f_take_each = jax.jit(lambda o, *cs: [jnp.take(c, o, axis=0) for c in cs])
print(f"take 8x (N,) vecs    : {timed(f_take_each, order, *cols)*1e3:7.2f} ms")

f_sort_payload = jax.jit(
    lambda k, *cs: jax.lax.sort((k,) + cs, dimension=0, num_keys=1))
print(f"lax.sort 9-operand   : {timed(f_sort_payload, key, *cols)*1e3:7.2f} ms")

f_transpose = jax.jit(lambda t: t.T + 0.0)
print(f"transpose (N,8)->(8,N): {timed(f_transpose, table)*1e3:7.2f} ms")

f_scatter = jax.jit(
    lambda o: jnp.zeros((N,), jnp.int32).at[o].set(
        jnp.arange(N, dtype=jnp.int32)))
print(f"scatter inv          : {timed(f_scatter, order)*1e3:7.2f} ms")
