"""On-device functional image pool.

Rebuild of the reference's ``util/image_pool.py`` (SURVEY.md §2.2): a
50-image history buffer that, with probability 0.5 per item, swaps the
current fake for a stored one before feeding the discriminator —
stabilizing D against generator oscillation.

The reference mutates a Python list on the host; here the pool is a pytree
``(buffer, count)`` carried through the jitted train step, so the query is
compiled and the fakes never leave HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PoolState(NamedTuple):
    buffer: jax.Array  # (pool_size, H, W, C)
    count: jax.Array   # () int32 — number of valid entries


def init_pool(pool_size: int, shape: Tuple[int, ...],
              dtype=jnp.float32) -> PoolState:
    if pool_size == 0:
        # pool disabled: (1,1,1,1) placeholder — zero-size arrays are not
        # checkpointable; callers gate on the static config, not the shape
        return PoolState(buffer=jnp.zeros((1, 1, 1, 1), dtype),
                         count=jnp.zeros((), jnp.int32))
    return PoolState(buffer=jnp.zeros((pool_size,) + tuple(shape), dtype),
                     count=jnp.zeros((), jnp.int32))


def query_pool(state: PoolState, fakes: jax.Array,
               rng: jax.Array) -> Tuple[jax.Array, PoolState]:
    """Per reference semantics, per batch item:
    - pool not full: insert the fake, return it unchanged;
    - pool full: with p=0.5 return a random stored image and replace it
      with the fake; else return the fake untouched.
    """
    pool_size = state.buffer.shape[0]
    if state.buffer.shape == (1, 1, 1, 1) and fakes.shape[1:] != (1, 1, 1):
        # the disabled-pool placeholder from init_pool(0) — callers gate
        # on cfg.loss.pool_size and must not reach here; scanning the
        # placeholder against real frames would trace-crash (or worse,
        # broadcast) confusingly, so fail with the real cause
        raise ValueError(
            "query_pool called with the disabled-pool placeholder "
            "(init_pool(0)); gate on cfg.loss.pool_size > 0 at the call "
            "site")

    def body(carry, inp):
        buffer, count = carry
        fake, key = inp
        k_swap, k_idx = jax.random.split(key)
        idx = jax.random.randint(k_idx, (), 0, pool_size)
        swap = jax.random.bernoulli(k_swap)
        not_full = count < pool_size

        stored = buffer[idx]
        # pool full + swap: emit stored, replace slot with fake
        out = jnp.where(jnp.logical_and(~not_full, swap), stored, fake)
        write_idx = jnp.where(not_full, count, idx)
        do_write = jnp.logical_or(not_full, swap)
        new_row = jnp.where(do_write, fake, buffer[write_idx])
        buffer = buffer.at[write_idx].set(new_row)
        count = jnp.minimum(count + not_full.astype(jnp.int32), pool_size)
        return (buffer, count), out

    keys = jax.random.split(rng, fakes.shape[0])
    (buffer, count), outs = jax.lax.scan(
        body, (state.buffer, state.count), (fakes, keys))
    return outs, PoolState(buffer=buffer, count=count)
