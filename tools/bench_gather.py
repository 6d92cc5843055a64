#!/usr/bin/env python
"""Microbenchmark: gather strategies on TPU for the narrow-phase operand fetch.

Question: at P pair lanes gathering D-float operand rows from an (S, D)
table, what wins:
  a) D separate (P,) scalar gathers (current engine style)
  b) one (P, D) row gather
  c) tile-gather + one-hot MXU contraction: pairs sorted so each 128-lane
     block touches a narrow range of table rows; gather whole 128-row tiles
     (contiguous 32KB copies) then select rows with a batched matmul.
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


def timeit(tag, f, *args, n=50):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag:>38}: {dt:8.3f} ms")
    return r


def main():
    S = 9_984           # multiple of 128
    P = 39_424          # multiple of 128
    D = 64
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (S, D), jnp.float32)

    # spatially-coherent indices: block b of 128 lanes touches rows near b*S/NB
    NB = P // 128
    base = (np.arange(NB) * (S - 640) // NB)
    idx = (base[:, None] + np.random.randint(0, 512, (NB, 128))).reshape(-1)
    idx = jnp.asarray(np.minimum(idx, S - 1), jnp.int32)

    rand_idx = jax.random.randint(key, (P,), 0, S, jnp.int32)

    @jax.jit
    def scalar_gathers(idx):
        cols = [table[:, d][idx] for d in range(D)]
        return jnp.stack(cols, 1)

    @jax.jit
    def row_gather(idx):
        return table[idx]

    @jax.jit
    def row_gather_few(idx):
        return table[:, :8][idx]

    TILE = 128
    NT = 5   # tiles per block: covers base..base+512 + block alignment slack
    tiled = table.reshape(S // TILE, TILE, D)

    @jax.jit
    def tile_onehot(idx):
        idx2 = idx.reshape(NB, 128)
        base = jnp.min(idx2, axis=1) // TILE              # (NB,)
        tidx = base[:, None] + jnp.arange(NT)[None, :]     # (NB, NT)
        tidx = jnp.minimum(tidx, S // TILE - 1)
        # tile-granular gather: slice size (1, TILE, D) contiguous rows
        tiles = tiled[tidx]                                # (NB, NT, TILE, D)
        tiles = tiles.reshape(NB, NT * TILE, D)
        local = idx2 - (base * TILE)[:, None]              # (NB, 128)
        onehot = (local[:, :, None]
                  == jnp.arange(NT * TILE)[None, None, :]).astype(jnp.float32)
        return jnp.einsum('blt,btd->bld', onehot, tiles,
                          preferred_element_type=jnp.float32).reshape(P, D)

    r1 = timeit("a) 64 scalar gathers (coherent idx)", scalar_gathers, idx)
    r2 = timeit("b) one (P,64) row gather (coherent)", row_gather, idx)
    timeit("b') one (P,8) row gather (coherent)", row_gather_few, idx)
    r3 = timeit("c) tile gather + onehot MXU", tile_onehot, idx)
    timeit("b) row gather (random idx)", row_gather, rand_idx)
    timeit("a) scalar gathers (random idx)", scalar_gathers, rand_idx)

    print("b matches a:", bool(jnp.allclose(r1, r2)))
    print("c matches a:", bool(jnp.allclose(r1, r3)))

    # scatter counterpart: P lanes -> (S, D) accumulate
    vals = jax.random.normal(key, (P, D), jnp.float32)

    @jax.jit
    def row_scatter(idx):
        return jnp.zeros((S, D)).at[idx].add(vals)

    @jax.jit
    def tile_onehot_scatter(idx):
        idx2 = idx.reshape(NB, 128)
        base = jnp.min(idx2, axis=1) // TILE
        local = idx2 - (base * TILE)[:, None]
        onehot = (local[:, :, None]
                  == jnp.arange(NT * TILE)[None, None, :]).astype(jnp.float32)
        v2 = vals.reshape(NB, 128, D)
        part = jnp.einsum('blt,bld->btd', onehot, v2,
                          preferred_element_type=jnp.float32)
        tidx = jnp.minimum(base[:, None] + jnp.arange(NT)[None, :],
                           S // TILE - 1)
        out = jnp.zeros((S // TILE, TILE, D))
        out = out.at[tidx].add(part.reshape(NB, NT, TILE, D))
        return out.reshape(S, D)

    r4 = timeit("scatter-add (P,64) rows", row_scatter, idx)
    r5 = timeit("tile onehot scatter-add", tile_onehot_scatter, idx)
    print("scatter match:", bool(jnp.allclose(r4, r5, atol=1e-3)))


if __name__ == '__main__':
    main()
