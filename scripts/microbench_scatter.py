"""Micro-benchmark: per-level obs-stat access patterns inside a vmapped
while_loop on the current backend — the walk-latency term that decides the
stat layout (see tree.py docstring).

Patterns, all updating [visit, value, var] of one obs per level per lane:
  split3: three (M,) arrays, 3 gathers + 3 scalar scatters   (v2 layout)
  col3xM: one (3, M) array, column gather + column scatter   (fused rows)
  flat3M: one (3M,) array, interleaved 3*o+{0,1,2}, contiguous
          dynamic-slice gather + dynamic-update-slice scatter
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
M = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
LEVELS = 16
REPS = 64

key = jax.random.PRNGKey(0)
IDXS = jax.random.randint(key, (B, LEVELS), 1, M)


def walk_split3(visit, value, var, idxs):
    def body(c):
        t, visit, value, var, acc = c
        o = idxs[t]
        vi, va, vr = visit[o], value[o], var[o]
        x = acc - va
        visit = visit.at[o].set(vi + 1.0)
        value = value.at[o].set(va + x / (vi + 1.0))
        var = var.at[o].set(vr + x * x / (vi + 1.0))
        return t - 1, visit, value, var, acc * 0.999

    _, visit, value, var, _ = lax.while_loop(
        lambda c: c[0] >= 0, body,
        (jnp.int32(LEVELS - 1), visit, value, var, jnp.float32(1.0)),
    )
    return visit, value, var


def walk_col3(ostat, idxs):
    def body(c):
        t, ostat, acc = c
        o = idxs[t]
        os = ostat[:, o]
        x = acc - os[1]
        col = jnp.stack([os[0] + 1.0, os[1] + x / (os[0] + 1.0),
                         os[2] + x * x / (os[0] + 1.0)])
        ostat = ostat.at[:, o].set(col)
        return t - 1, ostat, acc * 0.999

    _, ostat, _ = lax.while_loop(
        lambda c: c[0] >= 0, body,
        (jnp.int32(LEVELS - 1), ostat, jnp.float32(1.0)),
    )
    return (ostat,)


def walk_flat3(flat, idxs):
    def body(c):
        t, flat, acc = c
        o = idxs[t]
        os = lax.dynamic_slice(flat, (3 * o,), (3,))
        x = acc - os[1]
        col = jnp.stack([os[0] + 1.0, os[1] + x / (os[0] + 1.0),
                         os[2] + x * x / (os[0] + 1.0)])
        flat = lax.dynamic_update_slice(flat, col, (3 * o,))
        return t - 1, flat, acc * 0.999

    _, flat, _ = lax.while_loop(
        lambda c: c[0] >= 0, body,
        (jnp.int32(LEVELS - 1), flat, jnp.float32(1.0)),
    )
    return (flat,)


def timed(name, walk, *arrays):
    vwalk = jax.vmap(walk)

    def chained(arrays):
        def body(i, c):
            return vwalk(*c, IDXS)

        return lax.fori_loop(0, REPS, body, arrays)

    jitted = jax.jit(chained)
    out = jitted(arrays)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(arrays)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    us = best / REPS * 1e6
    print(json.dumps({"pattern": name, "us_per_walk": round(us, 1)}),
          flush=True)


print(json.dumps({"B": B, "M": M, "levels": LEVELS,
                  "device": str(jax.devices()[0])}), flush=True)

v0 = jnp.zeros((B, M))
timed("split3", walk_split3, v0, v0, v0)
timed("col3xM", walk_col3, jnp.zeros((B, 3, M)))
timed("flat3M", walk_flat3, jnp.zeros((B, 3 * M)))


def walk_flat3idx(flat, idxs):
    """(3M,) interleaved; ONE gather + ONE scatter with 3 scalar indices."""
    off = jnp.arange(3, dtype=jnp.int32)

    def body(c):
        t, flat, acc = c
        o = idxs[t]
        ix = 3 * o + off
        os = flat[ix]
        x = acc - os[1]
        col = jnp.stack([os[0] + 1.0, os[1] + x / (os[0] + 1.0),
                         os[2] + x * x / (os[0] + 1.0)])
        flat = flat.at[ix].set(col)
        return t - 1, flat, acc * 0.999

    _, flat, _ = lax.while_loop(
        lambda c: c[0] >= 0, body,
        (jnp.int32(LEVELS - 1), flat, jnp.float32(1.0)),
    )
    return (flat,)


def walk_col3_scalar(ostat, idxs):
    """(3, M); one column gather + 3 scalar scatters at (row, o)."""
    def body(c):
        t, ostat, acc = c
        o = idxs[t]
        os = ostat[:, o]
        x = acc - os[1]
        ostat = ostat.at[0, o].set(os[0] + 1.0)
        ostat = ostat.at[1, o].set(os[1] + x / (os[0] + 1.0))
        ostat = ostat.at[2, o].set(os[2] + x * x / (os[0] + 1.0))
        return t - 1, ostat, acc * 0.999

    _, ostat, _ = lax.while_loop(
        lambda c: c[0] >= 0, body,
        (jnp.int32(LEVELS - 1), ostat, jnp.float32(1.0)),
    )
    return (ostat,)


timed("flat3idx", walk_flat3idx, jnp.zeros((B, 3 * M)))
timed("col3_scalarscat", walk_col3_scalar, jnp.zeros((B, 3, M)))
