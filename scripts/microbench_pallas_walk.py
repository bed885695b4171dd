"""Micro-benchmark: a Welford backup walk as ONE Pallas kernel vs the XLA
while_loop formulation.

The XLA walk pays ~5-10 us of kernel sequencing per gather/scatter op per
level (measured: 16-level walk = 1.28 ms at B=256 even with everything in
scalar-scatter form). Inside a Pallas kernel the stat arrays are
VMEM-resident and a per-lane dynamic index becomes an iota-mask + masked
reduction (gather) or masked select (scatter) — pure VPU work with no
per-op dispatch.

Layout: batch on the LANE axis — stats (M, B), trace (D, B). Grid over
B-blocks of 128 lanes.
"""

import functools
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
M = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
LEVELS = 16
REPS = 64
BK = 128  # lanes per grid step


def walk_kernel(idxs_ref, visit_ref, value_ref, var_ref,
                visit_out, value_out, var_out):
    visit_out[:] = visit_ref[:]
    value_out[:] = value_ref[:]
    var_out[:] = var_ref[:]
    miota = lax.broadcasted_iota(jnp.int32, (M, BK), 0)

    def body(t, acc):
        o = idxs_ref[t, :][None, :]                  # (1, BK)
        mask = miota == o                             # (M, BK)
        vi = jnp.sum(jnp.where(mask, visit_out[:], 0.0), 0, keepdims=True)
        va = jnp.sum(jnp.where(mask, value_out[:], 0.0), 0, keepdims=True)
        vr = jnp.sum(jnp.where(mask, var_out[:], 0.0), 0, keepdims=True)
        x = acc - va
        visit_out[:] = jnp.where(mask, vi + 1.0, visit_out[:])
        value_out[:] = jnp.where(mask, va + x / (vi + 1.0), value_out[:])
        var_out[:] = jnp.where(mask, vr + x * x / (vi + 1.0), var_out[:])
        return acc * 0.999

    lax.fori_loop(0, LEVELS, body, jnp.full((1, BK), 1.0, jnp.float32))


@functools.partial(jax.jit, static_argnames=())
def run_pallas(idxs_T, visit_T, value_T, var_T):
    grid = (B // BK,)
    lane_spec = lambda r: pl.BlockSpec(
        (r, BK), lambda g: (0, g), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        walk_kernel,
        grid=grid,
        in_specs=[lane_spec(LEVELS), lane_spec(M), lane_spec(M), lane_spec(M)],
        out_specs=[lane_spec(M), lane_spec(M), lane_spec(M)],
        out_shape=[jax.ShapeDtypeStruct((M, B), jnp.float32)] * 3,
    )(idxs_T, visit_T, value_T, var_T)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(json.dumps({"pattern": name, "us_per_walk": round(best * 1e6, 1)}),
          flush=True)
    return out


key = jax.random.PRNGKey(0)
idxs_T = jax.random.randint(key, (LEVELS, B), 1, M)
v0 = jnp.zeros((M, B))

print(json.dumps({"B": B, "M": M, "levels": LEVELS, "bk": BK,
                  "device": str(jax.devices()[0])}), flush=True)
out = timed("pallas_onehot", run_pallas, idxs_T, v0, v0, v0)

# correctness vs plain numpy
import numpy as np  # noqa: E402

visit = np.zeros((M, B)); value = np.zeros((M, B)); var = np.zeros((M, B))
acc = np.full(B, 1.0)
idxs_np = np.asarray(idxs_T)
for t in range(LEVELS):
    o = idxs_np[t]
    bi = np.arange(B)
    vi, va, vr = visit[o, bi], value[o, bi], var[o, bi]
    x = acc - va
    visit[o, bi] = vi + 1.0
    value[o, bi] = va + x / (vi + 1.0)
    var[o, bi] = vr + x * x / (vi + 1.0)
    acc = acc * 0.999
np.testing.assert_allclose(np.asarray(out[0]), visit, rtol=1e-6)
np.testing.assert_allclose(np.asarray(out[1]), value, rtol=1e-5, atol=1e-6)
np.testing.assert_allclose(np.asarray(out[2]), var, rtol=1e-4, atol=1e-6)
print(json.dumps({"correct": True}), flush=True)
