"""Level-0 Q autopsy for the select-path divergence (runs on the state
dumped by probe_select_sim.py): compute the root-level selection inputs two
ways in ONE jitted program on the same device —

  walk form:   _kids_stats gathers + explore_bonus (tree.select's ops)
  kernel form: the iota-mask reductions + unrolled dedup of _select_kernel
               (transcribed in plain jnp — the Pallas interpreter semantics,
               which probe_select_sim proved bit-identical to the compiled
               kernel)

— and report, per lane: kept masks, q vectors, cand argmax of each form,
and the first lanes where the chosen action differs, with float bit
patterns. Pinpoints WHICH op the two compiled forms disagree on.

Usage: python scripts/probe_q_diff.py runs/r4probe/state_m0_s1.pkl
"""
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os  # noqa: E402

os.environ.setdefault("TMT_FORCE_SELECT_KERNEL", "1")
from tetris_mcts_tpu import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_want = os.environ.get("JAX_PLATFORMS")
if _want:
    jax.config.update("jax_platforms", _want)

from jax import lax  # noqa: E402
from tetris_mcts_tpu.search import tree as T  # noqa: E402
from tetris_mcts_tpu.search.quantiles import norm_quantile  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "runs/r4probe/state_m0_s1.pkl"
    with open(path, "rb") as f:
        blob = pickle.load(f)
    trees = jax.tree.map(jnp.asarray, blob["trees"])
    tcfg = blob["tcfg"]
    assert tcfg.policy == "clt", tcfg.policy
    B = int(np.asarray(blob["trees"].root).shape[0])
    N = tcfg.max_nodes
    M = tcfg.max_obs
    print(f"device={jax.devices()[0].platform} B={B} N={N} M={M} "
          f"low={tcfg.low}")

    vkids = jax.vmap(T._kids_stats, in_axes=(0, 0))

    @jax.jit
    def walk_form(trees):
        kids, sc, obs, kept = vkids(trees, trees.root)       # (B, 7)
        visits = jnp.where(kept, jax.vmap(lambda v, o: v[o])(
            trees.visits, obs), 0.0)
        sc_idx = jax.vmap(lambda s, r: s[r])(trees.nstat[:, 0, :],
                                             trees.root)
        q_base = jax.vmap(lambda v, o: v[o])(trees.values, obs) \
            + sc - sc_idx[:, None]
        var = jnp.maximum(jax.vmap(lambda v, o: v[o])(trees.vars_, obs), 0.0)
        n_total = jnp.sum(visits, 1, keepdims=True)
        nv = jnp.maximum(visits, 1.0)
        q = q_base + norm_quantile(n_total) * jnp.sqrt(var / nv)
        low_mask = kept & (visits < tcfg.low)
        any_low = jnp.any(low_mask, 1, keepdims=True)
        cand = jnp.where(kept, q, -jnp.inf)
        choice = jnp.argmax(cand, 1)
        return kept, visits, q_base, var, q, choice, any_low

    @jax.jit
    def kernel_form(trees):
        score = trees.nstat[:, 0, :]
        obs_arr = trees.nstat[:, 1, :].astype(jnp.int32)
        niota = lax.broadcasted_iota(jnp.int32, (B, N), 1)
        miota = lax.broadcasted_iota(jnp.int32, (B, M), 1)
        a7 = lax.broadcasted_iota(jnp.int32, (B, 7), 1)
        idx = trees.root[:, None]
        sc_idx = jnp.sum(jnp.where(niota == idx, score, 0.0), 1,
                         keepdims=True)
        c = jnp.sum(jnp.where(niota == idx, trees.cbase, 0), 1,
                    keepdims=True)
        c7 = jnp.broadcast_to(c, (B, 7))
        valid = c7 != 0
        kids = jnp.where(valid, c7 + a7, 0)
        sc_l, obs_l = [], []
        for a in range(7):
            kmask = niota == c + a
            sc_l.append(jnp.sum(jnp.where(kmask, score, 0.0), 1,
                                keepdims=True))
            obs_l.append(jnp.sum(jnp.where(kmask, obs_arr, 0), 1,
                                 keepdims=True))
        sc_k = jnp.concatenate(sc_l, axis=1)
        obs = jnp.where(valid, jnp.concatenate(obs_l, axis=1), -1)
        same = obs[:, :, None] == obs[:, None, :]
        beats = (sc_k[:, :, None] > sc_k[:, None, :]) | (
            (sc_k[:, :, None] == sc_k[:, None, :])
            & (a7[:, :, None] <= a7[:, None, :]))
        kept = valid & jnp.all(~same | beats, 2)
        vi_l, va_l, vr_l = [], [], []
        for a in range(7):
            om = miota == obs[:, a:a + 1]
            vi_l.append(jnp.sum(jnp.where(om, trees.visits, 0.0), 1,
                                keepdims=True))
            va_l.append(jnp.sum(jnp.where(om, trees.values, 0.0), 1,
                                keepdims=True))
            vr_l.append(jnp.sum(jnp.where(om, trees.vars_, 0.0), 1,
                                keepdims=True))
        vi = jnp.concatenate(vi_l, axis=1)
        va = jnp.concatenate(va_l, axis=1)
        vr = jnp.concatenate(vr_l, axis=1)
        visits = jnp.where(kept, vi, 0.0)
        n_total = jnp.sum(visits, 1, keepdims=True)
        q_base = va + sc_k - sc_idx
        var = jnp.maximum(vr, 0.0)
        nv = jnp.maximum(visits, 1.0)
        q = q_base + norm_quantile(n_total) * jnp.sqrt(var / nv)
        low_mask = kept & (visits < tcfg.low)
        any_low = jnp.any(low_mask, 1, keepdims=True)
        cand = jnp.where(kept, q, -jnp.float32(jnp.inf))
        choice = jnp.argmax(cand, 1)
        return kept, visits, q_base, var, q, choice, any_low

    w = jax.device_get(walk_form(trees))
    k = jax.device_get(kernel_form(trees))
    names = ("kept", "visits", "q_base", "var", "q", "choice", "any_low")
    bad_lanes = np.nonzero(w[5] != k[5])[0]
    print(f"choice mismatch on {len(bad_lanes)}/{B} lanes: "
          f"{bad_lanes[:12].tolist()}")
    for nm, a, b in zip(names, w, k):
        neq = np.asarray(a != b)
        while neq.ndim > 1:
            neq = neq.any(-1)
        print(f"  field {nm:8s}: {int(neq.sum())}/{B} lanes differ")
    for lane in bad_lanes[:3].tolist():
        print(f"-- lane {lane}: walk choice {w[5][lane]} "
              f"kernel choice {k[5][lane]}  any_low w/k "
              f"{w[6][lane]}/{k[6][lane]}")
        for nm, i in (("kept", 0), ("visits", 1), ("q_base", 2),
                      ("var", 3), ("q", 4)):
            print(f"   {nm:7s} walk  {np.asarray(w[i][lane])}")
            print(f"   {nm:7s} kern  {np.asarray(k[i][lane])}")
        qw = np.asarray(w[4][lane], np.float32)
        qk = np.asarray(k[4][lane], np.float32)
        print("   q bits walk", [hex(x) for x in qw.view(np.uint32)])
        print("   q bits kern", [hex(x) for x in qk.view(np.uint32)])


if __name__ == "__main__":
    main()
