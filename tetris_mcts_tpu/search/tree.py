"""Array-tree MCTS storage and single-tree ops (select / expand / backup).

TPU-native redesign of the reference search layer: the numba cores
(`agents/core_projection.py`), the C++ free functions
(`agents/cppmodule/core.h:111-381`) and the tree memory of
`agents/agent.py:58-130` become one pytree of fixed-shape arrays plus pure
functions, batched over environments with `vmap` and compiled into the
self-play program. No pointers, no dicts, no host round-trips.

Memory layout is chosen for TPU tiling ((8,128) lane padding) AND for the
latency of the sequential select/backup walks — every rule below is
measured on a real v5e chip (scripts/microbench_scatter.py,
scripts/profile_mcts.py):

- every pool array keeps the pool axis (N nodes / M obs / T table slots)
  MINOR, so a `(7, N)` child table and a `(20, M)` packed-obs store pad ~1x,
  where the naive `(N, 7)` / `(M, 20, 10)` layouts padded 6-18x and made XLA
  shuffle gigabytes per simulation (measured: the v1 layout capped at ~4.5k
  sims/s with full-array copies of `u32[B,N,20]` per sim);
- per-node score and obs-id are FUSED into `nstat[2, N]` float32 (obs ids
  are exact in f32, both < 2^24): the selection walk reads both per level
  and nstat is loop-INVARIANT there, so one gather replaces two. Gathers
  from closed-over arrays are cheap;
- per-obs [visit, value, variance] stay three SEPARATE arrays. They are the
  loop-CARRIED state of every backup walk, and on TPU the only fast carried
  update is the scalar scatter: 16-level walk at B=256 costs 1.28 ms with
  three scalar scatters/gathers per level, 2.4 ms as one 3-index scatter
  into an interleaved (3M,) array, 12 ms as contiguous (3,)-window
  dynamic-update-slices, and 28 ms as column scatters into a (3, M) array
  (XLA copy-inserts the whole carried buffer for windowed scatters). The
  fused-ostat layout looked like "one op instead of three" and measured
  17x SLOWER end-to-end;
- `obs_visit` is float32 (counts are exact integers in f32): it shares every
  walk's gather/scatter cadence with value/variance, and float arithmetic
  avoids an int-float convert per level. Reads through the `Tree.obs_visit`
  property present int32.

Env states are NOT stored per node. The selection walk *carries* the env
state and steps it inline while descending (`engine.step` is deterministic
given the in-state RNG and costs ~a hundred VPU ops on 20 uint32 words), so
the leaf state falls out of selection for free — trading negligible FLOPs
for the gigabytes of HBM a per-node `EnvState` store occupied, without the
separate replay walk the v2 design paid (measured: split select 1001 us/sim
+ replay 734 us/sim at B=256 vs 925 us/sim fused). Observations are stored
bit-packed (one uint32 per row, `engine.pack_obs`) and only unpacked outside
the move program.

Algorithm semantics (unchanged from the reference):
- node index 0 is the null sentinel (`agents/agent.py:72-73`);
- the transposition "projection" (`agents/agent.py:77-88`): an
  open-addressing hash table over the packed obs maps states to obs slots
  carrying shared visit/value/variance statistics;
- selection = `select_trace_obs` (C++ core.h:167-224): unique-children-by-obs
  keeping the max-score node, unvisited-first (`check_low`), then the CLT
  policy `value + norm_quantile(Σn)·sqrt(var/n)` (`agents/policy.py:8-14`);
- backup = `backup_trace_obs` (C++ core.h:226-260): reverse walk with
  incremental mean/variance and v ← γ·v + score discounting, plus the
  leaf-parallel seeding of `backup_trace_obs_LP` (`core.h:303-381`).

All functions here operate on ONE tree (no leading batch dim) — `mcts.py`
vmaps them over the env batch.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import EnvConfig, EnvState
from tetris_mcts_tpu.search.quantiles import bayes_quantile, norm_quantile

N_ACTIONS = 7
_A7 = jnp.arange(N_ACTIONS, dtype=jnp.int32)


class TreeConfig(NamedTuple):
    """Static search configuration (compiled into the program)."""

    max_nodes: int = 4096
    max_obs: int = 4096
    table_size: int = 8192  # power of two, >= 2 * max_obs
    max_depth: int = 96
    low: int = 1           # unvisited-first threshold (`check_low` n)
    gamma: float = 0.999   # backup discount (`agent.cpp:841` default)
    projection: bool = True
    policy: str = "clt"    # selection rule (agents/policy.py + Bayes-UCB,
                           # core.py:290-351, + select_index_3's UCB-V bound,
                           # core.py:223-272): clt | bayes | gauss | ucbv |
                           # max | mc | random | greedy
    select_kernel: bool = True  # use the fused Pallas selection kernel:
                           # the walk AND the inline env stepping run in ONE
                           # kernel (ops/tree_walk.py + ops/env_packed.py),
                           # returning the leaf env states directly — active
                           # on TPU programs (multi-device via a registered
                           # shard_map mesh,
                           # tree_walk.use_walk_kernels); elsewhere the
                           # hand-batched XLA walk runs. Measured 98.2k ->
                           # 119.2k sims/s when it replaced the XLA walk
                           # (which it beats 1106 -> ~590 us/sim with zero
                           # upkeep). The tie-break randomness is pre-drawn
                           # per level (i.i.d. either way), so kernel and
                           # XLA walks follow different but equal-law
                           # trajectories.
    insert_kernel: bool = True  # run the obs-table probe loop as a Pallas
                           # kernel (tree_walk.insert_obs7_batched_pallas,
                           # golden-tested). History: measured 6.3x SLOWER
                           # under the round-2/3 aliasing regime (20.2k vs
                           # 127.8k, old runs/ab1) and was off by default;
                           # with aliases disabled (the round-4 correctness
                           # fix, ops/tree_walk.py _use_aliases) the
                           # XLA probe loop's carried tables pay loop
                           # copies instead and the kernel WINS: 126.7k vs
                           # 103.4k headline, 71.8k vs 65.1k at the
                           # campaign config (runs/ab1/bench_insert.json,
                           # runs/r4probe/probes7.log), insert-toggle
                           # verified bit-exact in-composition at
                           # 2048:64 and 3584:96. Off-TPU this flag is
                           # inert (insert_fn_for gates on the kernel path).
    env: EnvConfig = EnvConfig()


class Tree(NamedTuple):
    """One search tree. Batched trees carry a leading axis on every field.
    Pool axes (N, M, T) are minor everywhere; see the module docstring for
    why nstat is fused and the obs stats are split."""

    # node arrays, pool axis minor
    cbase: jax.Array      # int32[N] id of the FIRST child; 0 = unexpanded.
                          # Children are always allocated contiguously
                          # (expand-all-7), so child[a] == cbase + a — the
                          # reference's (N, 7) child table (agents/agent.py:
                          # 60) collapses to one scalar per node, turning
                          # the per-level child-column gather of every walk
                          # into a scalar gather.
    nstat: jax.Array      # float32[2, N]: [score; obs-id (exact int)]
    end: jax.Array        # bool[N]
    n_nodes: jax.Array    # int32 next free node id (starts at 1)
    root_state: EnvState  # env state at the root node (single state)
    # obs arrays (walk-carried: separate scalars, see module docstring)
    visits: jax.Array     # float32[M] visit counts (exact ints)
    values: jax.Array     # float32[M]
    vars_: jax.Array      # float32[M]
    obs_end: jax.Array    # bool[M]
    obs_bits: jax.Array   # uint32[20, M] packed boards (engine.pack_obs)
    n_obs: jax.Array      # int32 next free obs id (starts at 1)
    # transposition hash table
    tbl_h1: jax.Array     # uint32[T]
    tbl_h2: jax.Array     # uint32[T]
    tbl_obs: jax.Array    # int32[T] obs id, 0 = empty
    root: jax.Array       # int32
    vmax: jax.Array       # float32[M] max backed-up relative return per obs
                          # (the legacy node_stats[4] max-return statistic,
                          # agents/core.py:404-422; read only by --policy
                          # max, updated by the backup walks only when that
                          # policy is configured)

    # ---- legacy-named read views -------------------------------------------
    @property
    def score(self):
        """float32[..., N] game score at each node (nstat row 0)."""
        return self.nstat[..., 0, :]

    @property
    def n_to_o(self):
        """int32[..., N] node -> obs slot (nstat row 1)."""
        return self.nstat[..., 1, :].astype(jnp.int32)

    @property
    def obs_visit(self):
        """int32[..., M] visit counts."""
        return self.visits.astype(jnp.int32)

    @property
    def obs_value(self):
        """float32[..., M] mean values."""
        return self.values

    @property
    def obs_var(self):
        """float32[..., M] variances."""
        return self.vars_

    def with_fields(self, **kw):
        """`_replace` that also accepts the legacy derived names (`score`,
        `n_to_o`, `obs_visit`, `obs_value`, `obs_var`), writing them into the
        canonical storage. Cold-path/test helper — not for loop bodies."""
        nstat = self.nstat
        for name, row in (("score", 0), ("n_to_o", 1)):
            if name in kw:
                nstat = nstat.at[..., row, :].set(
                    jnp.asarray(kw.pop(name)).astype(jnp.float32)
                )
        if "obs_visit" in kw:
            kw["visits"] = jnp.asarray(kw.pop("obs_visit")).astype(jnp.float32)
        if "obs_value" in kw:
            kw["values"] = jnp.asarray(kw.pop("obs_value")).astype(jnp.float32)
        if "obs_var" in kw:
            kw["vars_"] = jnp.asarray(kw.pop("obs_var")).astype(jnp.float32)
        return self._replace(nstat=nstat, **kw)


# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------

def _mix32(h):
    """Final avalanche (xorshift-multiply, lowbias32 constants)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0x846CA68B)
    return h ^ (h >> jnp.uint32(16))


# Two independent lanes of fixed odd multipliers (splitmix-derived) — a
# multiply-accumulate hash vectorizes over the 20 words in ONE reduction,
# where a sequential FNV chain cost 120 serial scalar ops per state
# (measured as the dominant term of the expand phase on TPU).
_HK1 = jnp.asarray(
    [0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1,
     0xD3A2646D, 0xFD7046C5, 0xB55A4F09, 0x94D049BB, 0xBF58476D,
     0x2545F491, 0x708ED7D7, 0x9E6C63D1, 0xA3B19535, 0x8DA6B343,
     0xD8163841, 0xCB9E59B1, 0x6295C58D, 0x2F6BBB77, 0x452821E7],
    jnp.uint32,
)
_HK2 = jnp.asarray(
    [0x38495AB5, 0xA4093823, 0x299F31D1, 0x082EFA99, 0xEC4E6C89,
     0x452821E7, 0x38D01377, 0xBE5466CF, 0x34E90C6D, 0xC97C50DD,
     0x3F84D5B5, 0xB5470917, 0x9216D5D9, 0x8979FB1B, 0xD1310BA7,
     0x98DFB5AD, 0x2FFD72DB, 0xD01ADFB7, 0xB8E1AFED, 0x6A267E97],
    jnp.uint32,
)


def _hash_packed(packed):
    """64-bit (two multiply-accumulate lanes + avalanche) hash of the packed
    obs words — the reference's `state.tobytes()` dict key
    (`agents/agent.py:114-117`). Accepts (..., 20); returns (h1, h2) with the
    leading shape."""
    w = packed.astype(jnp.uint32)
    h1 = _mix32(jnp.sum(w * _HK1, axis=-1, dtype=jnp.uint32))
    h2 = _mix32(jnp.sum(w * _HK2, axis=-1, dtype=jnp.uint32))
    return h1, h2


# Probe stepping: linear (+1, the default) or double hashing (step = h2|1;
# odd, hence coprime with the pow2 table, so the sequence still visits every
# slot and the load cap still guarantees termination). Double hashing breaks
# up primary clusters — what the LOCKSTEP batched insert pays for, since its
# while_loop runs until the last of B*7 lanes places. One module-level mode
# switches every implementation (scalar, batched, Pallas kernel) together;
# tables live only in process memory, so cross-run consistency is moot.
_PROBE_DOUBLE = os.environ.get("TMT_PROBE", "linear") == "double"


def _probe_step(h2):
    """Per-key slot increment (uint32, same shape as h2)."""
    if _PROBE_DOUBLE:
        return h2 | jnp.uint32(1)
    return jnp.full_like(h2, 1)


def _probe(tree: Tree, h1, h2, cfg: TreeConfig):
    """Probe slot for key (h1, h2): first matching or empty slot.
    Table load is capped at max_obs < table_size/2 so the loop terminates."""
    mask = jnp.uint32(cfg.table_size - 1)
    start = (h1 & mask).astype(jnp.int32)
    step = _probe_step(h2)

    def keep_probing(slot):
        occupied = tree.tbl_obs[slot] != 0
        match = (tree.tbl_h1[slot] == h1) & (tree.tbl_h2[slot] == h2)
        return occupied & ~match

    def advance(slot):
        return ((slot.astype(jnp.uint32) + step) & mask).astype(jnp.int32)

    return jax.lax.while_loop(keep_probing, advance, start)


# ---------------------------------------------------------------------------
# allocation
# ---------------------------------------------------------------------------

def _masked_set(arr, idx, val, ok):
    """Write arr[idx] = val when ok. Read-free: the index is redirected out
    of range when ~ok (mode="drop") instead of re-writing the old value —
    a gather-then-scatter on the same buffer forces XLA to copy the whole
    array inside loop bodies (measured as GB-scale per-sim traffic)."""
    idx_w = jnp.where(ok, idx, arr.shape[0])
    return arr.at[idx_w].set(val, mode="drop")


def _insert_obs(tree: Tree, packed, end, ok, cfg: TreeConfig):
    """Find-or-create the obs slot for a packed observation. Returns
    (tree, obs_id); obs_id 0 when not created and not found."""
    if cfg.projection:
        h1, h2 = _hash_packed(packed)
        slot = _probe(tree, h1, h2, cfg)
        found = tree.tbl_obs[slot] != 0
        has_obs = tree.n_obs < cfg.max_obs
        new_o = ok & ~found & has_obs
        o = jnp.where(found, tree.tbl_obs[slot], jnp.where(new_o, tree.n_obs, 0))
        tree = tree._replace(
            tbl_h1=_masked_set(tree.tbl_h1, slot, h1, new_o),
            tbl_h2=_masked_set(tree.tbl_h2, slot, h2, new_o),
            tbl_obs=_masked_set(tree.tbl_obs, slot, o, new_o),
            n_obs=tree.n_obs + new_o.astype(jnp.int32),
        )
    else:
        has_obs = tree.n_obs < cfg.max_obs
        new_o = ok & has_obs
        o = jnp.where(new_o, tree.n_obs, 0)
        tree = tree._replace(n_obs=tree.n_obs + new_o.astype(jnp.int32))

    o_w = jnp.where(new_o, o, tree.obs_bits.shape[1])  # drop when not new
    tree = tree._replace(
        obs_end=_masked_set(tree.obs_end, o, end, new_o),
        obs_bits=tree.obs_bits.at[:, o_w].set(packed, mode="drop"),
    )
    return tree, o


def _insert_obs7(tree: Tree, packed7, end7, ok, cfg: TreeConfig):
    """Find-or-create obs slots for 7 observations AT ONCE (the expansion
    path). All lanes probe/claim in one lockstep while_loop:

    - lanes whose key exists (in the table, or claimed by a lower lane this
      move) resolve by match;
    - at an empty slot, the lowest lane of each same-key group attempts to
      claim it by scattering its key; the scatter's surviving writer (read
      back and compared) wins, losers advance and retry;
    - duplicate-key lanes wait for their representative's claim and resolve
      by match one round later;
    - when the obs pool is full, lanes at an empty slot resolve to obs 0
      (the same degraded behavior as the sequential path).

    Typical cost: 1-2 rounds of ~20 vector ops, vs 7 sequential probes +
    inserts (~1000 serial ops) for the loop-of-`_insert_obs` formulation.
    Returns (tree, obs7 int32[7])."""
    if not cfg.projection:
        has = tree.n_obs + _A7 < cfg.max_obs
        new_o = ok & has
        o = jnp.where(new_o, tree.n_obs + _A7, 0)
        M = tree.obs_bits.shape[1]
        o_w = jnp.where(new_o, o, M)
        tree = tree._replace(
            obs_end=tree.obs_end.at[o_w].set(end7, mode="drop"),
            obs_bits=tree.obs_bits.at[:, o_w].set(packed7.T, mode="drop"),
            n_obs=tree.n_obs + jnp.sum(new_o.astype(jnp.int32)),
        )
        return tree, o

    h1, h2 = _hash_packed(packed7)  # (7,), (7,)
    mask = jnp.uint32(cfg.table_size - 1)
    M = tree.obs_bits.shape[1]

    # same-key group representative = lowest lane index with that key
    same = (h1[:, None] == h1[None, :]) & (h2[:, None] == h2[None, :])
    rep = jnp.argmax(same, axis=1) == _A7  # first lane of each group

    slot0 = (h1 & mask).astype(jnp.int32)
    pstep = _probe_step(h2)
    placed0 = jnp.broadcast_to(~ok, (N_ACTIONS,))
    obs0 = jnp.zeros(N_ACTIONS, jnp.int32)

    def cond(c):
        placed = c[4]
        return ~jnp.all(placed)

    def body(c):
        th1, th2, tobs, slot, placed, obs_id, n_obs = c
        occupied = tobs[slot] != 0
        match = (th1[slot] == h1) & (th2[slot] == h2) & occupied
        live = ~placed

        # resolve matches
        obs_id = jnp.where(live & match, tobs[slot], obs_id)
        placed = placed | (live & match)
        live = ~placed

        full = n_obs >= cfg.max_obs
        at_empty = live & ~occupied
        # pool exhausted: first-empty reached => key absent => obs 0
        placed = placed | (at_empty & full)
        live = ~placed
        at_empty = at_empty & ~full

        # claim attempt: group representatives at an empty slot. Winner =
        # whoever's write survives the duplicate-index scatter; both lanes'
        # h1 and h2 scatters see identical index vectors, so XLA picks the
        # same surviving writer for both and exactly one lane reads back its
        # full key (the &-check can produce no winner only if the two
        # scatters disagreed on the survivor, which identical index vectors
        # rule out).
        attempt = at_empty & rep
        s_w = jnp.where(attempt, slot, cfg.table_size)
        th1 = th1.at[s_w].set(h1, mode="drop")
        th2 = th2.at[s_w].set(h2, mode="drop")
        won = attempt & (th1[slot] == h1) & (th2[slot] == h2)

        rank = jnp.cumsum(won.astype(jnp.int32)) - 1
        ids = n_obs + rank
        won = won & (ids < cfg.max_obs)
        ids_w = jnp.where(won, ids, M)
        s_w2 = jnp.where(won, slot, cfg.table_size)
        tobs = tobs.at[s_w2].set(ids, mode="drop")
        obs_id = jnp.where(won, ids, obs_id)
        placed = placed | won
        n_obs = n_obs + jnp.sum(won.astype(jnp.int32))

        # advance: only lanes stuck at an occupied non-matching slot.
        # (duplicate-key lanes at an empty slot wait for their rep's claim —
        # same key => same start AND step, so they share the rep's sequence.)
        advance = ~placed & occupied & ~match
        slot = jnp.where(
            advance,
            ((slot.astype(jnp.uint32) + pstep) & mask).astype(jnp.int32),
            slot,
        )
        return th1, th2, tobs, slot, placed, obs_id, n_obs

    th1, th2, tobs, _, _, obs7, n_obs = jax.lax.while_loop(
        cond, body,
        (tree.tbl_h1, tree.tbl_h2, tree.tbl_obs, slot0, placed0, obs0,
         tree.n_obs),
    )

    fresh = ok & (obs7 >= tree.n_obs)  # ids minted this call
    first = fresh & rep
    o_w = jnp.where(first, obs7, M)
    tree = tree._replace(
        tbl_h1=th1, tbl_h2=th2, tbl_obs=tobs, n_obs=n_obs,
        obs_end=tree.obs_end.at[o_w].set(end7, mode="drop"),
        obs_bits=tree.obs_bits.at[:, o_w].set(packed7.T, mode="drop"),
    )
    return tree, obs7


def insert_obs7_batched(trees: Tree, packed7, end7, ok, cfg: TreeConfig):
    """Hand-batched `_insert_obs7` over B trees: ONE probe while_loop for
    the whole batch. vmap's while batching re-selects the three carried
    (B, T) table arrays per probe round; here dead lanes self-mask via
    index redirection and only (B, 7)/(B,) vectors are where-masked.
    Lanes are independent (each tree probes its own table row), so the
    claim-by-scatter logic is unchanged per lane — bit-exact vs vmapping
    `_insert_obs7` (golden-tested).

    trees: batched Tree. packed7 (B, 7, 20) uint32; end7 (B, 7) bool;
    ok (B,) bool. Returns (trees, obs7 (B, 7) int32)."""
    B = packed7.shape[0]
    T_ = cfg.table_size
    M = trees.obs_bits.shape[-1]
    bidx = jnp.arange(B)[:, None]

    if not cfg.projection:
        has = trees.n_obs[:, None] + _A7 < cfg.max_obs
        new_o = ok[:, None] & has
        o = jnp.where(new_o, trees.n_obs[:, None] + _A7, 0)
        o_w = jnp.where(new_o, o, M)
        return trees._replace(
            obs_end=trees.obs_end.at[bidx, o_w].set(end7, mode="drop"),
            obs_bits=trees.obs_bits.at[bidx, :, o_w].set(
                packed7, mode="drop"
            ),
            n_obs=trees.n_obs + jnp.sum(new_o.astype(jnp.int32), 1),
        ), o

    h1, h2 = _hash_packed(packed7)           # (B, 7) each
    mask = jnp.uint32(cfg.table_size - 1)

    same = (h1[:, :, None] == h1[:, None, :]) & (
        h2[:, :, None] == h2[:, None, :]
    )
    rep = jnp.argmax(same, axis=2) == _A7[None, :]

    slot0 = (h1 & mask).astype(jnp.int32)
    pstep = _probe_step(h2)
    placed0 = jnp.broadcast_to(~ok[:, None], (B, N_ACTIONS))
    obs0 = jnp.zeros((B, N_ACTIONS), jnp.int32)

    def cond(c):
        placed = c[4]
        return ~jnp.all(placed)

    def body(c):
        th1, th2, tobs, slot, placed, obs_id, n_obs = c
        at = lambda tbl: tbl[bidx, slot]     # (B, 7) row-wise gather
        occupied = at(tobs) != 0
        match = (at(th1) == h1) & (at(th2) == h2) & occupied
        live = ~placed

        obs_id = jnp.where(live & match, at(tobs), obs_id)
        placed = placed | (live & match)
        live = ~placed

        full = (n_obs >= cfg.max_obs)[:, None]
        at_empty = live & ~occupied
        placed = placed | (at_empty & full)
        live = ~placed
        at_empty = at_empty & ~full

        attempt = at_empty & rep
        s_w = jnp.where(attempt, slot, T_)
        th1 = th1.at[bidx, s_w].set(h1, mode="drop")
        th2 = th2.at[bidx, s_w].set(h2, mode="drop")
        won = attempt & (at(th1) == h1) & (at(th2) == h2)

        rank = jnp.cumsum(won.astype(jnp.int32), axis=1) - 1
        ids = n_obs[:, None] + rank
        won = won & (ids < cfg.max_obs)
        s_w2 = jnp.where(won, slot, T_)
        tobs = tobs.at[bidx, s_w2].set(ids, mode="drop")
        obs_id = jnp.where(won, ids, obs_id)
        placed = placed | won
        n_obs = n_obs + jnp.sum(won.astype(jnp.int32), axis=1)

        advance = ~placed & occupied & ~match
        slot = jnp.where(
            advance,
            ((slot.astype(jnp.uint32) + pstep) & mask).astype(jnp.int32),
            slot,
        )
        return th1, th2, tobs, slot, placed, obs_id, n_obs

    th1, th2, tobs, _, _, obs7, n_obs = jax.lax.while_loop(
        cond, body,
        (trees.tbl_h1, trees.tbl_h2, trees.tbl_obs, slot0, placed0, obs0,
         trees.n_obs),
    )

    fresh = ok[:, None] & (obs7 >= trees.n_obs[:, None])
    first = fresh & rep
    o_w = jnp.where(first, obs7, M)
    trees = trees._replace(
        tbl_h1=th1, tbl_h2=th2, tbl_obs=tobs, n_obs=n_obs,
        obs_end=trees.obs_end.at[bidx, o_w].set(end7, mode="drop"),
        obs_bits=trees.obs_bits.at[bidx, :, o_w].set(packed7, mode="drop"),
    )
    return trees, obs7


def expand_children(tree: Tree, leaf_state: EnvState, cfg: TreeConfig):
    """Per-tree expansion front half: step the 7 children and pack their
    observations. Loop-free — vmapped by the driver."""
    child_states = jax.vmap(
        lambda a: engine.step(leaf_state, a, cfg.env)
    )(_A7)
    packed7 = jax.vmap(engine.pack_obs)(child_states)  # (7, 20)
    return child_states, packed7


def expand_commit(tree: Tree, score7, end7, obs7, leaf, ok,
                  cfg: TreeConfig):
    """Per-tree expansion back half: write the 7 contiguous node rows from
    the children's (score, end, obs) — produced either by `expand_children`
    or by the fused selection kernel. Loop-free — vmapped by the driver;
    the obs-table insert between the halves runs hand-batched
    (`insert_obs7_batched`)."""
    base = jnp.where(ok, tree.n_nodes, 0)
    ids = base + _A7
    block = jnp.stack(
        [score7.astype(jnp.float32), obs7.astype(jnp.float32)]
    )
    ids_w = jnp.where(ok, ids, tree.nstat.shape[1])
    tree = tree._replace(
        nstat=tree.nstat.at[:, ids_w].set(block, mode="drop"),
        end=_dus_rows(tree.end, base, end7, ok),
        n_nodes=tree.n_nodes + jnp.where(ok, N_ACTIONS, 0),
    )
    tree = tree._replace(cbase=_masked_set(tree.cbase, leaf, base, ok))
    return tree


def alloc_node(tree: Tree, st: EnvState, ok, cfg: TreeConfig):
    """Allocate a node for state `st` (when `ok`); project it onto an obs slot
    (dedup via the hash table when cfg.projection). Returns (tree, node_id);
    node_id is 0 when not allocated (pool full or ~ok)."""
    has_node = tree.n_nodes < cfg.max_nodes
    ok = ok & has_node
    idx = jnp.where(ok, tree.n_nodes, 0)

    packed = engine.pack_obs(st)
    tree, o = _insert_obs(tree, packed, st.end, ok, cfg)

    col = jnp.stack(
        [st.score.astype(jnp.float32), o.astype(jnp.float32)]
    )  # (2,)
    idx_w = jnp.where(ok, idx, tree.nstat.shape[1])
    tree = tree._replace(
        nstat=tree.nstat.at[:, idx_w].set(col, mode="drop"),
        end=_masked_set(tree.end, idx, st.end, ok),
        n_nodes=tree.n_nodes + ok.astype(jnp.int32),
    )
    return tree, idx


def init_tree(env_state: EnvState, cfg: TreeConfig) -> Tree:
    """Fresh empty tree rooted at `env_state`."""
    N, M, T = cfg.max_nodes, cfg.max_obs, cfg.table_size
    tree = Tree(
        cbase=jnp.zeros(N, jnp.int32),
        nstat=jnp.zeros((2, N), jnp.float32),
        end=jnp.zeros(N, bool),
        n_nodes=jnp.int32(1),
        root_state=env_state,
        visits=jnp.zeros(M, jnp.float32),
        values=jnp.zeros(M, jnp.float32),
        vars_=jnp.zeros(M, jnp.float32),
        obs_end=jnp.zeros(M, bool),
        obs_bits=jnp.zeros((20, M), jnp.uint32),
        n_obs=jnp.int32(1),
        tbl_h1=jnp.zeros(T, jnp.uint32),
        tbl_h2=jnp.zeros(T, jnp.uint32),
        tbl_obs=jnp.zeros(T, jnp.int32),
        root=jnp.int32(0),
        vmax=jnp.zeros(M, jnp.float32),
    )
    tree, root = alloc_node(tree, env_state, jnp.asarray(True), cfg)
    return tree._replace(root=root)


def new_episode_root(tree: Tree, env_state: EnvState, ok, cfg: TreeConfig):
    """Re-root into the SAME pool at a new game's start state (when `ok`),
    without resetting storage — the reference's `update_root` at episode
    boundaries (agent.py:296-301): a finished game's subtree simply stays in
    the pool until the next exhaustion GC retires it (with its accumulated
    stats, as training data), and obs statistics persist across episodes —
    shared transpositions like the empty opening board accumulate visits
    over the whole pool generation instead of restarting every episode.
    When the pool is full the allocation fails and root becomes 0, which
    the move loop's `root == 0` trigger turns into a harvest+reset on the
    next move (the GC path)."""
    tree2, idx = alloc_node(tree, env_state, ok, cfg)
    root_state = jax.tree.map(
        lambda a, b: jnp.where(ok, a, b), env_state, tree2.root_state
    )
    return tree2._replace(
        root=jnp.where(ok, idx, tree2.root), root_state=root_state
    )


def reset_tree(tree: Tree, env_state: EnvState, cfg: TreeConfig) -> Tree:
    """Zero all storage and re-root at `env_state` — the capability equivalent
    of the reference's pool-exhaustion GC (`agents/agent.py:246-257`): the
    batched design harvests training data first (`harvest`) and rebuilds from
    the current position. Same training tuples, array-friendly (SURVEY.md §7
    "Node-pool GC")."""
    return init_tree(env_state, cfg)


# ---------------------------------------------------------------------------
# unique children by obs
# ---------------------------------------------------------------------------

def children_of(tree: Tree, idx):
    """int32[7] child node ids of `idx` (cbase + action; 0s if unexpanded)."""
    c = tree.cbase[idx]
    return jnp.where(c != 0, c + _A7, 0)


def _kids_stats(tree: Tree, idx):
    """Per-level gathers for selection walks: the unique-by-obs child set of
    `idx` (`get_unique_child_obs`, C++ core.h:111-144) with their scores —
    the child column plus ONE fused nstat gather (score + obs id together;
    measured faster than two scalar 7-index gathers from hoisted rows, the
    OPPOSITE of the scalar-index backup walk — see `backup`).

    Returns (kids int32[7], sc f32[7], obs int32[7] (-1 = invalid),
    kept bool[7])."""
    c = tree.cbase[idx]
    valid = jnp.broadcast_to(c != 0, (N_ACTIONS,))
    kids = jnp.where(valid, c + _A7, 0)
    ns = tree.nstat[:, kids]       # (2, 7)
    sc = ns[0]
    obs = jnp.where(valid, ns[1].astype(jnp.int32), -1)
    same = (obs[:, None] == obs[None, :]) & valid[:, None] & valid[None, :]
    beats = (sc[:, None] > sc[None, :]) | (
        (sc[:, None] == sc[None, :]) & (_A7[:, None] <= _A7[None, :])
    )
    kept = valid & jnp.all(~same | beats, axis=1)
    return kids, sc, obs, kept


def unique_children(tree: Tree, idx):
    """`get_unique_child_obs` (C++ core.h:111-144): among the 7 children of
    `idx`, keep one node per distinct obs — the earliest node with the
    group-max score. Returns (kids int32[7], obs int32[7], kept bool[7])."""
    kids, _, obs, kept = _kids_stats(tree, idx)
    return kids, obs, kept


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------

def explore_bonus(policy: str, visits, var, n_total, q_base, kept, rnd,
                  vmax_kids=None):
    """Exploration term of the configured selection rule (agents/policy.py:
    8-55 + Bayes-UCB core.py:290-351 + select_index_3 core.py:223-272) —
    ONE definition shared by `select` (shapes (7,)) and `select_batched`
    (shapes (B, 7)); the Pallas kernel keeps its Mosaic-legal twin
    (golden-tested against these walks). `rnd` is the caller-drawn
    per-child randomness for the mc/random rules (None otherwise) —
    callers keep their original key-split order, so trajectories are
    bit-identical to the pre-refactor per-caller copies.

    Rule notes:
    - bayes (Kaufmann'12): Student-t quantile bound on the posterior mean;
      the reference uses the unbiased variance M2/(n-1) and vars_ holds
      M2/n, so sqrt(var·n/(n-1) / n) = sqrt(var/(n-1)). Pair with low >=
      the reference's min_n (the CLI defaults --low to 10 here);
      bayes_quantile clips the approximation's small-nu pole.
    - ucbv: select_index_3's sqrt(var · log N_total), no quantile scaling.
    - max: UCB1 scaled by the children's max-return statistic (`policy_max`,
      agents/policy.py:28-33 scaling by node_stats[4]) when the caller
      passes `vmax_kids` (the walks do — Tree.vmax); falls back to
      best-child-Q scaling when the statistic is unavailable.
    """
    nv = jnp.maximum(visits, 1.0)
    if policy == "clt":
        return norm_quantile(n_total) * jnp.sqrt(var / nv)
    if policy == "bayes":
        return bayes_quantile(nv - 1.0, n_total) * jnp.sqrt(
            var / jnp.maximum(nv - 1.0, 1.0)
        )
    if policy == "gauss":
        return norm_quantile(n_total) * jnp.sqrt(var)
    if policy == "ucbv":
        return jnp.sqrt(var * jnp.log(jnp.maximum(n_total, 2.0)))
    if policy == "max":
        scale_src = q_base if vmax_kids is None else vmax_kids
        q_max = jnp.max(jnp.where(kept, scale_src, -jnp.inf), axis=-1,
                        keepdims=True)
        return q_max * jnp.sqrt(jnp.log(jnp.maximum(n_total, 2.0)) / nv)
    if policy == "mc":
        # Thompson-style: one gaussian draw per child
        return rnd * jnp.sqrt(var)
    if policy == "random":
        return rnd * 1e9 - q_base
    if policy == "greedy":
        return jnp.zeros_like(q_base)
    raise ValueError(f"unknown selection policy {policy!r}")


def select(tree: Tree, key, cfg: TreeConfig):
    """`select_trace_obs` (C++ core.h:167-224). Returns (trace int32[D],
    actions int32[D], length int32, leaf_state EnvState). trace[length-1] is
    the leaf; actions[t] is the move from trace[t] to trace[t+1].

    The walk CARRIES the env state and steps it inline on each descend, so
    the leaf env state (the reference's per-node `game_arr` entry,
    `agents/agent.py:101-104`) is produced by the same loop — no separate
    replay walk, no per-node state storage. Stepping is skipped on the final
    level when the depth cap is hit, matching replay-from-root semantics
    exactly (length-1 steps)."""
    D = cfg.max_depth
    assert cfg.max_nodes < (1 << 20), "trace packing needs node ids < 2^20"
    ta0 = jnp.zeros(D, jnp.int32)  # packed per level: idx | action << 20

    def cond(carry):
        _, _, _, depth, done, _, _ = carry
        return (~done) & (depth < D)

    def body(carry):
        ta, idx, sc_idx, depth, done, st, key = carry

        kids, sc, obs, kept = _kids_stats(tree, idx)
        any_kid = jnp.any(kept)

        visits = jnp.where(kept, tree.visits[obs], 0.0)
        low_mask = kept & (visits < cfg.low)
        any_low = jnp.any(low_mask)

        n_total = jnp.sum(visits)
        # base Q = shared obs value + score delta (select_trace_obs semantics)
        q_base = tree.values[obs] + sc - sc_idx
        # clamp: float Welford updates can leave tiny negative variances
        var = jnp.maximum(tree.vars_[obs], 0.0)
        if cfg.policy == "mc":
            key, sub_mc = jax.random.split(key)
            rnd = jax.random.normal(sub_mc, (N_ACTIONS,))
        elif cfg.policy == "random":
            key, sub_r = jax.random.split(key)
            rnd = jax.random.gumbel(sub_r, (N_ACTIONS,))
        else:
            rnd = None
        vmx = tree.vmax[obs] if cfg.policy == "max" else None
        q = q_base + explore_bonus(
            cfg.policy, visits, var, n_total, q_base, kept, rnd, vmx
        )

        # one argmax: unvisited-first (gumbel tie-break) overrides the policy
        key, sub = jax.random.split(key)
        gumbel = jax.random.gumbel(sub, (N_ACTIONS,))
        cand = jnp.where(
            any_low,
            jnp.where(low_mask, gumbel, -jnp.inf),
            jnp.where(kept, q, -jnp.inf),
        )
        choice = jnp.argmax(cand).astype(jnp.int32)

        act = jnp.where(any_kid, choice, 0)
        # ONE scatter records (node, action) for this level — walk levels
        # are op-latency-bound, so trace and action share a packed word
        ta = ta.at[depth].set(idx | (act << 20))
        nxt = jnp.where(any_kid, kids[choice], idx)
        sc_idx = jnp.where(any_kid, sc[choice], sc_idx)

        # inline leaf replay: step only while descending, and never on the
        # last level of a depth-capped walk (replay does length-1 steps)
        st2 = engine.step(st, act, cfg.env)
        do_step = any_kid & (depth < D - 1)
        st = jax.tree.map(lambda a, b: jnp.where(do_step, a, b), st2, st)
        return ta, nxt, sc_idx, depth + 1, ~any_kid, st, key

    ta, _, _, depth, _, leaf_state, _ = jax.lax.while_loop(
        cond, body,
        (ta0, tree.root, tree.nstat[0, tree.root], jnp.int32(0),
         jnp.asarray(False), tree.root_state, key),
    )
    return ta & ((1 << 20) - 1), ta >> 20, depth, leaf_state


def select_batched(trees: Tree, keys, cfg: TreeConfig):
    """Hand-batched `select` over B trees in ONE while_loop (no vmap) — the
    same treatment as `backup_batched`/`insert_obs7_batched`: vmap's while
    batching re-selects every carried array (the packed trace and all ~16
    EnvState fields) per level; here finished lanes self-mask via index
    redirection and per-field guards. The per-level RNG is the vmapped
    primitives themselves (one vectorized threefry per level), so the draw
    stream and trajectories are BIT-IDENTICAL to vmapping `select`
    (golden-tested).

    trees: batched Tree; keys (B, 2) uint32 per-lane PRNG keys.
    Returns (traces (B, D) i32, actions (B, D) i32, lengths (B,) i32,
    leafs (B,) i32, childless (B,) bool, leaf_states batched EnvState).
    `childless` is the walk's exit flag: a lane finishes iff its leaf has
    cbase == 0 (kept is never empty for an expanded node), so the driver's
    post-walk cbase gather is free."""
    B = trees.root.shape[0]
    D = cfg.max_depth
    assert cfg.max_nodes < (1 << 20), "trace packing needs node ids < 2^20"
    bidx = jnp.arange(B)
    ta0 = jnp.zeros((B, D), jnp.int32)
    vsplit = jax.vmap(jax.random.split)
    vgumbel = jax.vmap(lambda k: jax.random.gumbel(k, (N_ACTIONS,)))
    vnormal = jax.vmap(lambda k: jax.random.normal(k, (N_ACTIONS,)))

    def cond(carry):
        _, _, _, depth, done, _, _, _, _ = carry
        return (depth < D) & ~jnp.all(done)

    def body(carry):
        ta, idx, sc_idx, depth, done, st, keys, lengths, leafs = carry
        live = ~done
        leafs = jnp.where(live, idx, leafs)

        c = trees.cbase[bidx, idx]                       # (B,)
        valid = (c != 0)[:, None]
        kids = jnp.where(valid, c[:, None] + _A7[None, :], 0)   # (B, 7)
        ns = jnp.take_along_axis(
            trees.nstat, kids[:, None, :].astype(jnp.int32), axis=2
        )                                                # (B, 2, 7)
        sc = ns[:, 0, :]
        obs = jnp.where(valid, ns[:, 1, :].astype(jnp.int32), -1)
        same = obs[:, :, None] == obs[:, None, :]
        beats = (sc[:, :, None] > sc[:, None, :]) | (
            (sc[:, :, None] == sc[:, None, :])
            & (_A7[None, :, None] <= _A7[None, None, :])
        )
        kept = valid & jnp.all(~same | beats, axis=2)
        any_kid = jnp.any(kept, axis=1) & live           # (B,)

        visits = jnp.where(kept, jnp.take_along_axis(trees.visits, obs, 1), 0.0)
        low_mask = kept & (visits < cfg.low)
        any_low = jnp.any(low_mask, axis=1, keepdims=True)

        n_total = jnp.sum(visits, axis=1, keepdims=True)
        q_base = (
            jnp.take_along_axis(trees.values, obs, 1) + sc - sc_idx[:, None]
        )
        var = jnp.maximum(jnp.take_along_axis(trees.vars_, obs, 1), 0.0)
        if cfg.policy == "mc":
            ks = vsplit(keys)
            keys, sub_mc = ks[:, 0], ks[:, 1]
            rnd = vnormal(sub_mc)
        elif cfg.policy == "random":
            ks = vsplit(keys)
            keys, sub_r = ks[:, 0], ks[:, 1]
            rnd = vgumbel(sub_r)
        else:
            rnd = None
        vmx = (jnp.take_along_axis(trees.vmax, jnp.maximum(obs, 0), 1)
               if cfg.policy == "max" else None)
        q = q_base + explore_bonus(
            cfg.policy, visits, var, n_total, q_base, kept, rnd, vmx
        )

        ks = vsplit(keys)
        keys, sub = ks[:, 0], ks[:, 1]
        gumbel = vgumbel(sub)
        cand = jnp.where(
            any_low,
            jnp.where(low_mask, gumbel, -jnp.inf),
            jnp.where(kept, q, -jnp.inf),
        )
        choice = jnp.argmax(cand, axis=1).astype(jnp.int32)

        act = jnp.where(any_kid, choice, 0)
        col = jnp.where(live, depth, D)
        ta = ta.at[bidx, col].set(idx | (act << 20), mode="drop")
        kc = jnp.take_along_axis(kids, choice[:, None], 1)[:, 0]
        sc_c = jnp.take_along_axis(sc, choice[:, None], 1)[:, 0]
        idx = jnp.where(any_kid, kc, idx)
        sc_idx = jnp.where(any_kid, sc_c, sc_idx)

        st2 = engine.step_batch(st, act, cfg.env)
        do_step = any_kid & (depth < D - 1)
        st = jax.tree.map(
            lambda a, b: jnp.where(
                do_step.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            st2, st,
        )
        newly_done = live & ~any_kid
        lengths = jnp.where(newly_done, depth + 1, lengths)
        return (ta, idx, sc_idx, depth + 1, done | newly_done, st, keys,
                lengths, leafs)

    root_sc = trees.nstat[bidx, 0, trees.root]
    ta, _, _, _, done, leaf_states, _, lengths, leafs = jax.lax.while_loop(
        cond, body,
        (ta0, trees.root, root_sc, jnp.int32(0), jnp.zeros(B, bool),
         trees.root_state, keys, jnp.full(B, D, jnp.int32), trees.root),
    )
    return (ta & ((1 << 20) - 1), ta >> 20, lengths, leafs, done,
            leaf_states)


def replay_leaf(tree: Tree, actions, length, cfg: TreeConfig) -> EnvState:
    """Recompute a leaf env state by replaying an action path from the root
    state (`engine.step` is deterministic — RNG lives in the state). The lp
    selection walk produces the leaf state inline (`select`); this stand-alone
    replay serves the vp/distributional selects and tests."""

    def cond(c):
        st, t = c
        return t < length - 1

    def body(c):
        st, t = c
        return engine.step(st, actions[t], cfg.env), t + 1

    st, _ = jax.lax.while_loop(cond, body, (tree.root_state, jnp.int32(0)))
    return st


def replay_leaf_batched(trees: Tree, actions, lengths,
                        cfg: TreeConfig) -> EnvState:
    """Hand-batched `replay_leaf` over B trees in ONE while_loop (CLAUDE.md
    rule 5): iteration t steps every lane still inside its own path
    (t < length-1), finished lanes self-mask via a per-field select on the
    small EnvState. Bit-exact vs vmapping `replay_leaf` (engine.step is
    deterministic; golden-tested)."""
    B = lengths.shape[0]
    bidx = jnp.arange(B)

    def cond(c):
        _, t = c
        return t < jnp.max(lengths) - 1

    def body(c):
        st, t = c
        st2 = engine.step_batch(st, actions[bidx, t], cfg.env)
        do = t < lengths - 1
        st = jax.tree.map(
            lambda a, b: jnp.where(
                do.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            st2, st,
        )
        return st, t + 1

    st, _ = jax.lax.while_loop(cond, body, (trees.root_state, jnp.int32(0)))
    return st


# ---------------------------------------------------------------------------
# expansion
# ---------------------------------------------------------------------------

def _dus_rows(arr, base, new_vals, ok):
    """Write `new_vals` ((7,)-shaped) at arr[base:base+7] when ok. One
    read-free scatter (indices redirected out of range when ~ok) — see
    `_masked_set` for why no old values are read back."""
    ids = jnp.where(ok, base + _A7, arr.shape[0])
    return arr.at[ids].set(new_vals.astype(arr.dtype), mode="drop")


def expand(tree: Tree, leaf_state: EnvState, leaf, ok, cfg: TreeConfig):
    """Create the 7 children of `leaf` (when `ok`) from its env state — the
    reference's `TreeAgent.expand` (`agents/agent.py:136-145`) without the
    Python/pyTetris boundary. Child nodes are allocated CONTIGUOUSLY (ids
    n_nodes..n_nodes+6) so node-array writes are single scatters; only the
    per-obs hash insert is sequential.

    Returns (tree, child_states) where child_states is the stepped EnvState
    with leading axis 7 (consumed directly by the NN evaluator — child
    observations never round-trip through the node store).

    Composes the two halves the batched driver uses directly
    (`expand_children` + `expand_commit`, with the obs insert between) so
    the node-row-commit layout lives in exactly one place."""
    child_states, packed7 = expand_children(tree, leaf_state, cfg)
    ok = ok & (tree.n_nodes + N_ACTIONS <= cfg.max_nodes)
    tree, obs7 = _insert_obs7(tree, packed7, child_states.end, ok, cfg)
    tree = expand_commit(
        tree, child_states.score, child_states.end, obs7, leaf, ok, cfg
    )
    return tree, child_states


def headroom(tree: Tree, cfg: TreeConfig):
    """True while one more expansion surely fits in node and obs pools."""
    return (tree.n_nodes + N_ACTIONS <= cfg.max_nodes) & (
        tree.n_obs + N_ACTIONS <= cfg.max_obs
    )


# ---------------------------------------------------------------------------
# backup
# ---------------------------------------------------------------------------

def backup(tree: Tree, trace, length, value, variance,
           cfg: TreeConfig):
    """`backup_trace_obs` (C++ core.h:226-260): reverse walk with Welford-style
    incremental mean/variance and v ← γ·v + score(idx). Sequential walk —
    measured FASTER on TPU than `backup_vectorized` below (traces are much
    shorter than max_depth, and the data-dependent while_loop pays only
    `length` iterations where the vectorized form pays D² matrices). The
    carried stats stay three separate arrays with scalar scatters — the only
    fast carried-update pattern on TPU (module docstring); the nstat rows are
    hoisted out of the loop (a per-level (2,)-window gather measured +45%
    on the whole walk vs two scalar gathers from loop-invariant rows)."""
    gamma = jnp.float32(cfg.gamma)
    score_row = tree.nstat[0]
    obs_row = tree.nstat[1].astype(jnp.int32)
    track_vmax = cfg.policy == "max"  # legacy node_stats[4] max-return
                                      # update (backup_trace_welford,
                                      # agents/core.py:404-422)

    def cond(carry):
        t, *_ = carry
        return t >= 0

    def body(carry):
        t, visit, val, var, vmx, v = carry
        idx = trace[t]
        s = score_row[idx]
        o = obs_row[idx]

        v_rel = v - s
        n = visit[o]
        first = n == 0.0
        delta = v_rel - val[o]
        val_new = jnp.where(first, v_rel, val[o] + delta / (n + 1.0))
        delta2 = v_rel - val_new
        var_new = jnp.where(
            first, variance, var[o] + (delta * delta2 - var[o]) / (n + 1.0)
        )

        visit = visit.at[o].set(n + 1.0)
        val = val.at[o].set(val_new)
        var = var.at[o].set(var_new)
        if track_vmax:
            vmx = vmx.at[o].set(jnp.maximum(vmx[o], v_rel))
        v = gamma * v_rel + s
        return t - 1, visit, val, var, vmx, v

    _, visit, val, var, vmx, _ = jax.lax.while_loop(
        cond, body,
        (length - 1, tree.visits, tree.values, tree.vars_, tree.vmax,
         jnp.float32(value)),
    )
    out = tree._replace(visits=visit, values=val, vars_=var)
    return out._replace(vmax=vmx) if track_vmax else out


def backup_vectorized(tree: Tree, trace, length, value, variance,
                      cfg: TreeConfig):
    """Vectorized `backup_trace_obs` — mathematically EXACT, no per-level
    loop. Two observations make the reference's sequential walk data-parallel:

    1. The discounted return obeys the affine recurrence
       u_t = γ·u_{t+1} + s_{t+1} − s_t with u_{L-1} = value − s_{L-1}
       (u_t is the score-relative sample backed up at level t), which unrolls
       to one lower-triangular γ-power matrix product over the trace.
    2. Welford updates of one obs by k samples merge exactly via Chan's
       parallel-variance formula; the reference's first-visit rule
       (value := x, variance := `variance` argument, core_projection.py:
       137-139) is equivalent to seeding the merge with M2₀ = variance·1
       at n₀ = 0, because the first incremental step contributes
       delta·delta2 = 0 and is overwritten by the argument.

    Float rounding differs from the sequential order at ~1e-6 relative;
    tests cross-check against `backup` and the NumPy oracle. NOT the default:
    on TPU the D x D γ-power and grouping matrices cost more than the short
    sequential walk (measured 63.6k -> 53.5k sims/s when made default); kept
    as the exact data-parallel formulation for wide-trace configurations."""
    D = cfg.max_depth
    gamma = jnp.float32(cfg.gamma)
    t = jnp.arange(D)
    live = t < length
    idx = jnp.where(live, trace, 0)
    ns = tree.nstat[:, idx]                           # (2, D)
    s = ns[0]
    o = jnp.where(live, ns[1].astype(jnp.int32), -1)

    # ---- per-level samples x_t = u_t --------------------------------------
    leaf_t = length - 1
    u_leaf = jnp.float32(value) - s[jnp.maximum(leaf_t, 0)]
    # γ^(L-1-t) term
    pow_leaf = gamma ** (leaf_t - t).astype(jnp.float32)
    # Σ_{j=t+1}^{L-1} γ^(j-t-1) (s_j − s_{j-1}): lower-triangular matmul
    j = t
    G = jnp.where(
        (j[None, :] > t[:, None]) & (j[None, :] <= leaf_t),
        gamma ** (j[None, :] - t[:, None] - 1).astype(jnp.float32),
        0.0,
    )                                                  # (D, D)
    d = s - jnp.concatenate([s[:1], s[:-1]])           # d_j = s_j - s_{j-1}
    x = pow_leaf * u_leaf + G @ d                      # (D,)

    # ---- group same-obs levels, merge with Chan's formula ------------------
    same = (o[:, None] == o[None, :]) & live[:, None] & live[None, :]
    k = jnp.sum(same, axis=1).astype(jnp.float32)      # group size per lane
    first_member = jnp.argmax(same, axis=1)
    rep = live & (first_member == t)                   # group representative

    sum_x = same @ x
    sum_x2 = same @ (x * x)
    kk = jnp.maximum(k, 1.0)
    mean_b = sum_x / kk
    m2_b = jnp.maximum(sum_x2 - sum_x * sum_x / kk, 0.0)

    n_a = tree.visits[o]
    fresh = n_a == 0.0
    mean_a = jnp.where(fresh, mean_b, tree.values[o])
    m2_a = jnp.where(fresh, jnp.float32(variance), tree.vars_[o] * n_a)

    n_new = n_a + k
    nn = jnp.maximum(n_new, 1.0)
    mean_new = (n_a * mean_a + sum_x) / nn
    delta_ab = mean_b - mean_a
    m2_new = m2_a + m2_b + delta_ab * delta_ab * n_a * k / nn
    var_new = m2_new / nn

    M = tree.visits.shape[0]
    o_w = jnp.where(rep, o, M)
    return tree._replace(
        visits=tree.visits.at[o_w].set(n_new, mode="drop"),
        values=tree.values.at[o_w].set(mean_new, mode="drop"),
        vars_=tree.vars_.at[o_w].set(var_new, mode="drop"),
    )


def backup_exp_moving(tree: Tree, trace, length, value, variance,
                      cfg: TreeConfig, alpha: float = 0.1):
    """`backup_trace_obs_exp_moving` (core_projection.py:150-162): EMA value
    with EMA-consistent variance — value += α·δ,
    var = (1-α)(var + α·δ²); first visit seeds (value, variance)."""
    gamma = jnp.float32(cfg.gamma)
    a = jnp.float32(alpha)
    score_row = tree.nstat[0]
    obs_row = tree.nstat[1].astype(jnp.int32)

    def cond(carry):
        t, *_ = carry
        return t >= 0

    def body(carry):
        t, visit, val, var, v = carry
        idx = trace[t]
        s = score_row[idx]
        o = obs_row[idx]
        v_rel = v - s
        n = visit[o]
        first = n == 0.0
        d = v_rel - val[o]
        val_new = jnp.where(first, v_rel, val[o] + a * d)
        var_new = jnp.where(
            first, variance, (1.0 - a) * (var[o] + a * d * d)
        )
        visit = visit.at[o].set(n + 1.0)
        val = val.at[o].set(val_new)
        var = var.at[o].set(var_new)
        v = gamma * v_rel + s
        return t - 1, visit, val, var, v

    _, visit, val, var, _ = jax.lax.while_loop(
        cond, body,
        (length - 1, tree.visits, tree.values, tree.vars_,
         jnp.float32(value)),
    )
    return tree._replace(visits=visit, values=val, vars_=var)


def backup_mixture(tree: Tree, trace, length, value, variance,
                   cfg: TreeConfig):
    """`backup_trace_mixture_obs`: treats each backup as a gaussian
    component and tracks the mixture's variance — var += (Δvar + Δ(v²))/n −
    (Δv/n)(v_old + v_new). NOTE: the reference's two implementations
    disagree on the per-level decay of the incoming variance — the numba
    core decays by γ (core_projection.py:182-200), the C++ twin by γ²
    (`_variance *= gamma * gamma`, core.h:262-301, which is also the
    statistically consistent Var(γX)). This follows the numba core
    (γ per level); golden tests pin that choice."""
    gamma = jnp.float32(cfg.gamma)
    score_row = tree.nstat[0]
    obs_row = tree.nstat[1].astype(jnp.int32)

    def cond(carry):
        t, *_ = carry
        return t >= 0

    def body(carry):
        t, visit, val, var, v, in_var = carry
        idx = trace[t]
        s = score_row[idx]
        o = obs_row[idx]
        v_rel = v - s
        n_new = visit[o] + 1.0
        v_diff = v_rel - val[o]
        v_sq_diff = v_rel * v_rel - val[o] * val[o]
        v_tmp = val[o]
        val_new = val[o] + v_diff / n_new
        var_diff = in_var - var[o]
        var_new = var[o] + (var_diff + v_sq_diff) / n_new - (
            v_diff / n_new
        ) * (v_tmp + val_new)
        visit = visit.at[o].set(n_new)
        val = val.at[o].set(val_new)
        var = var.at[o].set(var_new)
        v = gamma * v_rel + s
        in_var = gamma * in_var
        return t - 1, visit, val, var, v, in_var

    _, visit, val, var, _, _ = jax.lax.while_loop(
        cond, body,
        (length - 1, tree.visits, tree.values, tree.vars_,
         jnp.float32(value), jnp.float32(variance)),
    )
    return tree._replace(visits=visit, values=val, vars_=var)


def backup_leaf_parallel(tree: Tree, trace, length, v_nn, var_nn, expanded,
                         cfg: TreeConfig):
    """`backup_trace_obs_LP` with averaged=True (C++ core.h:303-381, the
    ValueSimLP configuration, `agents/ValueSimLP.py:29-33`): seed each fresh
    unique child obs with its NN estimate (zero for terminal children), then
    back up the mean child value v̄ = mean(score(c) + γ·value(o)) − relative,
    var̄ = γ²·mean(var(o)) through the trace.

    v_nn / var_nn: float32[7] NN outputs aligned with the action slots.
    expanded: whether the leaf was expanded this sim (else terminal backup:
    v = score(leaf), var = 0)."""
    tree, v0, var0 = lp_seed(tree, trace, length, v_nn, var_nn, expanded, cfg)
    return backup(tree, trace, length, v0, var0, cfg)


def backup_batched(trees: Tree, traces, lengths, v0, var0, cfg: TreeConfig):
    """Hand-batched `backup` over B trees in ONE while_loop (no vmap).

    vmap's while_loop batching rule re-selects EVERY carried array per
    iteration (`where(cond_b, new, old)` over the full (B, M) stat arrays)
    and runs a per-lane cond reduction; writing the batch dimension by hand
    replaces all of that with index redirection — dead lanes scatter out of
    range (mode="drop") and only the (B,) scalars are masked. Iteration k
    processes level length_b-1-k of every lane b (each lane's own reverse
    order), so per-lane arithmetic is IDENTICAL to `backup` — bit-exact,
    golden-tested against the vmapped form.

    trees: batched Tree (leading axis B on every field).
    traces (B, D), lengths (B,), v0 (B,), var0 (B,)."""
    B, M = trees.visits.shape
    gamma = jnp.float32(cfg.gamma)
    bidx = jnp.arange(B)
    score_row = trees.nstat[:, 0, :]                     # (B, N)
    obs_row = trees.nstat[:, 1, :].astype(jnp.int32)     # (B, N)
    kmax = jnp.max(lengths)

    def cond(c):
        k, *_ = c
        return k < kmax

    track_vmax = cfg.policy == "max"

    def body(c):
        k, visit, val, var, vmx, v = c
        t = lengths - 1 - k                    # per-lane level (reverse)
        live = t >= 0
        tt = jnp.maximum(t, 0)
        idx = traces[bidx, tt]                 # (B,)
        s = score_row[bidx, idx]
        o = jnp.where(live, obs_row[bidx, idx], M)  # dead lanes drop

        v_rel = v - s
        n = visit[bidx, jnp.minimum(o, M - 1)]
        valo = val[bidx, jnp.minimum(o, M - 1)]
        varo = var[bidx, jnp.minimum(o, M - 1)]
        first = n == 0.0
        delta = v_rel - valo
        val_new = jnp.where(first, v_rel, valo + delta / (n + 1.0))
        delta2 = v_rel - val_new
        var_new = jnp.where(
            first, var0, varo + (delta * delta2 - varo) / (n + 1.0)
        )

        visit = visit.at[bidx, o].set(n + 1.0, mode="drop")
        val = val.at[bidx, o].set(val_new, mode="drop")
        var = var.at[bidx, o].set(var_new, mode="drop")
        if track_vmax:
            vmxo = vmx[bidx, jnp.minimum(o, M - 1)]
            vmx = vmx.at[bidx, o].set(jnp.maximum(vmxo, v_rel), mode="drop")
        v = jnp.where(live, gamma * v_rel + s, v)
        return k + 1, visit, val, var, vmx, v

    _, visit, val, var, vmx, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), trees.visits, trees.values, trees.vars_, trees.vmax,
         v0.astype(jnp.float32)),
    )
    out = trees._replace(visits=visit, values=val, vars_=var)
    return out._replace(vmax=vmx) if track_vmax else out


def lp_seed(tree: Tree, trace, length, v_nn, var_nn, expanded,
            cfg: TreeConfig):
    """The seeding half of `backup_trace_obs_LP` (C++ core.h:303-381): seed
    fresh unique child obs with NN estimates and compute the averaged value
    to back up. Loop-free — `mcts.py` vmaps this, then runs ONE
    `backup_batched` over the whole batch. Returns (tree, v0, var0)."""
    leaf = trace[jnp.maximum(length - 1, 0)]
    kids, sc_kids, obs, kept = _kids_stats(tree, leaf)
    kept = kept & expanded

    first = kept & (tree.visits[obs] == 0.0)
    seed_v = jnp.where(tree.end[kids], 0.0, v_nn)
    seed_var = jnp.where(tree.end[kids], 0.0, var_nn)
    M = tree.visits.shape[0]
    obs_w = jnp.where(first, obs, M)

    tree = tree._replace(
        visits=tree.visits.at[obs_w].add(1.0, mode="drop"),
        values=tree.values.at[obs_w].set(seed_v, mode="drop"),
        vars_=tree.vars_.at[obs_w].set(seed_var, mode="drop"),
    )

    k = jnp.maximum(jnp.sum(kept.astype(jnp.int32)), 1)
    gamma = jnp.float32(cfg.gamma)
    v_sum = jnp.sum(
        jnp.where(kept, sc_kids + gamma * tree.values[obs], 0.0)
    )
    var_sum = jnp.sum(jnp.where(kept, tree.vars_[obs], 0.0))
    v_mean = v_sum / k
    var_mean = var_sum * gamma * gamma / k

    leaf_score = tree.nstat[0, leaf]
    v0 = jnp.where(expanded, v_mean, leaf_score)
    var0 = jnp.where(expanded, var_mean, 0.0)
    return tree, v0, var0


# ---------------------------------------------------------------------------
# root stats / advance
# ---------------------------------------------------------------------------

def compute_stats(tree: Tree, cfg: TreeConfig, idx=None):
    """3x7 [visit, Q, variance] per action at `idx` (reference
    `TreeAgent.compute_stats`, agents/agent.py:153-179)."""
    idx = tree.root if idx is None else idx
    kids = children_of(tree, idx)
    valid = kids != 0
    ns = tree.nstat[:, kids]
    obs = ns[1].astype(jnp.int32)
    visit = jnp.where(valid, tree.visits[obs], 0.0)
    q = jnp.where(
        valid, tree.values[obs] + ns[0] - tree.nstat[0, idx], -jnp.inf
    )
    var = jnp.where(valid, tree.vars_[obs], 0.0)
    return jnp.stack([visit, q, var])


def best_action(tree: Tree, cfg: TreeConfig):
    """Greedy argmax over root Q (reference `get_action`, agent.py:181-185)."""
    stats = compute_stats(tree, cfg)
    return jnp.argmax(stats[1]).astype(jnp.int32)


def visit_probs(tree: Tree, cfg: TreeConfig):
    """Visit-proportional policy target (reference `get_prob`, agent.py:187)."""
    stats = compute_stats(tree, cfg)
    total = jnp.maximum(jnp.sum(stats[0]), 1.0)
    return stats[0] / total


def root_value(tree: Tree):
    o = tree.nstat[1, tree.root].astype(jnp.int32)
    return tree.values[o], tree.vars_[o]


def advance_root(tree: Tree, action, new_env_state: EnvState, cfg: TreeConfig):
    """Move the root to child[action, root] after the real env step — the
    reference's `update_root` + node dedup (agent.py:296-301). Allocates the
    node if the move was never expanded. The root env state always becomes
    the post-move state (it is the replay origin for the selection walk)."""
    cb = tree.cbase[tree.root]
    c = jnp.where(cb != 0, cb + action, 0)
    need = c == 0
    tree, fresh = alloc_node(tree, new_env_state, need, cfg)
    return tree._replace(
        root=jnp.where(need, fresh, c), root_state=new_env_state
    )


# ---------------------------------------------------------------------------
# training-data harvest
# ---------------------------------------------------------------------------

def harvest(tree: Tree, min_visits: int, cfg: TreeConfig):
    """Training tuples from the obs table (reference `ValueSim.store_nodes`,
    agents/ValueSim.py:122-159): every obs with visit >= min_visits and not
    terminal yields (packed board, value, variance, visit-weight). Returns
    (packed uint32[M,20], value f32[M], var f32[M], weight f32[M],
    mask bool[M]). Boards stay bit-packed (engine.unpack_obs outside the
    move program renders images for training)."""
    M = cfg.max_obs
    slots = jnp.arange(M)
    mask = (
        (slots >= 1)
        & (slots < tree.n_obs)
        & (tree.visits >= min_visits)
        & (~tree.obs_end)
    )
    packed = tree.obs_bits.T  # (M, 20)
    return packed, tree.values, tree.vars_, tree.visits, mask
