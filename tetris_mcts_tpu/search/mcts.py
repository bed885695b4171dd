"""Batched MCTS self-play: B envs × B trees × one fused XLA program.

This is the throughput core of the framework. Where the reference runs one
game, crossing Python→C++→Torch per simulation with NN batches of ≤7
(`SURVEY.md` §3.1 marks that boundary as the throughput killer), here a whole
batch of envs runs sims in lockstep:

    sim:   vmap(select: action path + inline env replay → leaf state) →
           vmap(expand: 7 engine.steps, contiguous alloc) →
           ONE network forward over all B×7 child images →
           vmap(leaf-parallel backup)
    move:  fori(sims) → greedy root action → vmap(engine.step) →
           vmap(advance_root) → [harvest+reset under lax.cond when triggered]

Child observations flow straight from the expansion step into the NN forward
(never through the node store), and the replay ring holds bit-packed boards
(`engine.pack_obs`) — nothing in the move program touches an array padded
worse than ~1x under TPU (8,128) tiling (see tree.py module docstring for
the v1 post-mortem).

Evaluators:
- "lp":      NN value/variance on all 7 children, averaged leaf-parallel
             backup (the reference's recommended ValueSimLP,
             `agents/ValueSimLP.py:44-70`).
- "leaf":    NN on the leaf only, absolute value = score + v
             (`agents/ValueSim.py:76-94`).
- "rollout": uniform random playout to game end from the leaf, variance 1e3
             (`agents/Vanilla.py:41-64`) — runs on-device, vmapped.
- "hybrid" / "finite" / "full": NN-policy-guided playouts (the legacy
             HybridSim/FiniteSim/FullSim agents, `agents/HybridSim.py:26-57`,
             `FiniteSim.py:26-48`, `FullSim.py:24-43`) — all B playouts
             advance in lockstep, one policy forward per playout level.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import EnvState
from tetris_mcts_tpu.ops import tree_walk
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.tree import Tree, TreeConfig

N_ACTIONS = T.N_ACTIONS


class SearchConfig(NamedTuple):
    tree: TreeConfig = TreeConfig()
    sims: int = 100
    evaluator: str = "lp"          # "lp" | "leaf" | "rollout"
    rollout_cap: int = 512         # max random-playout length (rollout mode)
    rollout_variance: float = 1e3  # fixed rollout variance (Vanilla.py:54)
    allow_clamp: bool = False      # accept pools too small for one move
                                   # (degraded search) instead of raising


def bgather(arr, idx):
    """Per-env row gather: arr (B, N, ...), idx (B,) -> (B, ...)."""
    return jax.vmap(lambda a, i: a[i])(arr, idx)


def bgather_col(arr, idx):
    """Per-env column gather: arr (B, K, N), idx (B,) -> (B, K)."""
    return jax.vmap(lambda a, i: a[:, i])(arr, idx)


# ---------------------------------------------------------------------------
# evaluators — consume env states produced by the expansion step
# ---------------------------------------------------------------------------

def nn_child_evaluator(apply_fn):
    """Evaluate all 7 children of every env's leaf in one forward pass.
    apply_fn: (params, ubound, imgs NHWC) -> (v, var) flat. child_imgs is
    the (B, 7, 20, 10) int8 getState image stack (rendered by the driver —
    from the fused kernel's packed observations or from the XLA-stepped
    child states; `engine.unpack_obs` and `engine.get_state` are
    identity-equivalent)."""

    def ev(params, ubound, child_imgs, leaf_states, key):
        B = child_imgs.shape[0]
        flat = child_imgs.reshape(B * N_ACTIONS, 20, 10, 1).astype(jnp.float32)
        v, var = apply_fn(params, ubound, flat)
        return v.reshape(B, N_ACTIONS), var.reshape(B, N_ACTIONS)

    return ev


def nn_leaf_evaluator(apply_fn):
    """Evaluate the leaf obs only (ValueSim single-leaf semantics)."""

    def ev(params, ubound, child_imgs, leaf_states, key):
        imgs = jax.vmap(engine.get_state)(leaf_states)  # (B, 20, 10)
        flat = imgs[..., None].astype(jnp.float32)
        v, var = apply_fn(params, ubound, flat)
        return v, var  # (B,), (B,)

    return ev


def rollout_evaluator(cfg: SearchConfig):
    """Uniform-random playout to game end (bounded) — the Vanilla agent's
    evaluator (`agents/Vanilla.py:47-55`).

    All B playouts advance in lockstep through ONE hand-batched while_loop
    (`engine.step` self-masks ended lanes), never a vmapped per-lane loop:
    vmap's while batching re-selects every carried EnvState field per step
    (CLAUDE.md rule 5). Action draws are one batched uniform per level —
    the same i.i.d. law as per-lane key streams."""

    env_cfg = cfg.tree.env
    cap = cfg.rollout_cap

    def ev(params, ubound, child_imgs, leaf_states, key):
        B = leaf_states.score.shape[0]

        def cond(c):
            st, k, t = c
            return (t < cap) & jnp.any(~st.end)

        def body(c):
            st, k, t = c
            k, sub = jax.random.split(k)
            a = jax.random.randint(sub, (B,), 0, N_ACTIONS)
            return engine.step_batch(st, a, env_cfg), k, t + 1

        final, _, _ = jax.lax.while_loop(
            cond, body, (leaf_states, key, jnp.int32(0))
        )
        v = final.score.astype(jnp.float32)
        return v, jnp.full(B, cfg.rollout_variance, jnp.float32)

    return ev


def policy_rollout_evaluator(vp_apply, cfg: SearchConfig, depth: int,
                             bootstrap: bool):
    """NN-policy-guided playout from the leaf — the legacy rollout agents
    (`agents/FiniteSim.py:26-48` depth-50, `agents/FullSim.py:24-43`
    to-game-end, `agents/HybridSim.py:26-57` depth-30 with value bootstrap),
    whose per-step loop was: sample a ~ softmax(policy(state)), play(a),
    repeat; value = the playout's final score (+ NN value at the final
    state when `bootstrap`, v=0 if the playout died — HybridSim.py:46-57;
    the reference bootstraps off the *leaf* state there, a relic bug this
    rebuild fixes by evaluating the playout end state).

    TPU shape: where the reference rolls out ONE game serially with an NN
    call per step, here all B playouts advance in lockstep — one batched
    policy forward per playout level, `engine.step` self-masking finished
    lanes (no-op on `end`). The loop exits early once every lane is done.

    vp_apply: (params, states_nhwc) -> (v, logits) — the VP net
    (`models/nets.VPNet`); `ubound` in the evaluator signature is the VV
    bounds slot, unused here.
    """
    env_cfg = cfg.tree.env

    def ev(params, ubound, child_imgs, leaf_states, key):
        B = leaf_states.score.shape[0]

        def forward(states):
            imgs = jax.vmap(engine.get_state)(states)
            return vp_apply(params, imgs[..., None].astype(jnp.float32))

        def cond(c):
            st, k, t = c
            return (t < depth) & jnp.any(~st.end)

        def body(c):
            st, k, t = c
            _, logits = forward(st)
            k, sub = jax.random.split(k)
            a = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
            return engine.step_batch(st, a, env_cfg), k, t + 1

        final, _, _ = jax.lax.while_loop(
            cond, body, (leaf_states, key, jnp.int32(0))
        )
        value = final.score.astype(jnp.float32)
        if bootstrap:
            v, _ = forward(final)
            value = value + jnp.where(final.end, 0.0, v.reshape(-1))
        return value, jnp.full(B, cfg.rollout_variance, jnp.float32)

    return ev


# ---------------------------------------------------------------------------
# one simulation for the whole batch
# ---------------------------------------------------------------------------

def make_run_sims(evaluator: Callable, cfg: SearchConfig):
    tcfg = cfg.tree
    vexpand_ch = jax.vmap(T.expand_children, in_axes=(0, 0, None))
    vexpand_commit = jax.vmap(
        T.expand_commit, in_axes=(0, 0, 0, 0, 0, 0, None)
    )
    vseed_lp = jax.vmap(T.lp_seed, in_axes=(0, 0, 0, 0, 0, 0, None))
    # On TPU the backup walk runs as ONE Pallas kernel (~85x the XLA
    # while_loop form, ops/tree_walk.py); off-TPU the hand-batched XLA walk
    # computes bit-identical results (golden-tested), so the platform switch
    # is numerically transparent.
    # --policy max needs the Tree.vmax max-return statistic, which only the
    # XLA walks maintain (the Pallas kernels' stat layout has no slot for a
    # legacy-policy column) — force the walk path for it.
    walk_kernels_ok = tree_walk.use_walk_kernels() and tcfg.policy != "max"
    backup_fn = (
        tree_walk.backup_batched_pallas
        if walk_kernels_ok
        else T.backup_batched
    )
    # The obs-table probe loop also exists as a Pallas kernel — opt-in via
    # TreeConfig.insert_kernel (see the field comment for why it defaults
    # off). Non-projection mode has no probe loop and always keeps the
    # trivial XLA form.
    insert_fn = tree_walk.insert_fn_for(tcfg)

    def sim_once(params, ubound, trees, key):
        B = trees.root.shape[0]
        key, k_sel, k_ev = jax.random.split(key, 3)
        kernel_path = (tcfg.select_kernel and walk_kernels_ok
                       and tree_walk.select_kernel_config_ok(tcfg, B))
        if kernel_path:
            # ONE Pallas kernel walks all B trees, carrying and stepping
            # each lane's env state inline, AND steps the leaf's 7 children
            # — the leaf states, packed child observations, child scores
            # and end flags all come straight out of the kernel (no
            # node-state store, no replay, no XLA-side child stepping)
            (traces, lengths, leafs, leaf_states, packed7, child_sc7,
             child_end7) = tree_walk.select_batched_pallas(trees, k_sel, tcfg)
            childless = bgather(trees.cbase, leafs) == 0
        else:
            # hand-batched XLA walk (bit-identical stream/trajectories to
            # vmapping T.select — golden-tested): steps the env inline and
            # returns the leaf states and the exit (= childless) flag
            traces, actions, lengths, leafs, childless, leaf_states = (
                T.select_batched(trees, jax.random.split(k_sel, B), tcfg)
            )

        leaf_end = bgather(trees.end, leafs)
        headroomB = (trees.n_nodes + N_ACTIONS <= tcfg.max_nodes) & (
            trees.n_obs + N_ACTIONS <= tcfg.max_obs
        )
        can = (~leaf_end) & childless & headroomB

        # expand in three phases: per-tree child stepping (in the kernel,
        # or vmapped loop-free XLA), ONE hand-batched obs-table insert
        # (vmap's while batching re-masks the carried (B, T) tables per
        # probe round), then per-tree node-row writes (vmapped, loop-free)
        ok = can  # headroomB already guarantees node-pool room
        if kernel_path:
            child_imgs = engine.unpack_obs(packed7)      # (B, 7, 20, 10)
        else:
            child_states, packed7 = vexpand_ch(trees, leaf_states, tcfg)
            child_sc7 = child_states.score.astype(jnp.float32)
            child_end7 = child_states.end
            child_imgs = jax.vmap(jax.vmap(engine.get_state))(child_states)
        trees, obs7 = insert_fn(trees, packed7, child_end7, ok, tcfg)
        trees = vexpand_commit(
            trees, child_sc7, child_end7, obs7, leafs, ok, tcfg
        )

        if cfg.evaluator == "lp":
            v, var = evaluator(params, ubound, child_imgs, leaf_states, k_ev)
            if walk_kernels_ok:
                # the whole post-NN phase (seed unique children, averaged
                # value, reverse Welford+γ walk) is ONE Pallas kernel
                trees = tree_walk.lp_backup_batched_pallas(
                    trees, traces, lengths, v, var, can, tcfg
                )
            else:
                # loop-free seeding per tree, then one hand-batched backup
                # walk (bit-equivalent; golden-tested vs the kernel)
                trees, v0, var0 = vseed_lp(
                    trees, traces, lengths, v, var, can, tcfg
                )
                trees = backup_fn(trees, traces, lengths, v0, var0, tcfg)
        else:
            v, var = evaluator(params, ubound, child_imgs, leaf_states, k_ev)
            leaf_score = bgather_col(trees.nstat, leafs)[:, 0]
            if cfg.evaluator == "leaf":
                # ValueSim: absolute value = leaf score + NN value; terminal
                # leaves back up (score, 0) (`agents/ValueSim.py:83-93`).
                v0 = jnp.where(can, leaf_score + v, leaf_score)
                var0 = jnp.where(can, var, 0.0)
            else:  # rollout: absolute final score of the playout
                v0 = jnp.where(can, v, leaf_score)
                var0 = jnp.where(can, var, 0.0)
            trees = backup_fn(trees, traces, lengths, v0, var0, tcfg)
        return trees, key

    def run(params, ubound, trees, key):
        def body(_, carry):
            trees, key = carry
            return sim_once(params, ubound, trees, key)

        trees, _ = jax.lax.fori_loop(0, cfg.sims, body, (trees, key))
        return trees

    # single-sim handle for debug harnesses (scripts/probe_select_sim.py
    # drives sims one at a time to localize the select-kernel miscompile);
    # production code always calls `run` (the fused fori_loop)
    run.sim_once = sim_once
    return run


# ---------------------------------------------------------------------------
# replay ring buffer (device-resident, bit-packed boards)
# ---------------------------------------------------------------------------

class Replay(NamedTuple):
    """On-device training-memory ring (the reference's `self.memory` arrays,
    `agents/ValueSim.py:25-32`, as a fixed ring buffer). Boards are stored
    bit-packed (uint32[R, 20], `engine.pack_obs`); unpack with
    `engine.unpack_obs` when building training batches."""

    boards: jax.Array  # uint32[R, 20] packed
    value: jax.Array   # float32[R]
    var: jax.Array     # float32[R]
    weight: jax.Array  # float32[R]
    idx: jax.Array     # int32 next write slot
    count: jax.Array   # int32 rows ever written (clamped to R)
    total: jax.Array   # int32 rows ever written (monotone; the host's
                       #   training trigger reads this — unlike an idx
                       #   delta it survives full ring wraps)
    cand: jax.Array    # int32 monotone count of store CANDIDATES (rows
                       #   passing the min-visit filter BEFORE the stochastic
                       #   drop) — accumulation policy 0's `accumulated_nodes`
                       #   (agents/cppmodule/agent.cpp:801-802)
    drop_prob: jax.Array  # float32 stochastic store-drop probability
                       #   (`memory_drop_prob`, agent.cpp:644); host-updated,
                       #   applied only when the move fn was built with
                       #   store_drop=True (accumulation policy 0)


def init_replay(capacity: int) -> Replay:
    return Replay(
        boards=jnp.zeros((capacity, 20), jnp.uint32),
        value=jnp.zeros(capacity, jnp.float32),
        var=jnp.zeros(capacity, jnp.float32),
        weight=jnp.zeros(capacity, jnp.float32),
        idx=jnp.int32(0),
        count=jnp.int32(0),
        total=jnp.int32(0),
        cand=jnp.int32(0),
        drop_prob=jnp.float32(0.0),
    )


def replay_add(rep: Replay, packed, value, var, weight, mask,
               mask_candidates=None) -> Replay:
    """Append masked rows (any leading shape, flattened) at the ring head.
    `mask_candidates` (optional): the pre-stochastic-drop store mask, counted
    into `cand` (accumulation policy 0 bookkeeping); defaults to `mask`."""
    R = rep.boards.shape[0]
    packed = packed.reshape(-1, 20)
    value = value.reshape(-1)
    var = var.reshape(-1)
    weight = weight.reshape(-1)
    mask = mask.reshape(-1)
    n_cand = jnp.sum(
        (mask if mask_candidates is None else mask_candidates.reshape(-1))
        .astype(jnp.int32)
    )

    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n = jnp.sum(mask.astype(jnp.int32))
    # Latest-wins when ONE call exceeds capacity: beyond R rows the mod-R
    # wrap would scatter duplicate indices, whose surviving writer XLA
    # leaves unspecified — keep only the newest R rows instead.
    keep = mask & (pos >= n - R)
    dst = (rep.idx + pos) % R
    dst = jnp.where(keep, dst, R)  # dropped rows redirect out of range
    return Replay(
        boards=rep.boards.at[dst].set(packed, mode="drop"),
        value=rep.value.at[dst].set(value, mode="drop"),
        var=rep.var.at[dst].set(var, mode="drop"),
        weight=rep.weight.at[dst].set(weight, mode="drop"),
        idx=(rep.idx + n) % R,
        count=jnp.minimum(rep.count + n, R),
        total=rep.total + n,
        cand=rep.cand + n_cand,
        drop_prob=rep.drop_prob,
    )


# ---------------------------------------------------------------------------
# replay trimming (the C++ OnlineMCTSAgent memory policies,
# agents/cppmodule/agent.cpp:710-775) — cold-path jitted compactions
# ---------------------------------------------------------------------------

def _replay_compact(rep: Replay, keep_logical, valid):
    """Compact kept rows (in age order) to the front of a fresh ring.
    `keep_logical` bool[R] indexed in LOGICAL age order (oldest first);
    `valid` bool[R] marks real rows. Returns the trimmed Replay (idx = count
    = kept; `total`/`cand` stay monotone)."""
    R = rep.boards.shape[0]
    ar = jnp.arange(R, dtype=jnp.int32)
    order = (rep.idx - rep.count + ar) % R  # logical oldest -> newest
    keep = keep_logical & valid
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    kept = jnp.sum(keep.astype(jnp.int32))
    dst = jnp.where(keep, pos, R)
    b, v, va, w = (rep.boards[order], rep.value[order],
                   rep.var[order], rep.weight[order])
    z = lambda x: jnp.zeros_like(x)
    return Replay(
        boards=z(rep.boards).at[dst].set(b, mode="drop"),
        value=z(rep.value).at[dst].set(v, mode="drop"),
        var=z(rep.var).at[dst].set(va, mode="drop"),
        weight=z(rep.weight).at[dst].set(w, mode="drop"),
        idx=kept % R,
        count=kept,
        total=rep.total,
        cand=rep.cand,
        drop_prob=rep.drop_prob,
    ), rep.count - kept


@jax.jit
def replay_trim_weighted(rep: Replay, percentile):
    """`weighted_trimming` (agent.cpp:710-749): drop every row whose visit
    weight is <= the `percentile`-quantile of stored weights (ties drop
    together, exactly like the reference's `<= threshold`), compacting the
    survivors in age order. Returns (trimmed, n_dropped)."""
    R = rep.boards.shape[0]
    ar = jnp.arange(R, dtype=jnp.int32)
    order = (rep.idx - rep.count + ar) % R
    valid = ar < rep.count
    w = jnp.where(valid, rep.weight[order], jnp.inf)
    ws = jnp.sort(w)
    k = (rep.count.astype(jnp.float32) * percentile).astype(jnp.int32)
    thr = ws[jnp.clip(k, 0, R - 1)]
    return _replay_compact(rep, rep.weight[order] > thr, valid)


@jax.jit
def replay_trim_random(rep: Replay, fraction, key):
    """`random_trimming` (agent.cpp:751-775): drop floor(count*fraction)
    uniformly-random stored rows, compacting the survivors in age order.
    Returns (trimmed, n_dropped)."""
    R = rep.boards.shape[0]
    ar = jnp.arange(R, dtype=jnp.int32)
    valid = ar < rep.count
    m = (rep.count.astype(jnp.float32) * fraction).astype(jnp.int32)
    u = jnp.where(valid, jax.random.uniform(key, (R,)), jnp.inf)
    # drop the m smallest draws among valid rows (u ties have measure zero)
    thr = jnp.sort(u)[jnp.clip(m - 1, 0, R - 1)]
    drop = valid & (u <= thr) & (m > 0)
    return _replay_compact(rep, ~drop, valid)


def replay_clear(rep: Replay) -> Replay:
    """`memory_index = 0` after a training session (agent.cpp:703): the ring
    is logically emptied; monotone counters survive."""
    return rep._replace(idx=jnp.int32(0), count=jnp.int32(0))


# ---------------------------------------------------------------------------
# one move for the whole batch
# ---------------------------------------------------------------------------

class MoveStats(NamedTuple):
    action: jax.Array       # int32[B]
    probs: jax.Array        # float32[B, 7] visit-proportional policy
    child_stats: jax.Array  # float32[B, 3, 7]
    root_value: jax.Array   # float32[B]
    root_var: jax.Array     # float32[B]
    score: jax.Array        # int32[B] score after the move
    lines: jax.Array        # int32[B]
    done: jax.Array         # bool[B] episode ended on this move
    reset: jax.Array        # bool[B] tree was harvested+reset
    n_nodes: jax.Array      # int32[B] nodes allocated before any reset


def capacity_guard_for(sims: int, tcfg, allow_clamp: bool = False) -> int:
    """Node headroom one full move needs: trees must fit a move's expansions
    without mid-move pool exhaustion. When the configured pools can't hold
    that, sims beyond the pool silently expand nothing (ok=False backups with
    leaf score / zero variance) — a misconfiguration that corrupts every
    move, so it RAISES by default. `allow_clamp=True` opts into the old
    degraded behavior (tree harvests+resets every move, tail sims wasted)
    with a loud warning (VERDICT r1 item 7)."""
    need = N_ACTIONS * (sims + 1) + 2
    # headroom is gated on BOTH pools (make_run_sims checks n_nodes AND
    # n_obs) — an undersized max_obs fails mid-move exactly like max_nodes
    guard = min(need, tcfg.max_nodes - N_ACTIONS - 1,
                tcfg.max_obs - N_ACTIONS - 1)
    if need > guard:
        msg = (
            f"max_nodes={tcfg.max_nodes}/max_obs={tcfg.max_obs} cannot hold "
            f"one {sims}-sim move (~{need} nodes): the tree would harvest+"
            "reset every move and sims beyond the pool would expand nothing "
            "— raise max_nodes/max_obs or lower sims"
        )
        if not allow_clamp:
            raise ValueError(msg + " (or pass allow_clamp/--allow_clamp to "
                                   "accept the degraded search)")
        import sys as _sys
        print("warning: " + msg, file=_sys.stderr, flush=True)
    return guard


def make_move_fn(evaluator, cfg: SearchConfig, min_visits_store: int = 10,
                 store: bool = True, store_drop: bool = False,
                 episode_reuse: bool = False):
    """Build the jitted per-move function:

        (params, ubound, trees, envs, replay, key)
            -> (trees, envs, replay, MoveStats)

    `store=False` is benchmark mode — harvesting never writes to replay
    (reference `--benchmark` gating, `agents/ValueSim.py:109`).
    `store_drop=True` drops each store candidate with probability
    `replay.drop_prob` (accumulation policy 0's stochastic thinning,
    agent.cpp:802: `unif(mt) < memory_drop_prob -> continue`); candidates
    are still counted into `replay.cand` pre-drop.
    `episode_reuse=True` keeps the tree across episode boundaries: a done
    lane re-roots into the same pool at the reset state
    (`T.new_episode_root` — the reference's `update_root` semantics,
    agent.py:296-301) and only pool exhaustion harvests+resets; off, every
    episode end is a harvest+reset (the pre-round-5 behavior).
    """
    tcfg = cfg.tree
    run_sims = make_run_sims(evaluator, cfg)
    vstats = jax.vmap(T.compute_stats, in_axes=(0, None))
    vbest = jax.vmap(T.best_action, in_axes=(0, None))
    vprobs = jax.vmap(T.visit_probs, in_axes=(0, None))
    vrootv = jax.vmap(T.root_value)
    vadvance = jax.vmap(T.advance_root, in_axes=(0, 0, 0, None))
    vharvest = jax.vmap(T.harvest, in_axes=(0, None, None))
    vinit = jax.vmap(T.init_tree, in_axes=(0, None))
    vsoft_reset = jax.vmap(engine.soft_reset, in_axes=(0, None))

    capacity_guard = capacity_guard_for(cfg.sims, tcfg, cfg.allow_clamp)

    def move(params, ubound, trees, envs: EnvState, replay: Replay, key):
        key, k_sims, k_drop = jax.random.split(key, 3)
        trees = run_sims(params, ubound, trees, k_sims)

        action = vbest(trees, tcfg)
        stats = vstats(trees, tcfg)
        probs = vprobs(trees, tcfg)
        rv, rvar = vrootv(trees)

        envs2 = engine.step_batch(envs, action, tcfg.env)
        trees2 = vadvance(trees, action, envs2, tcfg)

        done = envs2.end
        full = (trees2.n_nodes + capacity_guard > tcfg.max_nodes) | (
            trees2.n_obs + capacity_guard > tcfg.max_obs
        )
        if episode_reuse:
            trigger = full | (trees2.root == 0)
        else:
            trigger = done | full | (trees2.root == 0)
        n_nodes_before = trees2.n_nodes

        envs3 = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            vsoft_reset(envs2, tcfg.env),
            envs2,
        )

        def harvest_and_reset(args):
            trees2, envs3, replay = args
            packed, val, var, w, mask = vharvest(trees2, min_visits_store, tcfg)
            mask = mask & trigger[:, None]
            if store:
                if store_drop:
                    u = jax.random.uniform(k_drop, mask.shape)
                    replay = replay_add(
                        replay, packed, val, var, w,
                        mask & (u >= replay.drop_prob), mask_candidates=mask,
                    )
                else:
                    replay = replay_add(replay, packed, val, var, w, mask)
            fresh = vinit(envs3, tcfg)
            trees3 = jax.tree.map(
                lambda f, t: jnp.where(
                    trigger.reshape((-1,) + (1,) * (f.ndim - 1)), f, t
                ),
                fresh,
                trees2,
            )
            return trees3, replay

        def no_harvest(args):
            trees2, _, replay = args
            return trees2, replay

        trees3, replay = jax.lax.cond(
            jnp.any(trigger), harvest_and_reset, no_harvest,
            (trees2, envs3, replay),
        )

        if episode_reuse:
            # done lanes that did NOT hard-reset re-root in place: the old
            # episode's subtree stays pooled (retired at the next GC) and
            # obs stats persist across episodes
            vreroot = jax.vmap(T.new_episode_root, in_axes=(0, 0, 0, None))
            trees3 = vreroot(trees3, envs3, done & ~trigger, tcfg)

        stats_out = MoveStats(
            action=action, probs=probs, child_stats=stats,
            root_value=rv, root_var=rvar,
            score=envs2.score, lines=envs2.lines,
            done=done, reset=trigger, n_nodes=n_nodes_before,
        )
        return trees3, envs3, replay, stats_out

    return move


def init_batch(seed: int, batch: int, cfg: SearchConfig):
    """(trees, envs) for B fresh games."""
    envs = engine.reset_batch(seed, batch, cfg.tree.env)
    trees = jax.vmap(T.init_tree, in_axes=(0, None))(envs, cfg.tree)
    return trees, envs
