"""Policy-iteration MCTS (the reference `ApproxPolicyIter` agent,
`/root/reference/agents/ApproxPolicyIter.py`) on the array tree.

Algorithm (reference semantics):
- **select**: sample the action at every node from the stored NN policy
  (`select_trace_with_policy`, `agents/core.py:501-513`) until an unexpanded
  node; unexpanded nodes have zero priors -> uniform sampling.
- **evaluate+expand**: NN (value, policy) on the leaf; absolute value =
  leaf score + v; the policy seeds the leaf's prior
  (`ApproxPolicyIter.mcts`, `:91-108`).
- **backup**: reverse walk: visit++, incremental value mean, and ONE count
  added to the improvement policy at the greedy child action
  (`backup_trace_value_policy_obs`, `agents/core_projection.py:166-178`).
- **act**: argmax child Q (`get_action`, `:60-69`); policy target for
  training = improvement counts (`store_nodes` stores `policy_new`,
  `:155-185`), normalized to a distribution at harvest.

Deviations (documented):
- priors and improvement counts live on *obs* slots (transposition-shared)
  rather than per node — the projection-enabled variant of the reference
  stores `policy_new` per obs already (`:24-27`); sharing the prior as well
  is strictly more transposition-consistent.
- policy arrays are laid out (7, M) with the pool axis minor and boards are
  stored bit-packed, for the same TPU tiling reasons as tree.py.

Per-tree functions exist for tests/golden twins; the driver runs the
HAND-BATCHED walks (`select_batched`, `T.replay_leaf_batched`,
`backup_value_policy_batched`) — one while_loop for all B trees with
self-masking via index redirection (CLAUDE.md rule 5; vmap's while
batching re-selects every carried array per level). Each batched walk is
golden-tested bit-exact against vmapping its per-tree twin.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import EnvState
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.mcts import capacity_guard_for
from tetris_mcts_tpu.search.tree import N_ACTIONS, Tree, TreeConfig


class VPTree(NamedTuple):
    """Value/policy search state: the shared array tree plus obs-level priors
    (NN policy) and improvement counts (`policy` / `policy_new` arrays,
    ApproxPolicyIter.py:22-27)."""

    base: Tree
    prior: jax.Array    # float32[7, M] NN policy per obs (0 = unexpanded)
    pol_new: jax.Array  # float32[7, M] greedy-improvement counts


def init_vp_tree(env_state: EnvState, cfg: TreeConfig) -> VPTree:
    base = T.init_tree(env_state, cfg)
    M = cfg.max_obs
    return VPTree(
        base=base,
        prior=jnp.zeros((N_ACTIONS, M), jnp.float32),
        pol_new=jnp.zeros((N_ACTIONS, M), jnp.float32),
    )


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------

def select(vt: VPTree, key, cfg: TreeConfig):
    """Sample a path by the stored priors (`select_trace_with_policy`):
    descend child[a ~ prior[obs(idx)], idx] until child == 0. Zero priors
    sample uniformly (the reference's `sample_from` on zeros falls through to
    the last index; uniform is the fixed behavior). Returns
    (trace int32[D], actions int32[D], length)."""
    tree = vt.base
    D = cfg.max_depth
    trace0 = jnp.zeros(D, jnp.int32)
    act0 = jnp.zeros(D, jnp.int32)

    def cond(c):
        _, _, _, depth, done, _ = c
        return (~done) & (depth < D)

    def body(c):
        trace, acts, idx, depth, done, key = c
        trace = trace.at[depth].set(idx)
        o = tree.nstat[:, idx][1].astype(jnp.int32)
        p = vt.prior[:, o]
        total = jnp.sum(p)
        probs = jnp.where(total > 0, p / jnp.maximum(total, 1e-9), 1.0 / N_ACTIONS)
        key, sub = jax.random.split(key)
        a = jax.random.choice(sub, N_ACTIONS, p=probs).astype(jnp.int32)
        acts = acts.at[depth].set(a)
        cb = tree.cbase[idx]
        nxt = jnp.where(cb != 0, cb + a, 0)
        return trace, acts, nxt, depth + 1, nxt == 0, key

    trace, acts, _, depth, _, _ = jax.lax.while_loop(
        cond, body,
        (trace0, act0, tree.root, jnp.int32(0), jnp.asarray(False), key),
    )
    return trace, acts, depth


def select_batched(vts: VPTree, keys, cfg: TreeConfig):
    """Hand-batched `select` over B trees in ONE while_loop (CLAUDE.md rule
    5 — vmap's while batching re-selects every carried array per level).
    Finished lanes self-mask via index redirection; the per-level draws are
    the vmapped primitives, so trajectories are BIT-IDENTICAL to vmapping
    `select` (golden-tested).

    vts: batched VPTree; keys (B, 2) uint32. Returns
    (traces (B, D) i32, actions (B, D) i32, lengths (B,) i32)."""
    base = vts.base
    B = base.root.shape[0]
    D = cfg.max_depth
    bidx = jnp.arange(B)
    vsplit = jax.vmap(jax.random.split)
    vchoice = jax.vmap(
        lambda k, pr: jax.random.choice(k, N_ACTIONS, p=pr)
    )

    def cond(c):
        _, _, _, depth, done, _, _ = c
        return (depth < D) & ~jnp.all(done)

    def body(c):
        trace, acts, idx, depth, done, keys, lengths = c
        live = ~done
        col = jnp.where(live, depth, D)          # dead lanes write nowhere
        trace = trace.at[bidx, col].set(idx, mode="drop")

        o = base.nstat[bidx, 1, idx].astype(jnp.int32)          # (B,)
        # per-lane gather from the loop-INVARIANT prior store (rule 6:
        # fused gathers from invariant arrays are fine)
        p = jnp.take_along_axis(vts.prior, o[:, None, None], 2)[:, :, 0]
        total = jnp.sum(p, axis=1, keepdims=True)
        probs = jnp.where(
            total > 0, p / jnp.maximum(total, 1e-9), 1.0 / N_ACTIONS
        )
        ks = vsplit(keys)
        keys, sub = ks[:, 0], ks[:, 1]
        a = vchoice(sub, probs).astype(jnp.int32)
        acts = acts.at[bidx, col].set(a, mode="drop")

        cb = base.cbase[bidx, idx]
        nxt = jnp.where(cb != 0, cb + a, 0)
        newly_done = live & (nxt == 0)
        lengths = jnp.where(newly_done, depth + 1, lengths)
        idx = jnp.where(live & (nxt != 0), nxt, idx)
        return trace, acts, idx, depth + 1, done | newly_done, keys, lengths

    trace, acts, _, _, _, _, lengths = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((B, D), jnp.int32), jnp.zeros((B, D), jnp.int32),
         base.root, jnp.int32(0), jnp.zeros(B, bool), keys,
         jnp.full(B, D, jnp.int32)),
    )
    return trace, acts, lengths


# ---------------------------------------------------------------------------
# backup
# ---------------------------------------------------------------------------

def backup_value_policy(vt: VPTree, trace, length, value, cfg: TreeConfig):
    """`backup_trace_value_policy_obs` (core_projection.py:166-178): reverse
    walk; per node: visit++, value incremental mean (of absolute-minus-score
    returns, undiscounted as in the reference), then +1 improvement count at
    the greedy child action."""
    tree = vt.base

    def cond(carry):
        t, *_ = carry
        return t >= 0

    def body(carry):
        t, visit, val, pol_new = carry
        idx = trace[t]
        ns = tree.nstat[:, idx]            # (2,) [score, obs] — one gather
        s_idx = ns[0]
        o = ns[1].astype(jnp.int32)

        v_rel = jnp.float32(value) - s_idx
        new_visit = visit[o] + 1.0
        val_new = val[o] + (v_rel - val[o]) / new_visit

        cb = tree.cbase[idx]
        kids = jnp.where(cb != 0, cb + jnp.arange(N_ACTIONS), 0)
        nsk = tree.nstat[:, kids]          # (2, 7)
        kobs = nsk[1].astype(jnp.int32)
        q = jnp.where(kids != 0, val[kobs] + nsk[0] - s_idx, -jnp.inf)
        # reference scans children in order keeping strict-max (first argmax)
        amax = jnp.argmax(q)

        visit = visit.at[o].set(new_visit)
        val = val.at[o].set(val_new)
        pol_new = pol_new.at[amax, o].add(1.0)
        return t - 1, visit, val, pol_new

    _, visit, val, pol_new = jax.lax.while_loop(
        cond, body, (length - 1, tree.visits, tree.values, vt.pol_new)
    )
    return vt._replace(
        base=tree._replace(visits=visit, values=val), pol_new=pol_new
    )


def backup_value_policy_batched(vts: VPTree, traces, lengths, values,
                                cfg: TreeConfig):
    """Hand-batched `backup_value_policy` over B trees in ONE while_loop
    (same treatment as tree.backup_batched): iteration k processes level
    length_b-1-k of each lane, dead lanes scatter out of range
    (mode="drop"). Per-lane arithmetic is identical to the per-tree walk —
    bit-exact, golden-tested against the vmapped form. The improvement
    count is the one 3-index scalar scatter (CLAUDE.md rule 6: ~2x a flat
    scalar scatter, still far below vmap's full-carry re-selects).

    traces (B, D) i32, lengths (B,) i32, values (B,) f32."""
    base = vts.base
    B, M = base.visits.shape
    bidx = jnp.arange(B)
    score_row = base.nstat[:, 0, :]
    obs_row = base.nstat[:, 1, :].astype(jnp.int32)
    a7 = jnp.arange(N_ACTIONS)
    values = values.astype(jnp.float32)
    kmax = jnp.max(lengths)

    def cond(c):
        k, *_ = c
        return k < kmax

    def body(c):
        k, visit, val, pol_new = c
        t = lengths - 1 - k                  # per-lane level (reverse)
        live = t >= 0
        tt = jnp.maximum(t, 0)
        idx = traces[bidx, tt]
        s = score_row[bidx, idx]
        o = jnp.where(live, obs_row[bidx, idx], M)   # dead lanes drop
        oc = jnp.minimum(o, M - 1)

        v_rel = values - s                   # undiscounted, as per-tree
        n = visit[bidx, oc]
        valo = val[bidx, oc]
        new_visit = n + 1.0
        val_new = valo + (v_rel - valo) / new_visit

        # greedy child BEFORE this level's value write (per-tree order)
        cb = base.cbase[bidx, idx]
        kids = jnp.where((cb != 0)[:, None], cb[:, None] + a7[None, :], 0)
        nsk = jnp.take_along_axis(base.nstat, kids[:, None, :], axis=2)
        ksc = nsk[:, 0, :]
        kobs = nsk[:, 1, :].astype(jnp.int32)
        kval = jnp.take_along_axis(val, jnp.minimum(kobs, M - 1), axis=1)
        q = jnp.where(kids != 0, kval + ksc - s[:, None], -jnp.inf)
        amax = jnp.argmax(q, axis=1)

        visit = visit.at[bidx, o].set(new_visit, mode="drop")
        val = val.at[bidx, o].set(val_new, mode="drop")
        pol_new = pol_new.at[bidx, amax, o].add(1.0, mode="drop")
        return k + 1, visit, val, pol_new

    _, visit, val, pol_new = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), base.visits, base.values, vts.pol_new),
    )
    return vts._replace(
        base=base._replace(visits=visit, values=val), pol_new=pol_new
    )


# ---------------------------------------------------------------------------
# root stats
# ---------------------------------------------------------------------------

def best_action(vt: VPTree):
    """Greedy argmax over child Q (ApproxPolicyIter.get_action)."""
    tree = vt.base
    kids = T.children_of(tree, tree.root)
    nsk = tree.nstat[:, kids]
    kobs = nsk[1].astype(jnp.int32)
    q = jnp.where(
        kids != 0,
        tree.values[kobs] + nsk[0] - tree.nstat[0, tree.root],
        -jnp.inf,
    )
    return jnp.argmax(q).astype(jnp.int32)


def root_policy(vt: VPTree):
    """Normalized improvement counts at the root (training target / get_prob)."""
    o = vt.base.nstat[:, vt.base.root][1].astype(jnp.int32)
    counts = vt.pol_new[:, o]
    total = jnp.sum(counts)
    return jnp.where(total > 0, counts / jnp.maximum(total, 1e-9), 1.0 / N_ACTIONS)


def harvest(vt: VPTree, min_visits: int, cfg: TreeConfig):
    """Training tuples (packed board, value, policy distribution, visit
    weight) from the obs table (ApproxPolicyIter.store_nodes, `:150-185`)."""
    tree = vt.base
    M = cfg.max_obs
    slots = jnp.arange(M)
    counts = vt.pol_new  # (7, M)
    totals = jnp.sum(counts, axis=0, keepdims=True)
    pol = jnp.where(totals > 0, counts / jnp.maximum(totals, 1e-9), 1.0 / N_ACTIONS)
    visit, value = tree.visits, tree.values
    mask = (
        (slots >= 1)
        & (slots < tree.n_obs)
        & (visit >= min_visits)
        & (~tree.obs_end)
    )
    return (tree.obs_bits.T, value, pol.T, visit, mask)


# ---------------------------------------------------------------------------
# batched sim / move (the ApproxPolicyIter driver loop, fused like mcts.py)
# ---------------------------------------------------------------------------

class VPReplay(NamedTuple):
    """Training memory with a policy column (ApproxPolicyIter.py:30-38);
    boards bit-packed like mcts.Replay."""

    boards: jax.Array  # uint32[R, 20] packed
    value: jax.Array   # float32[R]
    policy: jax.Array  # float32[R, 7]
    weight: jax.Array  # float32[R]
    idx: jax.Array
    count: jax.Array
    total: jax.Array   # monotone rows-ever-written (see mcts.Replay)


def init_vp_replay(capacity: int) -> VPReplay:
    return VPReplay(
        boards=jnp.zeros((capacity, 20), jnp.uint32),
        value=jnp.zeros(capacity, jnp.float32),
        policy=jnp.zeros((capacity, N_ACTIONS), jnp.float32),
        weight=jnp.zeros(capacity, jnp.float32),
        idx=jnp.int32(0),
        count=jnp.int32(0),
        total=jnp.int32(0),
    )


def vp_replay_add(rep: VPReplay, packed, value, policy, weight, mask) -> VPReplay:
    R = rep.boards.shape[0]
    packed = packed.reshape(-1, 20)
    value = value.reshape(-1)
    policy = policy.reshape(-1, N_ACTIONS)
    weight = weight.reshape(-1)
    mask = mask.reshape(-1)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n = jnp.sum(mask.astype(jnp.int32))
    # latest-wins past capacity (see mcts.replay_add): duplicate mod-R
    # scatter indices have an unspecified winner
    keep = mask & (pos >= n - R)
    dst = (rep.idx + pos) % R
    dst = jnp.where(keep, dst, R)
    return VPReplay(
        boards=rep.boards.at[dst].set(packed, mode="drop"),
        value=rep.value.at[dst].set(value, mode="drop"),
        policy=rep.policy.at[dst].set(policy, mode="drop"),
        weight=rep.weight.at[dst].set(weight, mode="drop"),
        idx=(rep.idx + n) % R,
        count=jnp.minimum(rep.count + n, R),
        total=rep.total + n,
    )


class VPMoveStats(NamedTuple):
    action: jax.Array       # int32[B]
    probs: jax.Array        # float32[B, 7] root improvement policy
    root_value: jax.Array   # float32[B]
    score: jax.Array        # int32[B]
    lines: jax.Array        # int32[B]
    done: jax.Array         # bool[B]
    reset: jax.Array        # bool[B]


def make_vp_move_fn(apply_fn, cfg, min_visits_store: int = 10,
                    store: bool = True):
    """Jitted per-move program for the VP agent.

    apply_fn: (params, imgs NHWC) -> (v (B,1), logits (B,7)).
    cfg: mcts.SearchConfig (only .tree and .sims are used).
    Signature: (params, vtrees, envs, replay, key)
        -> (vtrees, envs, replay, VPMoveStats).
    """
    tcfg = cfg.tree
    # expansion in three phases like mcts.make_run_sims: per-tree child
    # stepping (vmapped, loop-free), ONE hand-batched obs-table insert
    # (vmapping T.expand would vmap `_insert_obs7`'s probe while_loop —
    # CLAUDE.md rule 5: vmap's while batching re-selects the carried (B, T)
    # tables every round), then per-tree node-row commits (vmapped,
    # loop-free). Bit-exact vs vmapped T.expand (insert golden-tested).
    vexpand_ch = jax.vmap(T.expand_children, in_axes=(0, 0, None))
    vexpand_commit = jax.vmap(
        T.expand_commit, in_axes=(0, 0, 0, 0, 0, 0, None)
    )
    from tetris_mcts_tpu.ops import tree_walk as _tw

    insert_fn = _tw.insert_fn_for(tcfg)
    vheadroom = jax.vmap(T.headroom, in_axes=(0, None))
    vbest = jax.vmap(best_action)
    vrootpol = jax.vmap(root_policy)
    vadvance = jax.vmap(T.advance_root, in_axes=(0, 0, 0, None))
    vharvest = jax.vmap(harvest, in_axes=(0, None, None))
    vinit = jax.vmap(init_vp_tree, in_axes=(0, None))
    vsoft_reset = jax.vmap(engine.soft_reset, in_axes=(0, None))

    from tetris_mcts_tpu.search.mcts import bgather, bgather_col

    def sim_once(params, vtrees, key):
        B = vtrees.base.root.shape[0]
        key, k_sel = jax.random.split(key)
        # hand-batched walks (CLAUDE.md rule 5) — bit-identical to the
        # vmapped per-tree forms they are golden-tested against
        traces, actions, lengths = select_batched(
            vtrees, jax.random.split(k_sel, B), tcfg
        )
        leafs = bgather(traces, jnp.maximum(lengths - 1, 0))
        leaf_states = T.replay_leaf_batched(
            vtrees.base, actions, lengths, tcfg
        )

        leaf_end = bgather(vtrees.base.end, leafs)
        childless = bgather(vtrees.base.cbase, leafs) == 0
        can = (~leaf_end) & childless & vheadroom(vtrees.base, tcfg)

        # evaluate all leaves in one forward pass
        imgs = jax.vmap(engine.get_state)(leaf_states)
        v, logits = apply_fn(params, imgs[..., None].astype(jnp.float32))
        p = jax.nn.softmax(logits, axis=-1)

        # seed priors at the leaf obs (only when expanding); read-free write
        # (index redirected out of range when not expanding, see tree._masked_set)
        leaf_ns = bgather_col(vtrees.base.nstat, leafs)  # (B, 2)
        leaf_obs = leaf_ns[:, 1].astype(jnp.int32)
        M_obs = vtrees.prior.shape[-1]
        prior = jax.vmap(
            lambda pr, o, pi, ok: pr.at[
                :, jnp.where(ok, o, M_obs)
            ].set(pi, mode="drop")
        )(vtrees.prior, leaf_obs, p, can)
        vtrees = vtrees._replace(prior=prior)

        child_states, packed7 = vexpand_ch(vtrees.base, leaf_states, tcfg)
        base, obs7 = insert_fn(
            vtrees.base, packed7, child_states.end, can, tcfg
        )
        base = vexpand_commit(
            base, child_states.score, child_states.end, obs7, leafs, can,
            tcfg,
        )
        vtrees = vtrees._replace(base=base)

        leaf_score = leaf_ns[:, 0]
        value = jnp.where(can, leaf_score + v.reshape(-1), leaf_score)
        vtrees = backup_value_policy_batched(
            vtrees, traces, lengths, value, tcfg
        )
        return vtrees, key

    def run_sims(params, vtrees, key):
        def body(_, carry):
            vtrees, key = carry
            return sim_once(params, vtrees, key)

        vtrees, _ = jax.lax.fori_loop(0, cfg.sims, body, (vtrees, key))
        return vtrees

    capacity_guard = capacity_guard_for(cfg.sims, tcfg, cfg.allow_clamp)

    def move(params, vtrees: VPTree, envs: EnvState, replay: VPReplay, key):
        key, k_sims = jax.random.split(key)
        vtrees = run_sims(params, vtrees, k_sims)

        action = vbest(vtrees)
        probs = vrootpol(vtrees)
        root_obs = bgather_col(vtrees.base.nstat, vtrees.base.root)[:, 1].astype(jnp.int32)
        rv = bgather(vtrees.base.values, root_obs)

        envs2 = engine.step_batch(envs, action, tcfg.env)
        base2 = vadvance(vtrees.base, action, envs2, tcfg)
        vtrees = vtrees._replace(base=base2)

        done = envs2.end
        full = (base2.n_nodes + capacity_guard > tcfg.max_nodes) | (
            base2.n_obs + capacity_guard > tcfg.max_obs
        )
        trigger = done | full | (base2.root == 0)

        envs3 = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            vsoft_reset(envs2, tcfg.env), envs2,
        )

        def harvest_and_reset(args):
            vtrees, envs3, replay = args
            packed, val, pol, w, mask = vharvest(vtrees, min_visits_store, tcfg)
            mask = mask & trigger[:, None]
            if store:
                replay = vp_replay_add(replay, packed, val, pol, w, mask)
            fresh = vinit(envs3, tcfg)
            vtrees2 = jax.tree.map(
                lambda f, t: jnp.where(
                    trigger.reshape((-1,) + (1,) * (f.ndim - 1)), f, t
                ),
                fresh, vtrees,
            )
            return vtrees2, replay

        def no_harvest(args):
            vtrees, _, replay = args
            return vtrees, replay

        vtrees, replay = jax.lax.cond(
            jnp.any(trigger), harvest_and_reset, no_harvest,
            (vtrees, envs3, replay),
        )

        stats = VPMoveStats(
            action=action, probs=probs, root_value=rv,
            score=envs2.score, lines=envs2.lines, done=done, reset=trigger,
        )
        return vtrees, envs3, replay, stats

    return move


def init_vp_batch(seed: int, batch: int, cfg):
    envs = engine.reset_batch(seed, batch, cfg.tree.env)
    vtrees = jax.vmap(init_vp_tree, in_axes=(0, None))(envs, cfg.tree)
    return vtrees, envs
