"""Stochastic-transition MCTS — the reference `ValueSim2` agent
(`/root/reference/agents/ValueSim2.py`, cores `agents/core.py:94-219`)
rebuilt on the array tree.

ValueSim2's distinguishing idea: the game's piece draw makes transitions
stochastic, so it models each (state, action) edge as a DISTRIBUTION over
observed children with traversal counts (`child_info[s][a]` lists of
(child, count), `ValueSim2.py:19,94-107`) and selects with a UCB rule over
the aggregated edge statistics (`_tmp_func`/`_tmp_select`,
`core.py:159-190`):

    n_a        = sum of edge counts                   (stats[0])
    Q_a        = count-weighted mean child value      (stats[1])
    explore_a  = count-weighted mean of child max-return / sqrt(child visit)
                                                      (stats[2])
    distinct_a = number of distinct children seen     (stats[3])
    p_new      = (distinct_a + 0.5) / (n_a + 1)       Laplace estimate of an
                                                      unseen transition
    U_a        = sqrt(log Σ n_a) · (p_new · vmax / sqrt(n_a)
                                    + (1 − p_new) · explore_a)
    a*         = argmax(Q_a + U_a), but any action with NO recorded children
                 is taken first (`findZero_2`, core.py:147-151)

Backup is the legacy `backup_trace` (core.py:39-47): the SAME absolute value
v backs up the whole trace (no γ recurrence); per node (score-relative):
visit++, incremental mean, variance, and the max-return statistic
(node_stats[4]) the UCB reads.

TPU design (not a translation):
- nodes/obs/projection reuse `tree.Tree`; stochastic-edge statistics live at
  the OBS level, where transpositions actually collide: fixed-capacity
  tables `edge_child/edge_count/edge_dscore` of shape (7, C, M) — for each
  (action, parent obs) up to C = 7 observed child obs (the piece draw can
  spawn at most 7 distinct pieces, so C = 7 is exact, never lossy).
- `edge_dscore` carries the mean score delta of the edge. The reference's
  `_tmp_func` aggregates raw child values with no score correction (its
  legacy node layout blurred absolute/relative values — core.py:169 vs
  backup_trace:42); here values are score-relative by construction, so the
  edge's mean score delta restores the Q the reference intended.
- selection is deterministic (first-argmax, like np.argmax in the
  reference) — no RNG anywhere in the walk.
- walks are hand-batched over B trees in ONE while_loop (CLAUDE.md rule 5),
  self-masking via index redirection; per-tree twins exist for golden tests.

Capability tier, not the perf flagship: the per-level edge-table updates are
carried-array scatters (rule 6's slow class); size `max_obs` accordingly.
The reference agent is LEGACY/BROKEN (targets a removed agent API, SURVEY
§2.3); this is the working in-spirit rebuild.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import EnvState
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.mcts import (
    Replay, bgather, bgather_col, capacity_guard_for, init_replay, replay_add,
)
from tetris_mcts_tpu.search.tree import N_ACTIONS, Tree, TreeConfig

EDGE_CAP = 7  # distinct child obs per (obs, action): one per spawnable piece


class S2Tree(NamedTuple):
    """Array tree + per-(action, obs) stochastic-edge tables + the
    max-return statistic (`node_stats[4]`) the UCB reads."""

    base: Tree
    edge_child: jax.Array   # int32[7, C, M] child obs ids (0 = empty slot)
    edge_count: jax.Array   # float32[7, C, M] traversal counts
    edge_dscore: jax.Array  # float32[7, C, M] mean score delta of the edge
    max_ret: jax.Array      # float32[M] max score-relative return per obs


def init_s2_tree(env_state: EnvState, cfg: TreeConfig) -> S2Tree:
    M = cfg.max_obs
    return S2Tree(
        base=T.init_tree(env_state, cfg),
        edge_child=jnp.zeros((N_ACTIONS, EDGE_CAP, M), jnp.int32),
        edge_count=jnp.zeros((N_ACTIONS, EDGE_CAP, M), jnp.float32),
        edge_dscore=jnp.zeros((N_ACTIONS, EDGE_CAP, M), jnp.float32),
        max_ret=jnp.zeros(M, jnp.float32),
    )


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------

def _action_stats(vt: S2Tree, o):
    """The `_tmp_func` aggregation (core.py:159-175) for one obs id:
    returns (q (7,), u (7,), never bool[7]) — Q, exploration bonus, and the
    `findZero_2` no-recorded-children mask."""
    tree = vt.base
    M = tree.visits.shape[0]
    kids_obs = vt.edge_child[:, :, o]          # (7, C)
    counts = vt.edge_count[:, :, o]
    dsc = vt.edge_dscore[:, :, o]
    valid = kids_obs > 0
    co = jnp.clip(kids_obs, 0, M - 1)
    cval = tree.values[co]
    cvis = jnp.maximum(tree.visits[co], 1.0)
    cmax = vt.max_ret[co]

    n_a = jnp.sum(jnp.where(valid, counts, 0.0), axis=1)
    distinct = jnp.sum(valid, axis=1).astype(jnp.float32)
    na1 = jnp.maximum(n_a, 1.0)
    q = jnp.sum(jnp.where(valid, counts * (cval + dsc), 0.0), axis=1) / na1
    expl = jnp.sum(
        jnp.where(valid, counts * cmax * jax.lax.rsqrt(cvis), 0.0), axis=1
    ) / na1
    # reference `_tmp_select` (core.py:178-190): vmax over every observed
    # child's max-return (q_max accumulates from 0 there)
    vmax = jnp.max(jnp.where(valid, cmax, 0.0))
    p_new = (distinct + 0.5) / (n_a + 1.0)
    u = jnp.sqrt(jnp.log(jnp.maximum(jnp.sum(n_a), 2.0))) * (
        p_new * vmax * jax.lax.rsqrt(na1) + (1.0 - p_new) * expl
    )
    return q, u, distinct == 0


def select(vt: S2Tree, cfg: TreeConfig):
    """`select_index_2` (core.py:195-219) on the array tree: descend by
    argmax(Q + U) over the edge statistics (actions with no recorded
    children first) until an unexpanded node. Deterministic. Returns
    (trace int32[D], actions int32[D], length)."""
    tree = vt.base
    D = cfg.max_depth

    def cond(c):
        _, _, _, depth, done = c
        return (~done) & (depth < D)

    def body(c):
        trace, acts, idx, depth, done = c
        trace = trace.at[depth].set(idx)
        o = tree.nstat[:, idx][1].astype(jnp.int32)
        q, u, never = _action_stats(vt, o)
        a = jnp.where(
            jnp.any(never), jnp.argmax(never), jnp.argmax(q + u)
        ).astype(jnp.int32)
        acts = acts.at[depth].set(a)
        cb = tree.cbase[idx]
        nxt = jnp.where(cb != 0, cb + a, 0)
        return trace, acts, nxt, depth + 1, nxt == 0

    trace, acts, _, depth, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros(D, jnp.int32), jnp.zeros(D, jnp.int32), tree.root,
         jnp.int32(0), jnp.asarray(False)),
    )
    return trace, acts, depth


def select_batched(vts: S2Tree, cfg: TreeConfig):
    """Hand-batched `select` over B trees in ONE while_loop (CLAUDE.md rule
    5). All tables are loop-invariant during selection, so per-lane gathers
    are the fused kind rule 6 allows. Trajectories are bit-identical to
    vmapping `select` (golden-tested; the walk is deterministic)."""
    base = vts.base
    B = base.root.shape[0]
    D = cfg.max_depth
    M = base.visits.shape[1]
    bidx = jnp.arange(B)
    obs_row = base.nstat[:, 1, :].astype(jnp.int32)

    def cond(c):
        _, _, _, depth, done, _ = c
        return (depth < D) & ~jnp.all(done)

    def body(c):
        trace, acts, idx, depth, done, lengths = c
        live = ~done
        col = jnp.where(live, depth, D)
        trace = trace.at[bidx, col].set(idx, mode="drop")

        o = obs_row[bidx, idx]                              # (B,)
        kids_obs = jnp.take_along_axis(
            vts.edge_child, o[:, None, None, None], 3
        )[..., 0]                                           # (B, 7, C)
        counts = jnp.take_along_axis(
            vts.edge_count, o[:, None, None, None], 3
        )[..., 0]
        dsc = jnp.take_along_axis(
            vts.edge_dscore, o[:, None, None, None], 3
        )[..., 0]
        valid = kids_obs > 0
        co = jnp.clip(kids_obs, 0, M - 1).reshape(B, -1)
        cval = jnp.take_along_axis(base.values, co, 1).reshape(valid.shape)
        cvis = jnp.maximum(
            jnp.take_along_axis(base.visits, co, 1).reshape(valid.shape), 1.0
        )
        cmax = jnp.take_along_axis(vts.max_ret, co, 1).reshape(valid.shape)

        n_a = jnp.sum(jnp.where(valid, counts, 0.0), axis=2)      # (B, 7)
        distinct = jnp.sum(valid, axis=2).astype(jnp.float32)
        na1 = jnp.maximum(n_a, 1.0)
        q = jnp.sum(jnp.where(valid, counts * (cval + dsc), 0.0), 2) / na1
        expl = jnp.sum(
            jnp.where(valid, counts * cmax * jax.lax.rsqrt(cvis), 0.0), 2
        ) / na1
        vmax = jnp.max(jnp.where(valid, cmax, 0.0), axis=(1, 2))
        p_new = (distinct + 0.5) / (n_a + 1.0)
        u = jnp.sqrt(
            jnp.log(jnp.maximum(jnp.sum(n_a, 1, keepdims=True), 2.0))
        ) * (
            p_new * vmax[:, None] * jax.lax.rsqrt(na1) + (1.0 - p_new) * expl
        )
        never = distinct == 0
        a = jnp.where(
            jnp.any(never, 1), jnp.argmax(never, 1), jnp.argmax(q + u, 1)
        ).astype(jnp.int32)
        acts = acts.at[bidx, col].set(a, mode="drop")

        cb = base.cbase[bidx, idx]
        nxt = jnp.where(cb != 0, cb + a, 0)
        newly_done = live & (nxt == 0)
        lengths = jnp.where(newly_done, depth + 1, lengths)
        idx = jnp.where(live & (nxt != 0), nxt, idx)
        return trace, acts, idx, depth + 1, done | newly_done, lengths

    trace, acts, _, _, _, lengths = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((B, D), jnp.int32), jnp.zeros((B, D), jnp.int32),
         base.root, jnp.int32(0), jnp.zeros(B, bool),
         jnp.full(B, D, jnp.int32)),
    )
    return trace, acts, lengths


# ---------------------------------------------------------------------------
# backup
# ---------------------------------------------------------------------------

def _edge_slot(slots, oc):
    """Slot index for child obs `oc` in a (C,) slot row: the matching slot,
    else the first empty, else C (drop — cannot happen at C=7)."""
    match = slots == oc
    empty = slots == 0
    j_match = jnp.argmax(match)
    j_empty = jnp.argmax(empty)
    return jnp.where(
        jnp.any(match), j_match,
        jnp.where(jnp.any(empty), j_empty, jnp.int32(EDGE_CAP)),
    ).astype(jnp.int32)


def backup(vt: S2Tree, trace, acts, length, value, cfg: TreeConfig):
    """Legacy `backup_trace` (core.py:39-47) + `update_child_info`
    (ValueSim2.py:94-107), reverse walk: the SAME absolute `value` backs up
    every level (no γ); per obs: visit++, incremental mean/variance of the
    score-relative return, max-return update; per edge (o_t, a_t) -> o_{t+1}:
    count++ and incremental mean of the score delta."""
    tree = vt.base
    score_row = tree.nstat[0]
    obs_row = tree.nstat[1].astype(jnp.int32)
    value = jnp.float32(value)

    def cond(c):
        t, *_ = c
        return t >= 0

    def body(c):
        t, visit, val, var, mx, ech, ecn, eds = c
        idx = trace[t]
        s = score_row[idx]
        o = obs_row[idx]

        v_rel = value - s
        n = visit[o]
        first = n == 0.0
        delta = v_rel - val[o]
        val_new = jnp.where(first, v_rel, val[o] + delta / (n + 1.0))
        delta2 = v_rel - val_new
        var_new = jnp.where(
            first, 0.0, var[o] + (delta * delta2 - var[o]) / (n + 1.0)
        )
        visit = visit.at[o].set(n + 1.0)
        val = val.at[o].set(val_new)
        var = var.at[o].set(var_new)
        mx = mx.at[o].set(jnp.maximum(mx[o], v_rel))

        # edge into the next level (only when this node isn't the leaf)
        has_child = t < length - 1
        child = trace[jnp.minimum(t + 1, length - 1)]
        a = acts[t]
        oc = obs_row[child]
        ds = score_row[child] - s
        slots = ech[a, :, o]
        j = jnp.where(has_child, _edge_slot(slots, oc), EDGE_CAP)
        jc = jnp.minimum(j, EDGE_CAP - 1)
        # a freshly-claimed (no-match) slot starts from zero — same rule as
        # the batched walk below, which must stay bit-exact with this one
        live = (j < EDGE_CAP) & jnp.any(slots == oc)
        c_old = jnp.where(live, ecn[a, jc, o], 0.0)
        d_old = jnp.where(live, eds[a, jc, o], 0.0)
        c_new = c_old + 1.0
        d_new = d_old + (ds - d_old) / c_new
        ech = ech.at[a, j, o].set(oc, mode="drop")
        ecn = ecn.at[a, j, o].set(c_new, mode="drop")
        eds = eds.at[a, j, o].set(d_new, mode="drop")
        return t - 1, visit, val, var, mx, ech, ecn, eds

    _, visit, val, var, mx, ech, ecn, eds = jax.lax.while_loop(
        cond, body,
        (length - 1, tree.visits, tree.values, tree.vars_, vt.max_ret,
         vt.edge_child, vt.edge_count, vt.edge_dscore),
    )
    return vt._replace(
        base=tree._replace(visits=visit, values=val, vars_=var),
        edge_child=ech, edge_count=ecn, edge_dscore=eds, max_ret=mx,
    )


def backup_batched(vts: S2Tree, traces, actions, lengths, values,
                   cfg: TreeConfig):
    """Hand-batched `backup` over B trees in ONE while_loop: iteration k
    processes level length_b-1-k of each lane, dead lanes scatter out of
    range (mode="drop"). Per-lane arithmetic matches the per-tree walk
    bit-exactly (golden-tested against the vmapped form)."""
    base = vts.base
    B, M = base.visits.shape
    bidx = jnp.arange(B)
    score_row = base.nstat[:, 0, :]
    obs_row = base.nstat[:, 1, :].astype(jnp.int32)
    values = values.astype(jnp.float32)
    kmax = jnp.max(lengths)

    def cond(c):
        k, *_ = c
        return k < kmax

    def body(c):
        k, visit, val, var, mx, ech, ecn, eds = c
        t = lengths - 1 - k
        live = t >= 0
        tt = jnp.maximum(t, 0)
        idx = traces[bidx, tt]
        s = score_row[bidx, idx]
        o = jnp.where(live, obs_row[bidx, idx], M)       # dead lanes drop
        oc_ = jnp.minimum(o, M - 1)

        v_rel = values - s
        n = visit[bidx, oc_]
        first = n == 0.0
        valo = val[bidx, oc_]
        delta = v_rel - valo
        val_new = jnp.where(first, v_rel, valo + delta / (n + 1.0))
        delta2 = v_rel - val_new
        var_new = jnp.where(
            first, 0.0,
            var[bidx, oc_] + (delta * delta2 - var[bidx, oc_]) / (n + 1.0),
        )
        visit = visit.at[bidx, o].set(n + 1.0, mode="drop")
        val = val.at[bidx, o].set(val_new, mode="drop")
        var = var.at[bidx, o].set(var_new, mode="drop")
        mx_new = jnp.maximum(mx[bidx, oc_], v_rel)
        mx = mx.at[bidx, o].set(mx_new, mode="drop")

        has_child = live & (t < lengths - 1)
        child = traces[bidx, jnp.minimum(tt + 1, jnp.maximum(lengths - 1, 0))]
        a = actions[bidx, tt]
        oc = obs_row[bidx, jnp.minimum(child, base.cbase.shape[1] - 1)]
        ds = score_row[bidx, child] - s
        slots = ech[bidx, a, :, oc_]                     # (B, C)
        match = (slots == oc[:, None]) & has_child[:, None]
        empty = slots == 0
        j = jnp.where(
            jnp.any(match, 1), jnp.argmax(match, 1),
            jnp.where(jnp.any(empty, 1), jnp.argmax(empty, 1), EDGE_CAP),
        ).astype(jnp.int32)
        j = jnp.where(has_child, j, EDGE_CAP)            # dead/leaf drop
        jc = jnp.minimum(j, EDGE_CAP - 1)
        c_old = ecn[bidx, a, jc, oc_]
        d_old = eds[bidx, a, jc, oc_]
        # a fresh slot (no match) starts from zero even if the gathered
        # garbage slot held data
        fresh = ~jnp.any(match, 1)
        c_old = jnp.where(fresh, 0.0, c_old)
        d_old = jnp.where(fresh, 0.0, d_old)
        c_new = c_old + 1.0
        d_new = d_old + (ds - d_old) / c_new
        ech = ech.at[bidx, a, j, o].set(oc, mode="drop")
        ecn = ecn.at[bidx, a, j, o].set(c_new, mode="drop")
        eds = eds.at[bidx, a, j, o].set(d_new, mode="drop")
        return k + 1, visit, val, var, mx, ech, ecn, eds

    _, visit, val, var, mx, ech, ecn, eds = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), base.visits, base.values, base.vars_, vts.max_ret,
         vts.edge_child, vts.edge_count, vts.edge_dscore),
    )
    return vts._replace(
        base=base._replace(visits=visit, values=val, vars_=var),
        edge_child=ech, edge_count=ecn, edge_dscore=eds, max_ret=mx,
    )


# ---------------------------------------------------------------------------
# root stats / moves
# ---------------------------------------------------------------------------

def best_action(vt: S2Tree):
    """Greedy root action over the edge-aggregated Q (`fill_child_stats` +
    greedy `get_action` of the legacy agent surface)."""
    o = vt.base.nstat[:, vt.base.root][1].astype(jnp.int32)
    q, u, never = _action_stats(vt, o)
    kids_obs = vt.edge_child[:, :, o]
    n_a = jnp.sum(jnp.where(kids_obs > 0, vt.edge_count[:, :, o], 0.0), 1)
    return jnp.argmax(jnp.where(n_a > 0, q, -jnp.inf)).astype(jnp.int32)


def visit_probs(vt: S2Tree):
    """Edge-count-proportional root policy (`get_prob` analog)."""
    o = vt.base.nstat[:, vt.base.root][1].astype(jnp.int32)
    kids_obs = vt.edge_child[:, :, o]
    n_a = jnp.sum(jnp.where(kids_obs > 0, vt.edge_count[:, :, o], 0.0), 1)
    tot = jnp.sum(n_a)
    return jnp.where(tot > 0, n_a / jnp.maximum(tot, 1e-9), 1.0 / N_ACTIONS)


class S2MoveStats(NamedTuple):
    action: jax.Array       # int32[B]
    probs: jax.Array        # float32[B, 7]
    root_value: jax.Array   # float32[B]
    score: jax.Array        # int32[B]
    lines: jax.Array        # int32[B]
    done: jax.Array         # bool[B]
    reset: jax.Array        # bool[B]


def make_s2_move_fn(apply_fn, cfg, min_visits_store: int = 10,
                    store: bool = True):
    """Jitted per-move program for the ValueSim2 agent.

    apply_fn: (params, ubound, imgs NHWC) -> (v, var) — the VV net; the
    evaluator is single-leaf, value = leaf score + v (the reference's
    `evaluate_state` used only the value head, ValueSim2.py:39-43).
    Signature: (params, ubound, vtrees, envs, replay, key)
        -> (vtrees, envs, replay, S2MoveStats)."""
    tcfg = cfg.tree
    # three-phase expansion (see vp.make_vp_move_fn): vmapping T.expand
    # would vmap the `_insert_obs7` probe while_loop (CLAUDE.md rule 5)
    vexpand_ch = jax.vmap(T.expand_children, in_axes=(0, 0, None))
    vexpand_commit = jax.vmap(
        T.expand_commit, in_axes=(0, 0, 0, 0, 0, 0, None)
    )
    from tetris_mcts_tpu.ops import tree_walk as _tw

    insert_fn = _tw.insert_fn_for(tcfg)
    vheadroom = jax.vmap(T.headroom, in_axes=(0, None))
    vbest = jax.vmap(best_action)
    vprobs = jax.vmap(visit_probs)
    vadvance = jax.vmap(T.advance_root, in_axes=(0, 0, 0, None))
    vharvest = jax.vmap(T.harvest, in_axes=(0, None, None))
    vinit = jax.vmap(init_s2_tree, in_axes=(0, None))
    vsoft_reset = jax.vmap(engine.soft_reset, in_axes=(0, None))
    capacity_guard = capacity_guard_for(cfg.sims, tcfg, cfg.allow_clamp)

    def sim_once(params, ubound, vtrees, key):
        traces, actions, lengths = select_batched(vtrees, tcfg)
        leafs = bgather(traces, jnp.maximum(lengths - 1, 0))
        leaf_states = T.replay_leaf_batched(vtrees.base, actions, lengths,
                                            tcfg)
        leaf_end = bgather(vtrees.base.end, leafs)
        childless = bgather(vtrees.base.cbase, leafs) == 0
        can = (~leaf_end) & childless & vheadroom(vtrees.base, tcfg)

        imgs = jax.vmap(engine.get_state)(leaf_states)
        v, _ = apply_fn(params, ubound, imgs[..., None].astype(jnp.float32))

        child_states, packed7 = vexpand_ch(vtrees.base, leaf_states, tcfg)
        base, obs7 = insert_fn(
            vtrees.base, packed7, child_states.end, can, tcfg
        )
        base = vexpand_commit(
            base, child_states.score, child_states.end, obs7, leafs, can,
            tcfg,
        )
        vtrees = vtrees._replace(base=base)

        leaf_score = bgather_col(vtrees.base.nstat, leafs)[:, 0]
        value = jnp.where(can, leaf_score + v.reshape(-1), leaf_score)
        return backup_batched(vtrees, traces, actions, lengths, value, tcfg)

    def run_sims(params, ubound, vtrees, key):
        def body(_, carry):
            vtrees, key = carry
            key, sub = jax.random.split(key)
            return sim_once(params, ubound, vtrees, sub), key

        vtrees, _ = jax.lax.fori_loop(0, cfg.sims, body, (vtrees, key))
        return vtrees

    def move(params, ubound, vtrees: S2Tree, envs: EnvState, replay: Replay,
             key):
        key, k_sims = jax.random.split(key)
        vtrees = run_sims(params, ubound, vtrees, k_sims)

        action = vbest(vtrees)
        probs = vprobs(vtrees)
        root_obs = bgather_col(vtrees.base.nstat, vtrees.base.root)[:, 1]
        rv = bgather(vtrees.base.values, root_obs.astype(jnp.int32))

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
            packed, val, var, w, mask = vharvest(vtrees.base,
                                                 min_visits_store, tcfg)
            mask = mask & trigger[:, None]
            if store:
                replay = replay_add(replay, packed, val, var, w, mask)
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
        stats = S2MoveStats(
            action=action, probs=probs, root_value=rv,
            score=envs2.score, lines=envs2.lines, done=done, reset=trigger,
        )
        return vtrees, envs3, replay, stats

    return move


def init_s2_batch(seed: int, batch: int, cfg):
    envs = engine.reset_batch(seed, batch, cfg.tree.env)
    vtrees = jax.vmap(init_s2_tree, in_axes=(0, None))(envs, cfg.tree)
    return vtrees, envs
