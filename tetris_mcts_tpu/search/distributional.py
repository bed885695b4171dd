"""Distributional (C51) MCTS — the reference's `core_distributional.py` +
`DistValueSimOnline` agent, rebuilt working (the original is BROKEN: bad
import and syntax-invalid allocation, `agents/DistValueSimOnline.py:6,19`,
SURVEY.md Appendix A) and batched on the array tree.

Semantics (reference `agents/core_distributional.py`):
- each node carries a categorical value distribution over `atoms` bins
  spanning [0, vmax] with bin centers (b + 0.5)·Δ (`mean_dist`, `:40-45` —
  the reference ignores vmin in the centers, i.e. vmin = 0);
- **backup** (`backup_trace_distributional`, `:110-125`): the leaf NN
  distribution is shifted by the reward delta r − score(idx)
  (`shift_distribution`, `:13-36`: linear interpolation between the two
  target bins, clamped at the top), node dist = running mean of shifted
  dists, and scalar Welford stats track x = mean(dist) + delta for the
  selection policy (sample variance, ns[3] = M2/(n−1));
- **select** (`select_trace_distributional`, `:83-106`): unvisited-first
  (`check_low`), then CLT policy mean + norm_quantile(Σn)·sqrt(var) over the
  children; no γ discount in this legacy core.

Deviation (documented): distributions and stats live on obs slots
(transposition-shared) like every other agent here; the reference legacy
core predates its own projection layer. Distributions are stored (atoms, M)
pool-minor.

Every walk runs HAND-BATCHED in the driver (`select_batched`,
`T.replay_leaf_batched`, `backup_batched`; CLAUDE.md rule 5), golden-
tested bit-exact against its vmapped per-tree twin. Residual rule-6 cost:
the backup's running-mean distribution update is inherently a column
scatter into the carried (B, atoms, M) store — acceptable for the
capability-parity role this legacy agent plays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import EnvState
from tetris_mcts_tpu.search import tree as T
from tetris_mcts_tpu.search.mcts import capacity_guard_for
from tetris_mcts_tpu.search.quantiles import norm_quantile
from tetris_mcts_tpu.search.tree import N_ACTIONS, Tree, TreeConfig


class DistConfig(NamedTuple):
    atoms: int = 50
    vmax: float = 1000.0  # support [0, vmax], centers (b + 0.5) * vmax/atoms
    low: int = 5          # select_trace_distributional default (:83)


class DistTree(NamedTuple):
    base: Tree
    obs_dist: jax.Array  # float32[atoms, M]
    obs_m2: jax.Array    # float32[M] Welford M2 (ns[4])


def init_dist_tree(env_state: EnvState, cfg: TreeConfig,
                   dcfg: DistConfig) -> DistTree:
    base = T.init_tree(env_state, cfg)
    return DistTree(
        base=base,
        obs_dist=jnp.zeros((dcfg.atoms, cfg.max_obs), jnp.float32),
        obs_m2=jnp.zeros(cfg.max_obs, jnp.float32),
    )


def centers(dcfg: DistConfig):
    delta = dcfg.vmax / dcfg.atoms
    return (jnp.arange(dcfg.atoms, dtype=jnp.float32) + 0.5) * delta


def mean_dist(dist, dcfg: DistConfig):
    """E[dist] over bin centers (`mean_dist`, core_distributional.py:40-45).
    dist: (..., atoms)."""
    return jnp.sum(dist * centers(dcfg), axis=-1)


def shift_distribution_batched(dist, x, dcfg: DistConfig):
    """`shift_distribution` with a leading batch axis: dist (B, atoms),
    x (B,). Same op order per lane as the scalar form (golden-tested
    bit-exact via `backup_batched`)."""
    atoms = dcfg.atoms
    delta = dcfg.vmax / atoms
    bin_shift = x / delta
    fl = jnp.floor(bin_shift)
    fraction = (bin_shift - fl)[:, None]
    b = jnp.arange(atoms)[None, :]
    b_lb = jnp.clip((b + fl[:, None]).astype(jnp.int32), 0, atoms - 1)
    b_ub = jnp.clip(b_lb + 1, 0, atoms - 1)
    bidx = jnp.arange(dist.shape[0])[:, None]
    out = jnp.zeros_like(dist)
    out = out.at[bidx, b_lb].add(dist * (1.0 - fraction))
    out = out.at[bidx, b_ub].add(dist * fraction)
    return out


def shift_distribution(dist, x, dcfg: DistConfig):
    """`shift_distribution` (core_distributional.py:13-36): move probability
    mass up by x (in value units) with linear interpolation between the two
    enclosing bins, clamping at the top bin. dist: (atoms,); x scalar."""
    atoms = dcfg.atoms
    delta = dcfg.vmax / atoms
    bin_shift = x / delta
    fl = jnp.floor(bin_shift)
    fraction = bin_shift - fl

    b = jnp.arange(atoms)
    b_lb = jnp.clip((b + fl).astype(jnp.int32), 0, atoms - 1)
    b_ub = jnp.clip(b_lb + 1, 0, atoms - 1)
    out = jnp.zeros(atoms, jnp.float32)
    out = out.at[b_lb].add(dist * (1.0 - fraction))
    out = out.at[b_ub].add(dist * fraction)
    return out


def select(dt: DistTree, key, cfg: TreeConfig, dcfg: DistConfig):
    """`select_trace_distributional` (core_distributional.py:83-106) on the
    obs-projected tree. Returns (trace, actions, length)."""
    tree = dt.base
    D = cfg.max_depth
    trace0 = jnp.zeros(D, jnp.int32)
    act0 = jnp.zeros(D, jnp.int32)
    eps = jnp.float32(1e-3)

    def cond(c):
        _, _, _, depth, done, _ = c
        return (~done) & (depth < D)

    def body(c):
        trace, acts, idx, depth, done, key = c
        trace = trace.at[depth].set(idx)

        kids, sc, obs, kept = T._kids_stats(tree, idx)
        any_kid = jnp.any(kept)

        visits = jnp.where(kept, tree.visits[obs], 0.0)
        low_mask = kept & (visits < dcfg.low)
        any_low = jnp.any(low_mask)
        key, sub = jax.random.split(key)
        gumbel = jax.random.gumbel(sub, (N_ACTIONS,))
        low_choice = jnp.argmax(jnp.where(low_mask, gumbel, -jnp.inf))

        n_total = jnp.sum(visits)
        # reference policy_dist (core_distributional.py:67-80): Q = mean +
        # score delta; bonus = sqrt(ns[3]/(n+eps)) where ns[3] = M2/(n-1)
        # (backup :124-125) — a standard-error term, sigma/sqrt(n), so
        # selection concentrates as visits grow
        q = (
            tree.values[obs]
            + sc
            - tree.nstat[:, idx][0]
            + norm_quantile(n_total)
            * jnp.sqrt(jnp.maximum(
                dt.obs_m2[obs]
                / ((visits - 1.0 + eps) * (visits + eps)),
                0.0,
            ))
        )
        clt_choice = jnp.argmax(jnp.where(kept, q, -jnp.inf))

        choice = jnp.where(any_low, low_choice, clt_choice).astype(jnp.int32)
        acts = acts.at[depth].set(jnp.where(any_kid, choice, 0))
        nxt = jnp.where(any_kid, kids[choice], idx)
        return trace, acts, nxt, depth + 1, ~any_kid, key

    trace, acts, _, depth, _, _ = jax.lax.while_loop(
        cond, body,
        (trace0, act0, tree.root, jnp.int32(0), jnp.asarray(False), key),
    )
    return trace, acts, depth


def select_batched(dts: DistTree, keys, cfg: TreeConfig, dcfg: DistConfig):
    """Hand-batched `select` over B trees in ONE while_loop (CLAUDE.md rule
    5 — vmap's while batching re-selects every carried array per level).
    The per-level draws are the vmapped primitives, so draw streams and
    trajectories are BIT-IDENTICAL to vmapping `select` (golden-tested).

    dts: batched DistTree; keys (B, 2) uint32. Returns
    (traces (B, D) i32, actions (B, D) i32, lengths (B,) i32)."""
    tree = dts.base
    B = tree.root.shape[0]
    D = cfg.max_depth
    bidx = jnp.arange(B)
    eps = jnp.float32(1e-3)
    a7 = jnp.arange(N_ACTIONS)
    vsplit = jax.vmap(jax.random.split)
    vgumbel = jax.vmap(lambda k: jax.random.gumbel(k, (N_ACTIONS,)))

    def cond(c):
        _, _, _, depth, done, _, _ = c
        return (depth < D) & ~jnp.all(done)

    def body(c):
        trace, acts, idx, depth, done, keys, lengths = c
        live = ~done
        col = jnp.where(live, depth, D)          # dead lanes write nowhere
        trace = trace.at[bidx, col].set(idx, mode="drop")

        # unique-by-obs child set (tree._kids_stats, batched inline — the
        # same form tree.select_batched golden-tests against the vmapped
        # per-tree walk)
        c_ = tree.cbase[bidx, idx]
        valid = (c_ != 0)[:, None]
        kids = jnp.where(valid, c_[:, None] + a7[None, :], 0)
        ns = jnp.take_along_axis(tree.nstat, kids[:, None, :], axis=2)
        sc = ns[:, 0, :]
        obs = jnp.where(valid, ns[:, 1, :].astype(jnp.int32), -1)
        same = obs[:, :, None] == obs[:, None, :]
        beats = (sc[:, :, None] > sc[:, None, :]) | (
            (sc[:, :, None] == sc[:, None, :])
            & (a7[None, :, None] <= a7[None, None, :])
        )
        kept = valid & jnp.all(~same | beats, axis=2)
        any_kid = jnp.any(kept, axis=1)

        visits = jnp.where(
            kept, jnp.take_along_axis(tree.visits, obs, 1), 0.0
        )
        low_mask = kept & (visits < dcfg.low)
        any_low = jnp.any(low_mask, axis=1)
        ks = vsplit(keys)
        keys, sub = ks[:, 0], ks[:, 1]
        gumbel = vgumbel(sub)
        low_choice = jnp.argmax(
            jnp.where(low_mask, gumbel, -jnp.inf), axis=1
        )

        n_total = jnp.sum(visits, axis=1, keepdims=True)
        s_idx = tree.nstat[bidx, 0, idx][:, None]
        q = (
            jnp.take_along_axis(tree.values, obs, 1)
            + sc
            - s_idx
            + norm_quantile(n_total)
            * jnp.sqrt(jnp.maximum(
                jnp.take_along_axis(dts.obs_m2, obs, 1)
                / ((visits - 1.0 + eps) * (visits + eps)),
                0.0,
            ))
        )
        clt_choice = jnp.argmax(jnp.where(kept, q, -jnp.inf), axis=1)
        choice = jnp.where(any_low, low_choice, clt_choice).astype(jnp.int32)

        acts = acts.at[bidx, col].set(
            jnp.where(any_kid, choice, 0), mode="drop"
        )
        kc = jnp.take_along_axis(kids, choice[:, None], 1)[:, 0]
        idx = jnp.where(live & any_kid, kc, idx)
        newly_done = live & ~any_kid
        lengths = jnp.where(newly_done, depth + 1, lengths)
        return trace, acts, idx, depth + 1, done | newly_done, keys, lengths

    trace, acts, _, _, _, _, lengths = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((B, D), jnp.int32), jnp.zeros((B, D), jnp.int32),
         tree.root, jnp.int32(0), jnp.zeros(B, bool), keys,
         jnp.full(B, D, jnp.int32)),
    )
    return trace, acts, lengths


def backup(dt: DistTree, trace, length, r, dist, cfg: TreeConfig,
           dcfg: DistConfig):
    """`backup_trace_distributional` (core_distributional.py:110-125): walk
    the trace; per node: shift the leaf distribution by r − score(idx), fold
    it into the node's running-mean distribution, and Welford-update the
    scalar stats with x = mean(dist) + delta."""
    tree = dt.base
    mean0 = mean_dist(dist, dcfg)

    def cond(c):
        t, *_ = c
        return t >= 0

    def body(c):
        t, visit, val, m2, dists = c
        idx = trace[t]
        ns = tree.nstat[:, idx]
        o = ns[1].astype(jnp.int32)
        delta_r = jnp.float32(r) - ns[0]
        new_dist = shift_distribution(dist, delta_r, dcfg)

        n = visit[o]
        dists = dists.at[:, o].set((dists[:, o] * n + new_dist) / (n + 1.0))

        x = mean0 + delta_r
        delta = x - val[o]
        val_new = val[o] + delta / (n + 1.0)
        delta2 = x - val_new
        m2 = m2.at[o].add(delta * delta2)
        visit = visit.at[o].set(n + 1.0)
        val = val.at[o].set(val_new)
        return t - 1, visit, val, m2, dists

    _, visit, val, m2, dists = jax.lax.while_loop(
        cond, body,
        (length - 1, tree.visits, tree.values, dt.obs_m2, dt.obs_dist),
    )
    # ns[3] (sample variance) is derived on demand as m2 / (n - 1)
    return dt._replace(
        base=tree._replace(visits=visit, values=val),
        obs_m2=m2, obs_dist=dists,
    )


def backup_batched(dts: DistTree, traces, lengths, r, dist,
                   cfg: TreeConfig, dcfg: DistConfig):
    """Hand-batched `backup` over B trees in ONE while_loop (CLAUDE.md rule
    5; same index-redirection pattern as `tree.backup_batched`) — iteration
    k processes level length_b-1-k of every lane, so per-lane arithmetic is
    identical to the vmapped per-tree walk (golden-tested bit-exact).

    The running-mean distribution update remains a column scatter into the
    carried (B, atoms, M) store (rule 6's slow class — inherent to this
    legacy agent's data model), but the carried arrays are no longer
    re-selected per level by vmap's while batching.

    traces (B, D), lengths (B,), r (B,), dist (B, atoms)."""
    base = dts.base
    B, M = base.visits.shape
    bidx = jnp.arange(B)
    score_row = base.nstat[:, 0, :]
    obs_row = base.nstat[:, 1, :].astype(jnp.int32)
    mean0 = mean_dist(dist, dcfg)                       # (B,)
    r = jnp.asarray(r, jnp.float32)
    kmax = jnp.max(lengths)

    def cond(c):
        k, *_ = c
        return k < kmax

    def body(c):
        k, visit, val, m2, dists = c
        t = lengths - 1 - k
        live = t >= 0
        tt = jnp.maximum(t, 0)
        idx = traces[bidx, tt]
        s_idx = score_row[bidx, idx]
        o = jnp.where(live, obs_row[bidx, idx], M)      # dead lanes drop
        oc = jnp.minimum(o, M - 1)

        delta_r = r - s_idx
        new_dist = shift_distribution_batched(dist, delta_r, dcfg)

        n = visit[bidx, oc]
        cur = dists[bidx, :, oc]                        # (B, atoms)
        merged = (cur * n[:, None] + new_dist) / (n[:, None] + 1.0)
        dists = dists.at[bidx, :, o].set(merged, mode="drop")

        x = mean0 + delta_r
        valo = val[bidx, oc]
        delta = x - valo
        val_new = valo + delta / (n + 1.0)
        delta2 = x - val_new
        m2 = m2.at[bidx, o].add(delta * delta2, mode="drop")
        visit = visit.at[bidx, o].set(n + 1.0, mode="drop")
        val = val.at[bidx, o].set(val_new, mode="drop")
        return k + 1, visit, val, m2, dists

    _, visit, val, m2, dists = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), base.visits, base.values, dts.obs_m2, dts.obs_dist),
    )
    return dts._replace(
        base=base._replace(visits=visit, values=val),
        obs_m2=m2, obs_dist=dists,
    )


# ---------------------------------------------------------------------------
# replay / move
# ---------------------------------------------------------------------------

class DistReplay(NamedTuple):
    """Training memory: (packed board, target distribution, visit weight)."""

    boards: jax.Array  # uint32[R, 20]
    dist: jax.Array    # float32[R, atoms]
    weight: jax.Array  # float32[R]
    idx: jax.Array
    count: jax.Array
    total: jax.Array   # monotone rows-ever-written (see mcts.Replay)


def init_dist_replay(capacity: int, atoms: int) -> DistReplay:
    return DistReplay(
        boards=jnp.zeros((capacity, 20), jnp.uint32),
        dist=jnp.zeros((capacity, atoms), jnp.float32),
        weight=jnp.zeros(capacity, jnp.float32),
        idx=jnp.int32(0),
        count=jnp.int32(0),
        total=jnp.int32(0),
    )


def dist_replay_add(rep: DistReplay, packed, dist, weight, mask) -> DistReplay:
    R = rep.boards.shape[0]
    atoms = rep.dist.shape[1]
    packed = packed.reshape(-1, 20)
    dist = dist.reshape(-1, atoms)
    weight = weight.reshape(-1)
    mask = mask.reshape(-1)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    n = jnp.sum(mask.astype(jnp.int32))
    # latest-wins past capacity (see mcts.replay_add): duplicate mod-R
    # scatter indices have an unspecified winner
    keep = mask & (pos >= n - R)
    dst = (rep.idx + pos) % R
    dst = jnp.where(keep, dst, R)
    return DistReplay(
        boards=rep.boards.at[dst].set(packed, mode="drop"),
        dist=rep.dist.at[dst].set(dist, mode="drop"),
        weight=rep.weight.at[dst].set(weight, mode="drop"),
        idx=(rep.idx + n) % R,
        count=jnp.minimum(rep.count + n, R),
        total=rep.total + n,
    )


def harvest(dt: DistTree, min_visits: int, cfg: TreeConfig):
    """(packed, target distribution, weight, mask) per obs slot."""
    tree = dt.base
    M = cfg.max_obs
    slots = jnp.arange(M)
    visit = tree.visits
    mask = (
        (slots >= 1)
        & (slots < tree.n_obs)
        & (visit >= min_visits)
        & (~tree.obs_end)
    )
    return (tree.obs_bits.T, dt.obs_dist.T, visit, mask)


class DistMoveStats(NamedTuple):
    action: jax.Array
    probs: jax.Array
    root_value: jax.Array
    score: jax.Array
    lines: jax.Array
    done: jax.Array
    reset: jax.Array


def make_dist_move_fn(apply_fn, cfg, dcfg: DistConfig,
                      min_visits_store: int = 10, store: bool = True):
    """apply_fn: (params, imgs NHWC) -> (B, atoms) probability simplex.
    Signature: (params, dtrees, envs, replay, key) -> (... , DistMoveStats)."""
    tcfg = cfg.tree
    from tetris_mcts_tpu.search.mcts import bgather, bgather_col

    # three-phase expansion (see vp.make_vp_move_fn): vmapping T.expand
    # would vmap the `_insert_obs7` probe while_loop (CLAUDE.md rule 5)
    vexpand_ch = jax.vmap(T.expand_children, in_axes=(0, 0, None))
    vexpand_commit = jax.vmap(
        T.expand_commit, in_axes=(0, 0, 0, 0, 0, 0, None)
    )
    from tetris_mcts_tpu.ops import tree_walk as _tw

    insert_fn = _tw.insert_fn_for(tcfg)
    vheadroom = jax.vmap(T.headroom, in_axes=(0, None))
    vstats = jax.vmap(T.compute_stats, in_axes=(0, None))
    vbest = jax.vmap(T.best_action, in_axes=(0, None))
    vprobs = jax.vmap(T.visit_probs, in_axes=(0, None))
    vadvance = jax.vmap(T.advance_root, in_axes=(0, 0, 0, None))
    vharvest = jax.vmap(harvest, in_axes=(0, None, None))
    vinit = jax.vmap(lambda e, c: init_dist_tree(e, c, dcfg), in_axes=(0, None))
    vsoft_reset = jax.vmap(engine.soft_reset, in_axes=(0, None))

    def sim_once(params, dtrees, key):
        B = dtrees.base.root.shape[0]
        key, k_sel = jax.random.split(key)
        # hand-batched walks (CLAUDE.md rule 5) — bit-identical to the
        # vmapped per-tree forms they are golden-tested against
        traces, actions, lengths = select_batched(
            dtrees, jax.random.split(k_sel, B), tcfg, dcfg
        )
        leafs = bgather(traces, jnp.maximum(lengths - 1, 0))
        leaf_states = T.replay_leaf_batched(
            dtrees.base, actions, lengths, tcfg
        )

        leaf_end = bgather(dtrees.base.end, leafs)
        childless = bgather(dtrees.base.cbase, leafs) == 0
        can = (~leaf_end) & childless & vheadroom(dtrees.base, tcfg)

        imgs = jax.vmap(engine.get_state)(leaf_states)
        dist = apply_fn(params, imgs[..., None].astype(jnp.float32))  # (B, atoms)
        # terminal leaves back up a point mass at 0 (value = score only)
        point0 = jnp.zeros_like(dist).at[:, 0].set(1.0)
        dist = jnp.where(can[:, None], dist, point0)

        child_states, packed7 = vexpand_ch(dtrees.base, leaf_states, tcfg)
        base, obs7 = insert_fn(
            dtrees.base, packed7, child_states.end, can, tcfg
        )
        base = vexpand_commit(
            base, child_states.score, child_states.end, obs7, leafs, can,
            tcfg,
        )
        dtrees = dtrees._replace(base=base)

        r = bgather_col(dtrees.base.nstat, leafs)[:, 0]  # absolute value = leaf score
        dtrees = backup_batched(dtrees, traces, lengths, r, dist, tcfg,
                                dcfg)
        return dtrees, key

    def run_sims(params, dtrees, key):
        def body(_, carry):
            dtrees, key = carry
            return sim_once(params, dtrees, key)

        dtrees, _ = jax.lax.fori_loop(0, cfg.sims, body, (dtrees, key))
        return dtrees

    capacity_guard = capacity_guard_for(cfg.sims, tcfg, cfg.allow_clamp)

    def move(params, dtrees: DistTree, envs: EnvState, replay: DistReplay, key):
        key, k_sims = jax.random.split(key)
        dtrees = run_sims(params, dtrees, k_sims)

        action = vbest(dtrees.base, tcfg)
        probs = vprobs(dtrees.base, tcfg)
        root_obs = bgather_col(dtrees.base.nstat, dtrees.base.root)[:, 1].astype(jnp.int32)
        rv = bgather(dtrees.base.values, root_obs)

        envs2 = engine.step_batch(envs, action, tcfg.env)
        base2 = vadvance(dtrees.base, action, envs2, tcfg)
        dtrees = dtrees._replace(base=base2)

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
            dtrees, envs3, replay = args
            packed, dists, w, mask = vharvest(dtrees, min_visits_store, tcfg)
            mask = mask & trigger[:, None]
            if store:
                replay = dist_replay_add(replay, packed, dists, w, mask)
            fresh = vinit(envs3, tcfg)
            dtrees2 = jax.tree.map(
                lambda f, t: jnp.where(
                    trigger.reshape((-1,) + (1,) * (f.ndim - 1)), f, t
                ),
                fresh, dtrees,
            )
            return dtrees2, replay

        def no_harvest(args):
            dtrees, _, replay = args
            return dtrees, replay

        dtrees, replay = jax.lax.cond(
            jnp.any(trigger), harvest_and_reset, no_harvest,
            (dtrees, envs3, replay),
        )

        stats = DistMoveStats(
            action=action, probs=probs, root_value=rv,
            score=envs2.score, lines=envs2.lines, done=done, reset=trigger,
        )
        return dtrees, envs3, replay, stats

    return move


def init_dist_batch(seed: int, batch: int, cfg, dcfg: DistConfig):
    envs = engine.reset_batch(seed, batch, cfg.tree.env)
    dtrees = jax.vmap(
        lambda e: init_dist_tree(e, cfg.tree, dcfg)
    )(envs)
    return dtrees, envs
