"""Pallas TPU kernels for the sequential MCTS tree walks.

The select/backup walks are pointer-chasing: ~10 dependent gather/scatter
ops per tree level. Expressed as XLA ops inside a `while_loop`, every op
pays kernel-sequencing latency — measured ~80 us per level at B=256
(scripts/microbench_scatter.py), which capped the whole search at ~65k
sims/s regardless of batch size. Inside ONE Pallas kernel the tree arrays
are VMEM-resident and a per-lane dynamic index becomes an iota-mask plus a
masked reduction (gather) or masked select (scatter) — pure VPU work with
no per-op dispatch: the same 16-level walk measures 15 us
(scripts/microbench_pallas_walk.py), an ~85x speedup.

Layout: batch on the SUBLANE axis — all arrays arrive exactly as the
batched XLA tree stores them ((B, M) stats, (B, D) traces), so there are
no transposes at the kernel boundary. Grid over B-blocks keeps VMEM use
bounded; stat updates write fresh outputs (aliasing is a TPU correctness
hazard — see KNOWN ISSUE).

Semantics: bit-exact twin of `tree.backup_batched` (itself a bit-exact
hand-batching of the reference `backup_trace_obs` transcription,
`agents/cppmodule/core.h:226-260`) — golden-tested against it. A gather
expressed as sum(where(onehot, x, 0)) is exact: exactly one summand is
non-zero.

CPU fallback: `interpret=True` runs the kernel in the Pallas interpreter,
used automatically off-TPU so the full test suite and the multichip dryrun
exercise the same code path.

KNOWN ISSUE — ROUND-4 REDIAGNOSIS: the round-2/3 "select-kernel
miscompile" was NOT the select kernel. The real fault was
`input_output_aliases` on the STAT-UPDATING kernels (backup / lp-backup):
composed into the fused sims fori_loop, XLA:TPU can assign the three
aliased (B, M) in/out pairs overlapping buffers — a dumped state showed
literally visits == values == vars_ — after which every visit count is a
small float, the low-visit gumbel branch goes live on every level, and the
kernel-vs-XLA arms diverge through their (legitimately different) tie-break
random streams. Because the backup kernels ran in BOTH arms of every
comparison, three rounds of bisection mis-attributed this to select. The
round-4 localization chain (runs/r4probe/): per-sim three-way compare
(compiled select == interpreted select == plain-jnp transcription, M_*
fields all zero — Mosaic codegen is exact), state autopsy (the corrupt
stat triple), then TMT_NO_ALIAS=1 flipping the B=64 full-program compare
from BAD (207 vs 987 stored rows, deterministic) to OK.

FIX: aliases are now OFF on TPU by default (`_use_aliases`); the kernels
copy the stat inputs into fresh outputs instead (3 (B, M) f32 copies per
call — HBM noise next to the walk; headline bench unchanged within
spread). Interpret mode (CPU tests) keeps aliases on so that path stays
covered; TMT_ALIAS=1 / TMT_NO_ALIAS=1 override for experiments.

SECOND BUG (the round-3 "large pools/depth" mode, also fixed): Mosaic's
argmax breaks EXACT ties on a different index than XLA's lowest-index
rule. Exact q ties are common at depth — ended children seed value 0 —
and the first hit was a 4-way q=0 tie in an all-terminal subtree
(state autopsy state_m0_s93.pkl — local 121 MB artifact, not committed;
the probe logs in runs/r4probe/ are): root stats then drift while actions
still agree. The kernel now picks the first max explicitly via order-free
max+min reductions. Post-fix the full matrix (B=32..256 at 2048:64,
B=256 at 3584:96/500 sims, B=64 at 8192:96/1000 sims) compares bit-exact
in-composition (probes4 + probes5 logs).

Design note — why the obs-table insert is NOT fused into the selection
kernel (considered and rejected without burning chip time): the insert's
(BG, T) table triple must be VMEM-resident, and Mosaic's scoped stack peaks
at ~7x the resident bytes (measured, `insert7_walk`), which caps the insert
at bg≈32 lanes for T=4096. The selection walk runs at bg=128; one fused
kernel would drag the walk down to the insert's block size — ~4x the grid
steps, and the walk phase dominates the move program. What fusion would
save (one kernel launch, the (B, 140) packed7 HBM round trip, the XLA-side
hash) is tens of microseconds per sim; what it risks is the core of the
127.2k sims/s number. The two kernels compose better than they fuse.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tetris_mcts_tpu.ops import env_packed
# the quantile approximations are pure jnp vector math, kernel-safe as-is —
# one source of truth in search/quantiles.py
from tetris_mcts_tpu.search.quantiles import (
    norm_quantile as _norm_quantile,
    std_quantile2 as _std_quantile2,
)


def _tree_probe_double() -> bool:
    """Shared probe-mode flag (one source of truth in search/tree.py)."""
    from tetris_mcts_tpu.search import tree as _tree
    return _tree._PROBE_DOUBLE

# Max rows (trees) per grid step: bounds VMEM use at
# BG * (3 stats * M + score/obs * N + trace D) * 4 bytes.
# BG=256 with M=N=2048 ~= 10 MB of the ~16 MB/core VMEM.
_BG = 256


def _fit_block(start: int, lane_bytes: int, budget: int) -> int:
    """Largest power-of-2 block <= start whose resident input bytes fit
    `budget`. Mosaic's scoped stack peaks at a multiple of the resident
    block bytes (measured ~2.2x for the backup walks: an 11.0 MB resident
    lp block compiles to a 24.5 MB stack and trips the 16 MB scoped-VMEM
    limit), so each kernel caps bg by its OWN largest known-good resident
    size rather than a modeled stack."""
    bg = start
    while bg > 8 and bg * lane_bytes > budget:
        bg //= 2
    return bg


def _reverse_welford_walk(gamma, trace_ref, lengths, score_ref, lookup_obs,
                          v0, var0, visit_out, value_out, var_out,
                          diota, niota, miota):
    """The reverse Welford+γ backup walk shared by `_backup_kernel` and
    `_lp_backup_kernel` — one source so a semantic fix can never reach one
    and miss the other. `lookup_obs(nmask, live)` returns the (BG, 1) obs
    index for the level (dead lanes may return anything in the plain form —
    mmask is live-gated); `v0`/`var0` are (BG, 1) values."""
    kmax = jnp.max(lengths)

    def body(k, v):
        t = lengths - 1 - k                      # (BG, 1) per-lane level
        live = t >= 0
        tt = jnp.maximum(t, 0)
        idx = jnp.sum(
            jnp.where(diota == tt, trace_ref[:], 0), 1, keepdims=True
        )
        nmask = niota == idx
        s = jnp.sum(jnp.where(nmask, score_ref[:], 0.0), 1, keepdims=True)
        o = lookup_obs(nmask, live)
        mmask = (miota == o) & live

        vi = jnp.sum(jnp.where(mmask, visit_out[:], 0.0), 1, keepdims=True)
        va = jnp.sum(jnp.where(mmask, value_out[:], 0.0), 1, keepdims=True)
        vr = jnp.sum(jnp.where(mmask, var_out[:], 0.0), 1, keepdims=True)

        v_rel = v - s
        first = vi == 0.0
        delta = v_rel - va
        val_new = jnp.where(first, v_rel, va + delta / (vi + 1.0))
        delta2 = v_rel - val_new
        var_new = jnp.where(
            first, var0, vr + (delta * delta2 - vr) / (vi + 1.0)
        )

        visit_out[:] = jnp.where(mmask, vi + 1.0, visit_out[:])
        value_out[:] = jnp.where(mmask, val_new, value_out[:])
        var_out[:] = jnp.where(mmask, var_new, var_out[:])
        return jnp.where(live, gamma * v_rel + s, v)

    lax.fori_loop(0, kmax, body, v0, unroll=False)


def _backup_kernel(gamma, D, N, M, aliased,
                   trace_ref, len_ref, v0_ref, var0_ref,
                   score_ref, obs_ref,
                   visit_ref, value_ref, var_ref,
                   visit_out, value_out, var_out):
    """One grid step: BG trees, each walking its own trace in reverse.

    Shapes (BG = rows of this block):
      trace (BG, D) i32, len/v0/var0 (BG, 1), score (BG, N) f32,
      obs (BG, N) i32, stats (BG, M) f32 (aliased in/out).
    """
    if aliased:
        del visit_ref, value_ref, var_ref  # *_out hold the input values
    else:
        # TMT_NO_ALIAS probe mode: fresh outputs, copy the inputs first
        visit_out[:] = visit_ref[:]
        value_out[:] = value_ref[:]
        var_out[:] = var_ref[:]
    BG = trace_ref.shape[0]
    diota = lax.broadcasted_iota(jnp.int32, (BG, D), 1)
    niota = lax.broadcasted_iota(jnp.int32, (BG, N), 1)
    miota = lax.broadcasted_iota(jnp.int32, (BG, M), 1)

    def lookup_obs(nmask, live):
        return jnp.sum(jnp.where(nmask, obs_ref[:], 0), 1, keepdims=True)

    _reverse_welford_walk(
        gamma, trace_ref, len_ref[:], score_ref, lookup_obs,
        v0_ref[:], var0_ref[:], visit_out, value_out, var_out,
        diota, niota, miota,
    )


@functools.partial(
    jax.jit, static_argnames=("gamma", "interpret")
)
def backup_walk(traces, lengths, v0, var0, score, obs, visits, values, vars_,
                *, gamma: float, interpret: bool = False):
    """Run the reverse Welford+γ backup walk for B trees in one kernel.

    traces (B, D) i32; lengths/v0/var0 (B,); score (B, N) f32;
    obs (B, N) i32; visits/values/vars_ (B, M) f32.
    Returns updated (visits, values, vars_)."""
    B, D = traces.shape
    N = score.shape[1]
    M = visits.shape[1]
    # Resident per lane: 2 N-arrays (score, obs) + 3 M stat arrays. Budget =
    # the largest measured-good resident size (bg=256 at M=N=2048, bench);
    # beyond that pool size halve once more — Mosaic's scoped stack is
    # superlinear in M (measured on the sibling lp kernel, see below).
    bg = min(B, _fit_block(_BG, 4 * (2 * N + 3 * M), budget=10_600_000))
    if M > 2048 and bg > 8:
        bg //= 2
    while B % bg:  # any B is accepted (bg=1 divides)
        bg //= 2

    row = lambda w: pl.BlockSpec((bg, w), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    aliased = _use_aliases()
    kernel = functools.partial(_backup_kernel, float(gamma), D, N, M,
                               aliased)
    out = pl.pallas_call(
        kernel,
        grid=(B // bg,),
        in_specs=[row(D), row(1), row(1), row(1), row(N), row(N),
                  row(M), row(M), row(M)],
        out_specs=[row(M), row(M), row(M)],
        out_shape=[jax.ShapeDtypeStruct((B, M), jnp.float32)] * 3,
        input_output_aliases={6: 0, 7: 1, 8: 2} if aliased else {},
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_PARAMS,
    )(traces, lengths.reshape(B, 1), v0.reshape(B, 1).astype(jnp.float32),
      var0.reshape(B, 1).astype(jnp.float32), score, obs,
      visits, values, vars_)
    return out


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


# Raise Mosaic's scoped-VMEM ceiling from the 16 MB default: the walk
# kernels' compiler-managed stack is LAYOUT-DEPENDENT — the same select
# kernel at the same block compiles to a 15.9 MB stack in one program and
# 16.11 MB in another (the online driver's composition, where operands
# arrive through copies with different layouts) — so a fixed 16 MB limit
# makes compilation success composition-dependent. v5e has 128 MB of
# physical VMEM; 64 MB leaves the block-resident buffers (~10 MB budgeted)
# plus double-buffering ample room. Interpret mode takes no params.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _use_aliases() -> bool:
    """Whether the stat-updating kernels declare input_output_aliases.

    DEFAULT OFF ON TPU (round 4): aliasing the carried (B, M) stat triple
    through the pallas custom call MISCOMPILES in composition — inside the
    fused sims fori_loop XLA:TPU can assign the three aliased pairs
    overlapping buffers, after which visits == values == vars_ (observed
    literally) and every low-visit guard misfires. The round-2/3 "select
    kernel miscompile" at small batch was exactly this: the backup kernels
    run in BOTH arms of every select-kernel-vs-XLA comparison, so the
    corruption looked like a select divergence (round-4 bisection:
    kernel-on vs XLA identical at B=64 with aliasing off, probes3.log).
    The copies this costs are 3 (B, M) f32 reads — microseconds of HBM
    traffic per sim, noise next to the walk (measured: headline bench
    unchanged within run-to-run spread). TMT_ALIAS=1 re-enables for
    experiments; interpret mode (CPU tests) keeps aliases exercised so the
    aliased code path stays covered off-TPU."""
    if os.environ.get("TMT_ALIAS") == "1":
        return True
    if os.environ.get("TMT_NO_ALIAS") == "1":
        return False
    return not on_tpu()


# ---------------------------------------------------------------------------
# multi-device: shard_map over the data axis
# ---------------------------------------------------------------------------
#
# A pallas_call is a custom call that GSPMD sharding propagation cannot
# partition, so under a multi-device mesh the kernels must be entered
# through shard_map: every operand/result is batch-leading, each device
# runs the kernel on its local rows, and no collective is needed. All the
# randomness a kernel consumes (the select walk's gumbels) is drawn OUTSIDE
# at global batch shape, so the sharded program computes bit-identical
# trajectories to the single-device one (golden-tested on the CPU mesh).

_KERNEL_MESH = None


def set_kernel_mesh(mesh) -> None:
    """Register the mesh whose "data" axis the walk kernels shard over
    (None clears it). Multi-device drivers call this so `use_walk_kernels`
    can keep the kernel path on instead of falling back to the XLA walks.

    Process-global: it applies to every move program traced while set, so a
    process mixing a mesh driver with single-device programs must clear it
    between them (`DistributedSelfPlay.close`). With a 2D data×model mesh
    the kernels shard over data only — each model-axis device runs the same
    shard redundantly (correct and wall-clock-neutral; the model axis
    exists for the TP demo, not for the walks)."""
    global _KERNEL_MESH
    _KERNEL_MESH = mesh


def _data_sharded(fn, *arrays, **static):
    """Call `fn(*arrays, **static)` — through shard_map over the registered
    mesh's data axis when one is registered (every array is batch-leading
    and stays batch-sharded), directly otherwise."""
    mesh = _KERNEL_MESH
    if mesh is None:
        return fn(*arrays, **static)
    from jax.sharding import PartitionSpec
    from tetris_mcts_tpu.parallel.mesh import DATA_AXIS

    spec = PartitionSpec(DATA_AXIS)
    n = mesh.shape[DATA_AXIS]
    for a in arrays:
        assert a.shape[0] % n == 0, (a.shape, n)
    return jax.shard_map(
        functools.partial(fn, **static), mesh=mesh,
        in_specs=spec, out_specs=spec, check_vma=False,
    )(*arrays)


def use_walk_kernels() -> bool:
    """The walk kernels run in single-device TPU programs, and in
    multi-device ones when the driver registered a mesh via
    `set_kernel_mesh` (the kernels then enter through shard_map — a
    pallas_call is a custom call GSPMD cannot partition on its own)."""
    if not on_tpu():
        return False
    return jax.device_count() == 1 or _KERNEL_MESH is not None


_SELECT_GUARD_WARNED = set()

# The region where the full kernel path is verified bit-exact
# IN-COMPOSITION on the real chip after the round-4 fixes (aliasing off +
# first-index argmax; scripts/bisect_select_miscompile.py,
# runs/r4probe/probes4.log + probes5_8192.log): B=32..256 at 2048:64
# (64-250 sims), B=256 at 3584:96 (500 sims, the campaign config) and
# B=64 at 8192:96 (1000 sims, the benchmark twin) all compare exact
# against the XLA walk over full multi-move programs. The round-3
# "failure modes" are both diagnosed and fixed (see KNOWN ISSUE above);
# the guard now only excludes pool/depth shapes beyond the verified
# envelope. TMT_FORCE_SELECT_KERNEL=1 overrides (bisect harness).
_SELECT_OK_NODES = 8192
_SELECT_OK_DEPTH = 96


def select_kernel_config_ok(tcfg, batch: int) -> bool:
    """False when (pools, depth) fall outside the region the select kernel
    is verified correct at in-composition on real TPU (see the note
    above). Always True off-TPU: the interpreter path has no miscompile."""
    if not on_tpu():
        return True
    if os.environ.get("TMT_FORCE_SELECT_KERNEL") == "1":
        return True
    # batch >= 32: the round-4 bit-exact verification matrix covers
    # B=32..256 only; sub-32 batches stay on the XLA walk until probed
    # (the old small-batch failure region, even though its root cause was
    # the aliasing).
    ok = (batch >= 32
          and tcfg.max_nodes <= _SELECT_OK_NODES
          and tcfg.max_obs <= _SELECT_OK_NODES
          and tcfg.max_depth <= _SELECT_OK_DEPTH)
    key = (batch, tcfg.max_nodes, tcfg.max_obs, tcfg.max_depth)
    if not ok and key not in _SELECT_GUARD_WARNED:
        _SELECT_GUARD_WARNED.add(key)
        import sys
        print(
            f"select-kernel guard: batch {batch} / pools {tcfg.max_nodes}"
            f"/{tcfg.max_obs} / depth {tcfg.max_depth} fall outside the "
            f"region (batch >= 32, pools <= {_SELECT_OK_NODES}, depth <= "
            f"{_SELECT_OK_DEPTH}) where the fused selection kernel is "
            "verified correct in-composition on real TPU (ops/tree_walk.py "
            "KNOWN ISSUE); using the XLA select walk. "
            "TMT_FORCE_SELECT_KERNEL=1 overrides.",
            file=sys.stderr, flush=True,
        )
    return ok


def select_kernel_shape_ok(tcfg) -> bool:  # pragma: no cover - legacy shim
    """Round-2 pool-shape-only guard, kept for external callers; the full
    verified region also has a batch dimension (select_kernel_config_ok)."""
    return (tcfg.max_nodes <= _SELECT_OK_NODES
            and tcfg.max_obs <= _SELECT_OK_NODES
            and tcfg.max_depth <= _SELECT_OK_DEPTH) or not on_tpu()


def insert_fn_for(tcfg):
    """The obs-table insert implementation for this config: the Pallas
    probe-loop kernel when opted in (`TreeConfig.insert_kernel`) and the
    kernel path is live, else the hand-batched XLA probe loop. The single
    source of the gating — every move-fn factory (mcts/vp/stochastic/
    distributional) selects its insert through this."""
    from tetris_mcts_tpu.search import tree as T_

    if use_walk_kernels() and tcfg.projection and tcfg.insert_kernel:
        return insert_obs7_batched_pallas
    return T_.insert_obs7_batched


def backup_batched_pallas(trees, traces, lengths, v0, var0, cfg):
    """Drop-in for `tree.backup_batched` running the walk as one Pallas
    kernel (interpreted off-TPU so every platform takes the same path)."""
    visits, values, vars_ = _data_sharded(
        backup_walk,
        traces, lengths, v0, var0,
        trees.nstat[:, 0, :], trees.nstat[:, 1, :].astype(jnp.int32),
        trees.visits, trees.values, trees.vars_,
        gamma=cfg.gamma, interpret=not on_tpu(),
    )
    return trees._replace(visits=visits, values=values, vars_=vars_)


# ---------------------------------------------------------------------------
# selection kernel
# ---------------------------------------------------------------------------

def _select_kernel(policy, low, app, scoring, randomizer, D, N, M,
                   cbase_ref, score_ref, obs_ref,
                   visit_ref, value_ref, var_ref,
                   root_ref, rootsc_ref, env0_ref, gum_ref, rnd_ref,
                   trace_out, len_out, leaf_out, env_out,
                   chpk_out, chsc_out, chend_out,
                   idx_ref, sc_ref, done_ref):
    """One grid step: BG trees descending in lockstep, each lane CARRYING
    its env state and stepping it inline per descend (`env_packed.packed_step`
    — the same inline-replay design as the XLA walk `tree.select_batched`,
    so there is no per-node state store and no separate leaf replay). After
    the walk, the SAME kernel steps the leaf's 7 children and emits their
    packed observations / scores / end flags — the whole expansion front
    half (`tree.expand_children`: 7 vmapped engine.steps + pack_obs per
    tree) collapses into ~7 in-kernel packed_steps on VMEM-resident state.

    Shapes: cbase (BG, N) i32; score (BG, N) f32; obs (BG, N) i32;
    stats (BG, M) f32; root (BG, 1) i32; rootsc (BG, 1) f32; env0 (BG, 44)
    u32 packed root states (`engine.pack_state`); gum/rnd (BG, D, 7) f32.
    Outputs: trace (BG, D) i32, len (BG, 1) i32, leaf (BG, 1) i32,
    env (BG, 44) u32 leaf states (env_out doubles as the walk's working
    state buffer), chpk (BG, 140) u32 = 7 packed child obs side by side,
    chsc/chend (BG, 7) i32 child scores / end flags.

    Per level, each per-lane gather is an iota-mask + masked reduction; the
    whole walk is one kernel (see module docstring). Semantics are those of
    `tree.select` with the per-walk tie-break randomness pre-drawn (i.i.d.
    per level either way)."""
    BG = score_ref.shape[0]
    diota = lax.broadcasted_iota(jnp.int32, (BG, D), 1)
    niota = lax.broadcasted_iota(jnp.int32, (BG, N), 1)
    miota = lax.broadcasted_iota(jnp.int32, (BG, M), 1)
    d7iota = lax.broadcasted_iota(jnp.int32, (BG, D, 7), 1)
    a7 = lax.broadcasted_iota(jnp.int32, (BG, 7), 1)
    neg_inf = jnp.float32(-jnp.inf)

    trace_out[:] = jnp.zeros((BG, D), jnp.int32)
    len_out[:] = jnp.full((BG, 1), D, jnp.int32)
    leaf_out[:] = root_ref[:]
    env_out[:] = env0_ref[:]
    # Walk state lives in VMEM scratch, not the loop carry: Mosaic cannot
    # legalize a while/fori yield of mixed (BG, 1) i32/f32/i1 vectors
    # ("failed to legalize scf.yield" on the vpad layouts), and ref state
    # sidesteps carry layouts entirely. done is int32 for the same reason.
    idx_ref[:] = root_ref[:]
    sc_ref[:] = rootsc_ref[:]
    done_ref[:] = jnp.zeros((BG, 1), jnp.int32)

    def level(depth, carry):
        done = done_ref[:] != 0
        all_done = jnp.all(done)

        @pl.when(~all_done)
        def _():
            idx = idx_ref[:]
            sc = sc_ref[:]
            live = ~done
            # record trace[depth] = idx (live lanes)
            trace_out[:] = jnp.where(
                (diota == depth) & live, idx, trace_out[:]
            )
            leaf_out[:] = jnp.where(live, idx, leaf_out[:])

            # first-child base of idx: one masked reduce over N
            c = jnp.sum(
                jnp.where(niota == idx, cbase_ref[:], 0), 1, keepdims=True
            )                                                 # (BG, 1)
            # (broadcast the i32, not the i1: Mosaic only supports
            # non-no-op minor-dim insertion for 32-bit types)
            c7 = jnp.broadcast_to(c, (BG, 7))
            valid = c7 != 0
            kids = jnp.where(valid, c7 + a7, 0)               # (BG, 7)
            # per-child gathers UNROLLED over the 7 actions: rank-3
            # (BG, 7, N) masks blow the 16 MB VMEM budget at useful BG
            # (the module-docstring rule); 7 x (BG, N) masked reduces keep
            # the block at 128 lanes. When c == 0 the mask hits node `a`
            # and the gathered garbage is dead: `valid`/`kept` gate every
            # consumer, exactly as the rank-3 form's node-0 reads were.
            sc_l, obs_l = [], []
            for a in range(7):
                kmask = niota == c + a                        # (BG, N)
                sc_l.append(jnp.sum(
                    jnp.where(kmask, score_ref[:], 0.0), 1, keepdims=True
                ))
                obs_l.append(jnp.sum(
                    jnp.where(kmask, obs_ref[:], 0), 1, keepdims=True
                ))
            sc_k = jnp.concatenate(sc_l, axis=1)              # (BG, 7)
            obs = jnp.where(valid, jnp.concatenate(obs_l, axis=1), -1)

            # unique-children-by-obs, keep group-max score (earliest
            # ties). With cbase the 7 kids are valid all-or-nothing per
            # lane, so the pairwise valid factors are redundant (kept is
            # masked by `valid` below) — and dropping them avoids an i1
            # rank-expansion Mosaic cannot legalize.
            same = obs[:, :, None] == obs[:, None, :]
            beats = (sc_k[:, :, None] > sc_k[:, None, :]) | (
                (sc_k[:, :, None] == sc_k[:, None, :])
                & (a7[:, :, None] <= a7[:, None, :])
            )
            kept = valid & jnp.all(~same | beats, 2)
            any_kid = jnp.any(kept, 1, keepdims=True) & live  # (BG, 1)

            vi_l, va_l, vr_l = [], [], []
            for a in range(7):
                om = miota == obs[:, a:a + 1]                 # (BG, M)
                vi_l.append(jnp.sum(
                    jnp.where(om, visit_ref[:], 0.0), 1, keepdims=True
                ))
                va_l.append(jnp.sum(
                    jnp.where(om, value_ref[:], 0.0), 1, keepdims=True
                ))
                vr_l.append(jnp.sum(
                    jnp.where(om, var_ref[:], 0.0), 1, keepdims=True
                ))
            vi = jnp.concatenate(vi_l, axis=1)                # (BG, 7)
            va = jnp.concatenate(va_l, axis=1)
            vr = jnp.concatenate(vr_l, axis=1)

            visits = jnp.where(kept, vi, 0.0)
            n_total = jnp.sum(visits, 1, keepdims=True)
            q_base = va + sc_k - sc
            var = jnp.maximum(vr, 0.0)
            nv = jnp.maximum(visits, 1.0)
            rnd = jnp.sum(jnp.where(d7iota == depth, rnd_ref[:], 0.0), 1)
            if policy == "clt":
                explore = _norm_quantile(n_total) * jnp.sqrt(var / nv)
            elif policy == "bayes":
                # Bayes-UCB t-quantile bound (tree.select has the
                # derivation); the clip mirrors quantiles.bayes_quantile
                # (small-nu pole of the Koehler approximation)
                explore = jnp.clip(
                    _std_quantile2(nv - 1.0, n_total), 0.0, 1e3
                ) * jnp.sqrt(var / jnp.maximum(nv - 1.0, 1.0))
            elif policy == "gauss":
                explore = _norm_quantile(n_total) * jnp.sqrt(var)
            elif policy == "ucbv":
                # select_index_3's sqrt(var·log N) bound (core.py:223-272)
                explore = jnp.sqrt(var * jnp.log(jnp.maximum(n_total, 2.0)))
            elif policy == "max":
                q_max = jnp.max(jnp.where(kept, q_base, neg_inf), 1,
                                keepdims=True)
                explore = q_max * jnp.sqrt(
                    jnp.log(jnp.maximum(n_total, 2.0)) / nv
                )
            elif policy == "mc":
                explore = rnd * jnp.sqrt(var)
            elif policy == "random":
                explore = rnd * 1e9 - q_base
            elif policy == "greedy":
                explore = 0.0
            else:
                raise ValueError(f"unknown selection policy {policy!r}")
            q = q_base + explore

            low_mask = kept & (visits < low)
            any_low = jnp.any(low_mask, 1, keepdims=True)
            g = jnp.sum(jnp.where(d7iota == depth, gum_ref[:], 0.0), 1)
            cand = jnp.where(
                any_low,
                jnp.where(low_mask, g, neg_inf),
                jnp.where(kept, q, neg_inf),
            )
            # FIRST max index, explicitly: Mosaic's argmax picks a
            # DIFFERENT index than XLA's documented lowest-index rule on
            # exact ties (observed at an exact 4-way q=0 tie in an all-
            # terminal subtree; state autopsy state_m0_s93.pkl, a local
            # uncommitted 121 MB artifact — the real
            # cause of the round-3 "large pools/depth" divergence). Exact
            # q ties are common: ended children seed value 0. Build the
            # choice from max+min reductions, which are order-free.
            cmax = jnp.max(cand, 1, keepdims=True)
            choice = jnp.min(jnp.where(cand == cmax, a7, 7), 1,
                             keepdims=True)                   # (BG, 1)
            amask = a7 == choice
            nxt = jnp.sum(jnp.where(amask, kids, 0), 1, keepdims=True)
            sc_n = jnp.sum(jnp.where(amask, sc_k, 0.0), 1, keepdims=True)

            # inline env step (tree.select semantics: descend steps the
            # carried state; never on the last level of a depth-capped walk)
            stepped = env_packed.packed_step(
                env_out[:], choice.astype(jnp.int32),
                actions_per_drop=app, scoring=scoring, randomizer=randomizer,
            )
            step_flag = jnp.where(
                depth < D - 1, any_kid.astype(jnp.int32), 0
            )
            m44 = jnp.broadcast_to(step_flag, (BG, env_out.shape[1])) != 0
            env_out[:] = jnp.where(m44, stepped, env_out[:])

            newly_done = live & ~any_kid
            len_out[:] = jnp.where(newly_done, depth + 1, len_out[:])
            idx_ref[:] = jnp.where(any_kid, nxt, idx)
            sc_ref[:] = jnp.where(any_kid, sc_n, sc)
            done_ref[:] = (done | newly_done).astype(jnp.int32)

        return carry

    lax.fori_loop(0, D, level, 0)

    # ---- in-kernel expansion: step the leaf's 7 children ------------------
    # (engine.step no-ops on ended leaves, exactly like the XLA expand; all
    # downstream consumers mask by `can`.)
    leaf_env = env_out[:]
    # all 7 children inherit the leaf's (k0, k1, ctr): one shared draw
    predrawn = env_packed.predraw(
        leaf_env[:, 32:33], leaf_env[:, 33:34], leaf_env[:, 34:35],
        randomizer,
    )
    pk_l, sc_l2, end_l2 = [], [], []
    for a in range(7):
        ch = env_packed.packed_step(
            leaf_env, jnp.full((BG, 1), a, jnp.int32),
            actions_per_drop=app, scoring=scoring, randomizer=randomizer,
            predrawn=predrawn,
        )
        pk_l.append(env_packed.packed_obs(ch))
        sc_l2.append(env_packed._i(ch[:, 36:37]))
        end_l2.append(env_packed._i(ch[:, 43:44]))
    chpk_out[:] = jnp.concatenate(pk_l, axis=1)
    chsc_out[:] = jnp.concatenate(sc_l2, axis=1)
    chend_out[:] = jnp.concatenate(end_l2, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("policy", "low", "app", "scoring", "randomizer",
                     "interpret", "block"),
)
def select_walk(cbase, score, obs, visits, values, vars_, root, rootsc,
                env0, gumbels, rnd, *, policy: str, low: int,
                app: int = 1, scoring: int = 0, randomizer: int = 0,
                interpret: bool = False, block: int = 0):
    """Run the selection walk (with inline env stepping) for B trees in one
    kernel.

    cbase (B, N) i32; score (B, N) f32; obs (B, N) i32;
    visits/values/vars_ (B, M) f32; root/rootsc (B,); env0 (B, 44) u32
    packed root env states; gumbels/rnd (B, D, 7) f32 pre-drawn per-level
    randomness. Returns (traces (B, D) i32, lengths (B,) i32,
    leafs (B,) i32, leaf_env (B, 44) u32, child_packed (B, 7, 20) u32,
    child_score (B, 7) i32, child_end (B, 7) i32)."""
    B, N = cbase.shape
    M = visits.shape[1]
    D = gumbels.shape[1]
    if block == 0:
        block = int(os.environ.get("TMT_SELECT_BLOCK", "0"))
    if block == 0:
        # auto block: largest power-of-2 lane count whose resident inputs
        # (3 N-arrays + 3 M-arrays + 2 (D,7) randomness planes, 4 B each)
        # leave headroom for the kernel's (BG, N)/(BG, M) temporaries
        # under the raised 64 MB scoped-VMEM ceiling (_VMEM_PARAMS — the
        # 16 MB default made compile success composition-dependent). Lands
        # at 128 for both the bench pool (2048/64) and the campaign pool
        # (3584/96: 74.9k vs 70.6k sims/s at bg=64 with the insert kernel,
        # runs/r4probe/probes8.log), 32 for the benchmark twin (8192).
        lane_bytes = 4 * (3 * N + 3 * M + 2 * D * 7)
        block = 128
        while block > 8 and block * lane_bytes > 12 * 2**20:
            block //= 2
    bg = min(B, block)
    while B % bg:  # any B is accepted (bg=1 divides)
        bg //= 2

    row = lambda w: pl.BlockSpec((bg, w), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    row3 = lambda a, w: pl.BlockSpec((bg, a, w), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _select_kernel, policy, low, app, scoring, randomizer, D, N, M
    )
    S = env0.shape[1]
    traces, lengths, leafs, leaf_env, chpk, chsc, chend = pl.pallas_call(
        kernel,
        grid=(B // bg,),
        in_specs=[row(N), row(N), row(N), row(M), row(M), row(M),
                  row(1), row(1), row(S), row3(D, 7), row3(D, 7)],
        out_specs=[row(D), row(1), row(1), row(S), row(140), row(7), row(7)],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, S), jnp.uint32),
            jax.ShapeDtypeStruct((B, 140), jnp.uint32),
            jax.ShapeDtypeStruct((B, 7), jnp.int32),
            jax.ShapeDtypeStruct((B, 7), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bg, 1), jnp.int32),    # idx
            pltpu.VMEM((bg, 1), jnp.float32),  # sc
            pltpu.VMEM((bg, 1), jnp.int32),    # done
        ],
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_PARAMS,
    )(cbase, score, obs, visits, values, vars_,
      root.reshape(B, 1), rootsc.reshape(B, 1).astype(jnp.float32),
      env0, gumbels, rnd)
    return (traces, lengths.reshape(B), leafs.reshape(B), leaf_env,
            chpk.reshape(B, 7, 20), chsc, chend)


def select_batched_pallas(trees, key, cfg):
    """Kernel-backed batched selection + expansion front half: returns
    (traces, lengths, leafs, leaf_states, packed7 (B, 7, 20) u32,
    child_score (B, 7) f32, child_end (B, 7) bool). The leaf env states and
    the 7 stepped children come straight out of the kernel (the walk carries
    and steps each lane's env inline — no per-node state store, no separate
    replay, no XLA-side child stepping)."""
    from tetris_mcts_tpu.env import engine

    B = trees.root.shape[0]
    D = cfg.max_depth
    k_low, k_pol = jax.random.split(key)
    gumbels = jax.random.gumbel(k_low, (B, D, 7))
    if cfg.policy == "mc":
        rnd = jax.random.normal(k_pol, (B, D, 7))
    elif cfg.policy == "random":
        rnd = jax.random.gumbel(k_pol, (B, D, 7))
    else:
        rnd = jnp.zeros((B, D, 7), jnp.float32)

    score = trees.nstat[:, 0, :]
    obs = trees.nstat[:, 1, :].astype(jnp.int32)
    rootsc = jax.vmap(lambda s, r: s[r])(score, trees.root)
    env0 = engine.pack_state(trees.root_state)  # (B, 44)
    ins = (trees.cbase, score, obs, trees.visits, trees.values, trees.vars_,
           trees.root, rootsc, env0, gumbels, rnd)
    # Small-batch dodge (KNOWN ISSUE, mode 1): B < TMT_SELECT_PAD lanes are
    # padded to that many by tiling lane 0 (select is pure — pad lanes walk
    # a copy of tree 0 and their outputs are sliced away). The miscompile's
    # small-batch mode sits at the custom-call operand boundary; padding
    # moves the operands back into the verified batch region.
    pad_to = int(os.environ.get("TMT_SELECT_PAD", "0"))
    padded = pad_to > B
    if padded:
        reps = -(-pad_to // B)  # ceil
        ins = tuple(jnp.concatenate([a] * reps, 0)[:pad_to] for a in ins)
    if os.environ.get("TMT_SELECT_COPY") == "1":
        # Miscompile bisection knob (KNOWN ISSUE above): force the kernel
        # inputs through an optimization barrier so XLA cannot alias them
        # with (or pick exotic layouts for) buffers of the surrounding move
        # program — the composition-dependence suspect. If the barrier makes
        # the guard-exceeded shapes bit-exact, the bug is input aliasing/
        # layout, and this becomes the (cheap) production workaround.
        ins = lax.optimization_barrier(ins)
    # TMT_SELECT_INTERPRET=1: run the kernel through the Pallas interpreter
    # ON the accelerator backend (jax ops, no Mosaic). Bisection probe: a
    # compiled-vs-interpreted mismatch in the SAME program on the SAME
    # device isolates Mosaic codegen with zero cross-platform float noise.
    interp = (not on_tpu()
              or os.environ.get("TMT_SELECT_INTERPRET") == "1")
    traces, lengths, leafs, leaf_env, chpk, chsc, chend = _data_sharded(
        select_walk,
        *ins,
        policy=cfg.policy, low=cfg.low,
        app=cfg.env.actions_per_drop, scoring=cfg.env.scoring,
        randomizer=cfg.env.randomizer, interpret=interp,
    )
    if padded:
        traces, lengths, leafs, leaf_env, chpk, chsc, chend = (
            a[:B] for a in
            (traces, lengths, leafs, leaf_env, chpk, chsc, chend)
        )
    leaf_states = engine.unpack_state(leaf_env)
    return (traces, lengths, leafs, leaf_states, chpk,
            chsc.astype(jnp.float32), chend != 0)


# ---------------------------------------------------------------------------
# obs-table insert kernel
# ---------------------------------------------------------------------------

# Probe-round bound for the kernel's fori (the XLA twin's while_loop is
# unbounded). Table load is capped at 50% (max_obs <= table_size/2), where
# the expected linear-probe cluster is ~2 slots and the longest cluster in a
# 4096-slot table is ~25 (3.3 ln n); 128 rounds is astronomically safe, and
# rounds after all-placed cost one skipped predicate each.
_INSERT_ROUNDS = 128


def _insert7_kernel(max_obs, T, aliased, h1_ref, h2_ref, ok_ref,
                    th1_ref, th2_ref, tobs_ref, nobs_ref,
                    th1_out, th2_out, tobs_out, nobs_out, obs7_out,
                    slot_ref, placed_ref):
    """`tree.insert_obs7_batched`'s probe loop as ONE kernel: BG trees, each
    resolving its 7 child keys against its own open-addressing table row in
    lockstep rounds. Tables are VMEM-resident and aliased in/out; each XLA
    round cost ~130 us of op-dispatch latency where a kernel round is ~20 us
    of VPU work (measured — the insert was the single largest phase of the
    move program at ~1 ms/sim).

    Same lockstep algorithm as the XLA twin: resolve-by-match, claim empty
    slots by group representatives (the 7-unrolled masked writes make the
    LAST contending action the slot winner — contention between distinct
    keys on one slot needs an h1-mod-T collision, which the golden tests'
    random keys never produce and either winner is semantically valid),
    duplicate-key lanes resolve by match one round later; pool exhaustion
    resolves to obs 0 at the first empty slot.

    Shapes: h1/h2 (BG, 7) u32; ok (BG, 1) i32; th1/th2 (BG, T) u32;
    tobs (BG, T) i32; nobs (BG, 1) i32. When `aliased` the outputs alias
    the table inputs (interpret/CPU only); on TPU the kernel copies the
    tables to fresh outputs instead (`_use_aliases` hazard); obs7 (BG, 7)
    i32."""
    if aliased:
        del th1_ref, th2_ref, tobs_ref, nobs_ref  # *_out hold inputs
    else:
        # aliasing is a TPU correctness hazard in composition (_use_aliases)
        th1_out[:] = th1_ref[:]
        th2_out[:] = th2_ref[:]
        tobs_out[:] = tobs_ref[:]
        nobs_out[:] = nobs_ref[:]
    BG = h1_ref.shape[0]
    tiota = lax.broadcasted_iota(jnp.int32, (BG, T), 1)
    a7 = lax.broadcasted_iota(jnp.int32, (BG, 7), 1)
    h1 = h1_ref[:]
    h2 = h2_ref[:]
    mask = jnp.uint32(T - 1)
    # probe step must agree with tree._probe_step (TMT_PROBE=double)
    pstep = (h2 | jnp.uint32(1)) if _tree_probe_double() else \
        jnp.full_like(h2, 1)

    same = (h1[:, :, None] == h1[:, None, :]) & (
        h2[:, :, None] == h2[:, None, :]
    )
    # group representative = lowest lane of each same-key group (argmax is
    # f32-only in Mosaic: count same-key lanes strictly below instead)
    lower = a7[:, :, None] > a7[:, None, :]
    rep = jnp.sum((same & lower).astype(jnp.int32), axis=2) == 0

    okm = jnp.broadcast_to(ok_ref[:], (BG, 7)) != 0
    slot_ref[:] = (h1 & mask).astype(jnp.int32)
    placed_ref[:] = jnp.where(okm, 0, 1)
    obs7_out[:] = jnp.zeros((BG, 7), jnp.int32)

    def round_(r, carry):
        done_v = placed_ref[:] != 0
        all_placed = jnp.all(done_v)

        @pl.when(~all_placed)
        def _():
            slot = slot_ref[:]
            placed = placed_ref[:] != 0
            n_obs = nobs_out[:]

            # gather occupied/match per action (7-unrolled (BG, T) reduces).
            # Key equality is tested at table width BEFORE reducing —
            # Mosaic has no unsigned reductions, and the compare-then-count
            # form needs none (sm selects exactly one position).
            # (concat i32 counts, compare after — i1 vector concatenation
            # is not a legal vreg cast)
            mat_l, oid_l = [], []
            for a in range(7):
                sm = tiota == slot[:, a : a + 1]
                to = jnp.sum(jnp.where(sm, tobs_out[:], 0), 1, keepdims=True)
                eq = sm & (th1_out[:] == h1[:, a : a + 1]) & (
                    th2_out[:] == h2[:, a : a + 1]
                )
                mat_l.append(jnp.sum(eq.astype(jnp.int32), 1, keepdims=True))
                oid_l.append(to)
            tid = jnp.concatenate(oid_l, axis=1)             # (BG, 7)
            occupied = tid != 0
            match = (jnp.concatenate(mat_l, axis=1) > 0) & occupied

            live = ~placed
            obs_id = jnp.where(live & match, tid, obs7_out[:])
            placed = placed | (live & match)
            live = ~placed

            full = jnp.broadcast_to(
                (n_obs >= max_obs).astype(jnp.int32), (BG, 7)
            ) != 0
            at_empty = live & ~occupied
            placed = placed | (at_empty & full)
            live = ~placed
            at_empty = at_empty & ~full

            # claim: group representatives at an empty slot write their key
            # (broadcast the i32 flag, compare after — no i1 broadcasts)
            attempt = at_empty & rep
            attempt_i = attempt.astype(jnp.int32)
            th1_new, th2_new = th1_out[:], th2_out[:]
            for a in range(7):
                wm = (tiota == slot[:, a : a + 1]) & (
                    jnp.broadcast_to(attempt_i[:, a : a + 1], (BG, T)) != 0
                )
                th1_new = jnp.where(wm, h1[:, a : a + 1], th1_new)
                th2_new = jnp.where(wm, h2[:, a : a + 1], th2_new)
            th1_out[:] = th1_new
            th2_out[:] = th2_new

            # read back: the surviving writer per slot wins (same
            # compare-then-count form as the match test)
            won_l = []
            for a in range(7):
                sm = tiota == slot[:, a : a + 1]
                eqn = sm & (th1_new == h1[:, a : a + 1]) & (
                    th2_new == h2[:, a : a + 1]
                )
                won_l.append(jnp.sum(eqn.astype(jnp.int32), 1, keepdims=True))
            won = attempt & (jnp.concatenate(won_l, axis=1) > 0)

            # ids in action order (exclusive prefix count of winners)
            wi = won.astype(jnp.int32)
            parts = [jnp.zeros((BG, 1), jnp.int32)]
            run = wi[:, 0:1]
            for j in range(1, 7):
                parts.append(run)
                run = run + wi[:, j : j + 1]
            rank = jnp.concatenate(parts, axis=1)
            ids = n_obs + rank
            won = won & (ids < max_obs)

            tobs_new = tobs_out[:]
            won_i = won.astype(jnp.int32)
            for a in range(7):
                wm = (tiota == slot[:, a : a + 1]) & (
                    jnp.broadcast_to(won_i[:, a : a + 1], (BG, T)) != 0
                )
                tobs_new = jnp.where(wm, ids[:, a : a + 1], tobs_new)
            tobs_out[:] = tobs_new
            obs_id = jnp.where(won, ids, obs_id)
            placed = placed | won
            nobs_out[:] = n_obs + jnp.sum(
                won.astype(jnp.int32), axis=1, keepdims=True
            )

            advance = ~placed & occupied & ~match
            slot_ref[:] = jnp.where(
                advance,
                ((slot.astype(jnp.uint32) + pstep) & mask).astype(jnp.int32),
                slot,
            )
            placed_ref[:] = placed.astype(jnp.int32)
            obs7_out[:] = obs_id

        return carry

    lax.fori_loop(0, _INSERT_ROUNDS, round_, 0)


@functools.partial(
    jax.jit, static_argnames=("max_obs", "table_size", "interpret")
)
def insert7_walk(h1, h2, ok, th1, th2, tobs, n_obs,
                 *, max_obs: int, table_size: int, interpret: bool = False):
    """Run the 7-key table insert for B trees in one kernel. Returns
    (th1, th2, tobs, n_obs, obs7)."""
    B = h1.shape[0]
    T = table_size
    # The three aliased (BG, T) tables plus the round body's table-wide
    # temporaries (th1_new/th2_new/tobs_new and the probe masks) must fit
    # the ~16 MB VMEM. Measured: Mosaic's scoped stack peaks at ~7x the
    # resident table bytes (21.96 MB at 3.1 MB resident, T=4096) — cap
    # resident bytes at 1.5 MB so the peak stays near ~11 MB.
    bg = 128
    while bg > 8 and bg * 3 * T * 4 > (3 * 2**20) // 2:
        bg //= 2
    bg = min(B, bg)
    while B % bg:  # any B is accepted, like the XLA twin (bg=1 divides)
        bg //= 2
    row = lambda w: pl.BlockSpec((bg, w), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    aliased = _use_aliases()
    kernel = functools.partial(_insert7_kernel, max_obs, T, aliased)
    th1, th2, tobs, n_obs, obs7 = pl.pallas_call(
        kernel,
        grid=(B // bg,),
        in_specs=[row(7), row(7), row(1), row(T), row(T), row(T), row(1)],
        out_specs=[row(T), row(T), row(T), row(1), row(7)],
        out_shape=[
            jax.ShapeDtypeStruct((B, T), jnp.uint32),
            jax.ShapeDtypeStruct((B, T), jnp.uint32),
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 7), jnp.int32),
        ],
        input_output_aliases=(
            {3: 0, 4: 1, 5: 2, 6: 3} if aliased else {}),
        scratch_shapes=[
            pltpu.VMEM((bg, 7), jnp.int32),  # slot
            pltpu.VMEM((bg, 7), jnp.int32),  # placed
        ],
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_PARAMS,
    )(h1, h2, ok.astype(jnp.int32).reshape(B, 1),
      th1, th2, tobs, n_obs.reshape(B, 1))
    return th1, th2, tobs, n_obs.reshape(B), obs7


_INSERT_GUARD_WARNED = set()

# Mosaic's scoped stack for the insert kernel peaks at ~6-7x the resident
# table bytes (measured on v5e: T=131072 at bg=8 -> 12.58 MB resident,
# 76.05 MB scoped stack, compile REJECTED over the 64 MB _VMEM_PARAMS
# ceiling — round-5 bisect launch; T=4096 -> 21.96 MB stack at 3.1 MB
# resident). The block loop floors at bg=8 (the sublane tile), so beyond
# a table size no block choice can fit — guard and fall back to the XLA
# probe loop instead of failing the whole move-program compile.
_INSERT_STACK_FACTOR = 7
_INSERT_STACK_BUDGET = 60 * 1024 * 1024


def insert_kernel_config_ok(batch: int, table_size: int) -> bool:
    """False when the insert kernel's minimum-block scoped-VMEM stack
    cannot fit the 64 MB ceiling at this (batch, table_size)."""
    bg = 128
    while bg > 8 and bg * 3 * table_size * 4 > (3 * 2**20) // 2:
        bg //= 2
    bg = min(batch, bg)
    while batch % bg:
        bg //= 2
    resident = bg * 3 * table_size * 4
    return resident * _INSERT_STACK_FACTOR <= _INSERT_STACK_BUDGET


def insert_obs7_batched_pallas(trees, packed7, end7, ok, cfg):
    """Kernel-backed drop-in for `tree.insert_obs7_batched` (projection
    mode): the probe loop runs as one kernel; the fresh-id tail writes
    (obs_end, packed boards) stay as single XLA scatters (measured
    negligible next to the probe loop). Shapes whose kernel cannot fit
    scoped VMEM (insert_kernel_config_ok) delegate to the XLA twin."""
    from tetris_mcts_tpu.search import tree as T_

    B = packed7.shape[0]
    if on_tpu() and not insert_kernel_config_ok(B, cfg.table_size):
        key = (B, cfg.table_size)
        if key not in _INSERT_GUARD_WARNED:
            _INSERT_GUARD_WARNED.add(key)
            import sys
            print(
                f"insert-kernel guard: batch {B} / table {cfg.table_size} "
                "needs more scoped VMEM than the 64 MB kernel ceiling at "
                "the minimum block size; using the XLA probe loop "
                "(ops/tree_walk.py insert_kernel_config_ok)",
                file=sys.stderr, flush=True,
            )
        return T_.insert_obs7_batched(trees, packed7, end7, ok, cfg)
    M = trees.obs_bits.shape[-1]
    h1, h2 = T_._hash_packed(packed7)
    n_obs0 = trees.n_obs
    th1, th2, tobs, n_obs, obs7 = _data_sharded(
        insert7_walk,
        h1, h2, ok, trees.tbl_h1, trees.tbl_h2, trees.tbl_obs, trees.n_obs,
        max_obs=cfg.max_obs, table_size=cfg.table_size,
        interpret=not on_tpu(),
    )
    same = (h1[:, :, None] == h1[:, None, :]) & (
        h2[:, :, None] == h2[:, None, :]
    )
    rep = jnp.argmax(same, axis=2) == jnp.arange(7)[None, :]
    fresh = ok[:, None] & (obs7 >= n_obs0[:, None])
    first = fresh & rep
    o_w = jnp.where(first, obs7, M)
    bidx = jnp.arange(B)[:, None]
    trees = trees._replace(
        tbl_h1=th1, tbl_h2=th2, tbl_obs=tobs, n_obs=n_obs,
        obs_end=trees.obs_end.at[bidx, o_w].set(end7, mode="drop"),
        obs_bits=trees.obs_bits.at[bidx, :, o_w].set(packed7, mode="drop"),
    )
    return trees, obs7


# ---------------------------------------------------------------------------
# fused LP-seed + backup kernel
# ---------------------------------------------------------------------------

def _lp_backup_kernel(gamma, D, N, M, aliased,
                      trace_ref, len_ref, vnn_ref, varnn_ref, exp_ref,
                      cbase_ref, score_ref, obsend_ref,
                      visit_ref, value_ref, var_ref,
                      visit_out, value_out, var_out):
    """`backup_trace_obs_LP` (C++ core.h:303-381) in ONE kernel: seed the
    leaf's fresh unique child obs with the NN estimates, compute the
    averaged child value, then run the reverse Welford+γ walk — the whole
    per-sim post-NN phase without a single XLA-level gather/scatter.

    Shapes: trace (BG, D) i32; len/exp (BG, 1) i32; vnn/varnn (BG, 7) f32;
    cbase/score (BG, N); obsend (BG, N) i32 = obs-id | end << 30;
    stats (BG, M) f32 aliased in/out. The child-set prologue is unrolled
    over the 7 actions with (BG, N)/(BG, M) masks (rank-3 intermediates at
    useful BG blow the 16 MB VMEM budget)."""
    if aliased:
        del visit_ref, value_ref, var_ref
    else:
        # TMT_NO_ALIAS probe mode: fresh outputs, copy the inputs first
        visit_out[:] = visit_ref[:]
        value_out[:] = value_ref[:]
        var_out[:] = var_ref[:]
    BG = score_ref.shape[0]
    diota = lax.broadcasted_iota(jnp.int32, (BG, D), 1)
    niota = lax.broadcasted_iota(jnp.int32, (BG, N), 1)
    miota = lax.broadcasted_iota(jnp.int32, (BG, M), 1)
    lengths = len_ref[:]
    expanded = exp_ref[:] != 0

    # ---- leaf and its unique children (seed prologue) ---------------------
    leaf = jnp.sum(
        jnp.where(diota == lengths - 1, trace_ref[:], 0), 1, keepdims=True
    )
    lmask = niota == leaf
    leaf_score = jnp.sum(jnp.where(lmask, score_ref[:], 0.0), 1,
                         keepdims=True)
    c = jnp.sum(jnp.where(lmask, cbase_ref[:], 0), 1, keepdims=True)
    has_kids = c != 0

    sc_k, obs_k, end_k, vi_k = [], [], [], []
    for a in range(7):
        kid = c + a  # (BG, 1); garbage when c == 0, masked below
        kmask = niota == kid
        sc_k.append(jnp.sum(jnp.where(kmask, score_ref[:], 0.0), 1,
                            keepdims=True))
        oe = jnp.sum(jnp.where(kmask, obsend_ref[:], 0), 1, keepdims=True)
        obs_k.append(jnp.where(has_kids, oe & ((1 << 30) - 1), -1))
        end_k.append((oe >> 30) & 1)
    sc7 = jnp.concatenate(sc_k, axis=1)      # (BG, 7)
    obs7 = jnp.concatenate(obs_k, axis=1)    # (BG, 7)
    end7 = jnp.concatenate(end_k, axis=1)    # (BG, 7)

    # unique-by-obs, keep group-max score (earliest on ties)
    a7 = lax.broadcasted_iota(jnp.int32, (BG, 7), 1)
    same = obs7[:, :, None] == obs7[:, None, :]          # (BG, 7, 7) — small
    beats = (sc7[:, :, None] > sc7[:, None, :]) | (
        (sc7[:, :, None] == sc7[:, None, :])
        & (a7[:, :, None] <= a7[:, None, :])
    )
    kept = has_kids & jnp.all(~same | beats, 2) & expanded

    # seed fresh obs with NN values (terminal children get 0) and read back
    # the post-seed child stats — per action, (BG, M) masked ops
    v_sum = jnp.zeros((BG, 1), jnp.float32)
    var_sum = jnp.zeros((BG, 1), jnp.float32)
    for a in range(7):
        ka = kept[:, a:a + 1]
        mm = (miota == obs7[:, a:a + 1]) & ka
        vi = jnp.sum(jnp.where(mm, visit_out[:], 0.0), 1, keepdims=True)
        first = mm & (vi == 0.0)
        seed_v = jnp.where(end_k[a] != 0, 0.0, vnn_ref[:, a:a + 1])
        seed_var = jnp.where(end_k[a] != 0, 0.0, varnn_ref[:, a:a + 1])
        visit_out[:] = jnp.where(first, vi + 1.0, visit_out[:])
        value_out[:] = jnp.where(first, seed_v, value_out[:])
        var_out[:] = jnp.where(first, seed_var, var_out[:])
        va = jnp.sum(jnp.where(mm, value_out[:], 0.0), 1, keepdims=True)
        vr = jnp.sum(jnp.where(mm, var_out[:], 0.0), 1, keepdims=True)
        v_sum = v_sum + jnp.where(ka, sc_k[a] + gamma * va, 0.0)
        var_sum = var_sum + jnp.where(ka, vr, 0.0)

    k = jnp.maximum(jnp.sum(kept.astype(jnp.int32), 1, keepdims=True), 1)
    kf = k.astype(jnp.float32)
    v_mean = v_sum / kf
    var_mean = var_sum * gamma * gamma / kf
    v0 = jnp.where(expanded, v_mean, leaf_score)
    var0 = jnp.where(expanded, var_mean, jnp.float32(0.0))

    # ---- reverse Welford+γ walk (shared with _backup_kernel) ---------------
    def lookup_obs(nmask, live):
        # obs and end share a word here; dead lanes redirect to M
        return jnp.where(
            live,
            jnp.sum(jnp.where(nmask, obsend_ref[:], 0), 1, keepdims=True)
            & ((1 << 30) - 1),
            M,
        )

    _reverse_welford_walk(
        gamma, trace_ref, lengths, score_ref, lookup_obs,
        v0, var0, visit_out, value_out, var_out,
        diota, niota, miota,
    )


_BG_LP = 128


@functools.partial(jax.jit, static_argnames=("gamma", "interpret"))
def lp_backup_walk(traces, lengths, v_nn, var_nn, expanded,
                   cbase, score, obsend, visits, values, vars_,
                   *, gamma: float, interpret: bool = False):
    """Seed + averaged leaf-parallel backup for B trees in one kernel."""
    B, D = traces.shape
    N = score.shape[1]
    M = visits.shape[1]
    # Resident per lane: 3 N-arrays + 3 M stat arrays. Mosaic's scoped stack
    # is superlinear in M (measured at M=N=3584: 24.5 MB stack @ bg=128,
    # 16.52 MB @ bg=64 — both over the 16 MB limit despite <=11 MB resident;
    # bg=32 compiles and runs 98.1k sims/s at 500 sims). Fit by resident
    # bytes, then halve once more beyond the bench pool size where the
    # measured-good points stop. TMT_LP_BLOCK overrides for probing.
    bg = int(os.environ.get("TMT_LP_BLOCK", "0")) or min(
        B, _fit_block(_BG_LP, 4 * (3 * N + 3 * M), budget=7_000_000)
    )
    if not os.environ.get("TMT_LP_BLOCK") and M > 2048 and bg > 8:
        bg //= 2
    while B % bg:  # any B is accepted (bg=1 divides)
        bg //= 2

    row = lambda w: pl.BlockSpec((bg, w), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
    aliased = _use_aliases()
    kernel = functools.partial(_lp_backup_kernel, float(gamma), D, N, M,
                               aliased)
    return pl.pallas_call(
        kernel,
        grid=(B // bg,),
        in_specs=[row(D), row(1), row(7), row(7), row(1),
                  row(N), row(N), row(N), row(M), row(M), row(M)],
        out_specs=[row(M), row(M), row(M)],
        out_shape=[jax.ShapeDtypeStruct((B, M), jnp.float32)] * 3,
        input_output_aliases={8: 0, 9: 1, 10: 2} if aliased else {},
        interpret=interpret,
        compiler_params=None if interpret else _VMEM_PARAMS,
    )(traces, lengths.reshape(B, 1),
      v_nn.astype(jnp.float32), var_nn.astype(jnp.float32),
      expanded.astype(jnp.int32).reshape(B, 1),
      cbase, score, obsend, visits, values, vars_)


def lp_backup_batched_pallas(trees, traces, lengths, v_nn, var_nn, expanded,
                             cfg):
    """Fused drop-in for vmap(lp_seed) + backup_batched on TPU."""
    obsend = trees.nstat[:, 1, :].astype(jnp.int32) | (
        trees.end.astype(jnp.int32) << 30
    )
    visits, values, vars_ = _data_sharded(
        lp_backup_walk,
        traces, lengths, v_nn, var_nn, expanded,
        trees.cbase, trees.nstat[:, 0, :], obsend,
        trees.visits, trees.values, trees.vars_,
        gamma=cfg.gamma, interpret=not on_tpu(),
    )
    return trees._replace(visits=visits, values=values, vars_=vars_)
