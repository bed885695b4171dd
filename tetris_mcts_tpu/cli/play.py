"""`play` entrypoint — flag-parity CLI over the batched self-play driver.

Mirrors the reference's `play.py` argparse surface (`/root/reference/
play.py:46-70`: agent_type, mcts_sims, ngames, endless, benchmark, save,
save_dir/save_file, online, app/scoring/randomizer env knobs, cycle, ...)
plus the batched-TPU knobs that have no reference counterpart (batch size,
memory/tree capacities). Agent-type strings map reference classes (SURVEY.md
§2.3) onto evaluator/flags of the one batched driver:

  Vanilla / VanillaC      -> rollout evaluator, no training
  ValueSim                -> single-leaf NN evaluator, online training
  ValueSimLP / ValueSimC  -> leaf-parallel NN evaluator, online training
  Random                  -> rollout evaluator, sims=1 (trivial baseline)
"""

from __future__ import annotations

import argparse
import os
import sys

from tetris_mcts_tpu.cli import DEFAULT_CKPT

AGENT_TYPES = {
    "Vanilla": ("rollout", False),
    "VanillaC": ("rollout", False),
    "ValueSim": ("leaf", True),
    # ValueSimOnline (agents/ValueSimOnline.py, the agent behind the
    # reference's headline endless run): leaf NN evaluation with the
    # (v, var) seeded at the leaf (backup's first-visit rule reproduces the
    # node_stats seeding, ValueSimOnline.py:48-51), CLT selection, welford
    # backup, online training. Its model's policy head is never read by the
    # search (`mcts`, :32-63), so the live leaf evaluator IS the agent.
    "ValueSimOnline": ("leaf", True),
    "ValueSimLP": ("lp", True),
    "ValueSimC": ("lp", True),
    "ApproxPolicyIter": ("vp", True),
    "DistValueSim": ("dist", True),
    # ValueSimBayes (agents/ValueSimBayes.py): Bayes-UCB selection
    # (select_index_bayes) on the VV net, NO online training — rebuilt as
    # the leaf evaluator under --policy bayes (forced below)
    "ValueSimBayes": ("leaf", False),
    # legacy policy-guided-playout agents (SURVEY §2.3: HybridSim depth-30
    # + value bootstrap, FiniteSim depth-50, FullSim to-game-end;
    # agents/{Hybrid,Finite,Full}Sim.py) — rebuilt on the VP net, no
    # training, playout depth overridable with --rollout_depth
    "HybridSim": ("hybrid", False),
    "FiniteSim": ("finite", False),
    "FullSim": ("full", False),
    # ValueSim2 (agents/ValueSim2.py, LEGACY/BROKEN in the reference):
    # stochastic-transition edge statistics + select_index_2 UCB
    # (search/stochastic.py), single-leaf VV evaluation, no training
    "ValueSim2": ("s2", False),
    "DQN": ("dqn", True),
    "DistDQN": ("dqn", True),
    "Random": ("rollout", False),
}

# evaluators that run on the VP (value+policy) net
_VP_EVALUATORS = ("vp", "hybrid", "finite", "full")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tetris-tpu play",
        description="Batched MCTS Tetris self-play (TPU-native)",
    )
    # reference flags (play.py:46-70)
    p.add_argument("--agent_type", default="ValueSimLP", choices=AGENT_TYPES)
    p.add_argument("--mcts_sims", type=int, default=100)
    p.add_argument("--ngames", type=int, default=50,
                   help="episodes to play (reference default 50)")
    p.add_argument("--endless", action="store_true")
    p.add_argument("--benchmark", action="store_true",
                   help="no training / storage (play.py:49)")
    p.add_argument("--online", action="store_true",
                   help="online training (implied by ValueSim* agents)")
    p.add_argument("--save", action="store_true",
                   help="save per-move rows to HDF5")
    p.add_argument("--save_tree", action="store_true",
                   help="dump searched tree nodes (board/value/variance/"
                        "visits) to save_dir/tree<cycle>.h5 at run end "
                        "(reference --save_tree, agent.py:259-289)")
    p.add_argument("--printboard", action="store_true",
                   help="print game 0's board each move (reference "
                        "--printboard)")
    p.add_argument("--interactive", action="store_true",
                   help="text-interactive play: you type actions 0-6 "
                        "(reference --interactive; no agent)")
    p.add_argument("--save_dir", default="./data")
    p.add_argument("--save_file", default="data")
    p.add_argument("--cycle", type=int, default=0)
    p.add_argument("--app", type=int, default=1,
                   help="actions per (gravity) drop")
    p.add_argument("--scoring", type=int, default=0, choices=(0, 1),
                   help="0 guideline, 1 raw line clears")
    p.add_argument("--randomizer", type=int, default=0, choices=(0, 1),
                   help="0 seven-bag, 1 uniform")
    p.add_argument("--gamma", type=float, default=0.999)
    p.add_argument("--policy", default="clt",
                   choices=("clt", "bayes", "gauss", "ucbv", "max", "mc",
                            "random", "greedy"),
                   help="leaf-selection rule (reference agents/policy.py; "
                        "bayes = Bayes-UCB t-quantile, core.py:290-351; "
                        "ucbv = select_index_3's sqrt(var*logN) bound, "
                        "core.py:223-272)")
    p.add_argument("--low", type=int, default=None,
                   help="visit threshold below which children are chosen "
                        "uniformly before any policy runs (reference "
                        "check_low/min_n). Default: 10 for --policy bayes "
                        "(select_index_bayes min_n, core.py:290), 5 for "
                        "Vanilla/VanillaC (Vanilla.py low=5) and DistValueSim "
                        "(select_trace_distributional low=5), else 1 "
                        "(unvisited-first)")
    p.add_argument("--dump_dir", default="",
                   help="write data/dump.npz of each training session's set "
                        "(reference ValueSim.py:176-177; consumed by `tools "
                        "train_dump`). '' = off")
    p.add_argument("--ensemble", type=int, default=0,
                   help="K-member deep-ensemble VV net (the reference's "
                        "broken model_vv.Ensemble rebuilt working; "
                        "train/ensemble.py). 0 = single net. Applies to "
                        "the VV-net agents (ValueSim*/Vanilla variants)")
    p.add_argument("--rollout_depth", type=int, default=0,
                   help="policy-playout depth for HybridSim/FiniteSim/"
                        "FullSim (0 = reference defaults 30/50/to-end)")
    p.add_argument("--min_visits", type=int, default=25)
    p.add_argument("--acc_policy", type=int, default=-1,
                   choices=(-1, 0, 1, 2, 3),
                   help="replay accumulation policy: -1 = growth-gated ring "
                        "(ValueSim.py:161-186, default); 0-3 = the C++ "
                        "OnlineMCTSAgent policies (agent.cpp:635-695: "
                        "0 episode gate + stochastic drop + random trim, "
                        "1 episode gate + weighted trim, 2 episode-or-full, "
                        "3 growth-gated accumulate; all clear after train)")
    p.add_argument("--episodes_per_train", type=int, default=25,
                   help="episode gate for acc_policy 0-2 (agent.cpp:838)")
    p.add_argument("--trim_fraction", type=float, default=0.01,
                   help="overflow trim percentile/fraction (agent.cpp:657,671)")
    p.add_argument("--benchmark_every", type=int, default=0,
                   help="play benchmark games every N episodes (reference "
                        "cycle.sh:72 channel; 0 = off)")
    p.add_argument("--benchmark_games", type=int, default=8,
                   help="completed games per benchmark round")
    p.add_argument("--benchmark_sims", type=int, default=0,
                   help="sims/move in benchmark games (0 = 2x --mcts_sims; "
                        "reference trains 500 benches 1000, README.md:56)")
    p.add_argument("--benchmark_batch", type=int, default=0,
                   help="benchmark games in lockstep (0 = auto)")
    p.add_argument("--benchmark_max_moves", type=int, default=5000,
                   help="move cap per benchmark round")
    p.add_argument("--benchmark_max_nodes", type=int, default=0,
                   help="tree pool for benchmark games (0 = auto-scale)")
    p.add_argument("--allow_clamp", action="store_true",
                   help="accept max_nodes/max_obs too small for one move "
                        "(degraded search: tail sims expand nothing) instead "
                        "of raising")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--load_model", action="store_true",
                   help="load checkpoint before playing")
    p.add_argument("--checkpoint", default=DEFAULT_CKPT)
    # TPU-native knobs (no reference counterpart: reference runs 1 game)
    p.add_argument("--batch", type=int, default=64,
                   help="games in lockstep per chip")
    p.add_argument("--max_nodes", type=int, default=4096)
    p.add_argument("--max_obs", type=int, default=4096)
    p.add_argument("--episode_reuse", type=int, nargs="?", const=1, default=0,
                   help="1: keep trees across episode boundaries (reference "
                        "update_root semantics — done lanes re-root into "
                        "the same pool; only pool exhaustion resets); 0 "
                        "(default): harvest+reset at episode end")
    p.add_argument("--max_depth", type=int, default=96,
                   help="selection-walk depth cap; raise for big pools "
                        "with cross-move tree reuse (reference trees are "
                        "uncapped)")
    p.add_argument("--memory_size", type=int, default=100000)
    p.add_argument("--memory_growth", type=int, default=5000)
    p.add_argument("--train_rows", type=int, default=5000)
    p.add_argument("--train_batch", type=int, default=128)
    p.add_argument("--train_iters_per_val", type=int, default=100)
    p.add_argument("--train_max_iters", type=int, default=50000)
    p.add_argument("--max_moves", type=int, default=10_000_000)
    p.add_argument("--metrics", default="",
                   help="JSONL metrics path ('' = off)")
    p.add_argument("--status_dir", default="",
                   help="publish live-state memmaps here ('' = off)")
    p.add_argument("--select_kernel", type=int, nargs="?", const=1, default=1,
                   help="1: fused Pallas selection kernel (default); 0: "
                        "hand-batched XLA walk (bit-equal law; the fallback "
                        "for pool shapes where the kernel miscompiles)")
    p.add_argument("--insert_kernel", type=int, nargs="?", const=1, default=1,
                   help="1: obs-table insert as a Pallas kernel (default "
                        "since round 4 — faster and toggle-verified); 0: "
                        "hand-batched XLA probe loop "
                        "(see TreeConfig.insert_kernel)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 in-search NN forward (training stays "
                        "float32; halves the MXU cost of the move program's "
                        "inference phase)")
    p.add_argument("--trace", default="",
                   help="capture a jax.profiler trace of the move program "
                        "into this directory (after 2 warmup moves), then "
                        "exit — open with tensorboard/xprof ('' = off)")
    p.add_argument("--trace_moves", type=int, default=4,
                   help="moves to capture under --trace")
    p.add_argument("--stall_timeout", type=float, default=900,
                   help="seconds of zero host-loop progress before the "
                        "stall watchdog hard-exits (code 86) so a "
                        "supervisor relaunches from the last checkpoint — "
                        "the recovery for a wedged axon tunnel "
                        "(runtime/watchdog.py). 0 = off")
    p.add_argument("--stall_startup", type=float, default=3600,
                   help="the watchdog's allowance for known compile points "
                        "(first move, new training shapes, benchmark twin) "
                        "— remote compiles run ~minutes to ~35 min cold")
    return p


def interactive_loop(args) -> int:
    """Text-interactive play (reference play.py:119-160: printState, read an
    action from stdin, step; 'Play more?' on game end). No agent, one game."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tetris_mcts_tpu.cli.replay import render
    from tetris_mcts_tpu.env import engine

    cfg = engine.EnvConfig(actions_per_drop=args.app, scoring=args.scoring,
                           randomizer=args.randomizer)
    envs = engine.reset_batch(args.seed, 1, cfg)
    names = "0 noop  1 left  2 right  3 soft  4 ccw  5 cw  6 hard"
    games = 0
    while True:
        st = jax.tree.map(lambda a: a[0], envs)
        print(render(np.asarray(engine.get_state(st)), int(st.score),
                     int(st.lines), int(st.combo)))
        try:
            action = int(input(f"Play ({names}): "))
        except (ValueError, EOFError):
            return 0
        if not 0 <= action <= 6:
            continue
        envs = engine.step_batch(envs, jnp.full((1,), action), cfg)
        if bool(envs.end[0]):
            st = jax.tree.map(lambda a: a[0], envs)
            print(render(np.asarray(engine.get_state(st)), int(st.score),
                         int(st.lines), int(st.combo)))
            print(f"Game over — score {int(st.score)}, "
                  f"lines {int(st.lines)}")
            try:
                if input("Play more? (y/n): ").strip() != "y":
                    return 0
            except EOFError:
                return 0
            games += 1
            envs = engine.reset_batch(args.seed + games, 1, cfg)


class _PrintBoard:
    """--printboard: wraps the (optional) StatusPublisher slot so the driver
    publishes to both; prints game 0's pre-move board like the reference's
    `game.printState()` (play.py:126-127)."""

    def __init__(self, inner=None):
        self.inner = inner

    def publish(self, board, combo, score, lines, line_stats):
        if self.inner is not None:
            self.inner.publish(board, combo, score, lines, line_stats)
        from tetris_mcts_tpu.cli.replay import render

        print(render(board, int(score[0]), int(lines[0]), int(combo[0])),
              flush=True)


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.interactive:
        return interactive_loop(args)

    from tetris_mcts_tpu.runtime.selfplay import (
        DistSelfPlayDriver, S2SelfPlayDriver, SelfPlayConfig, SelfPlayDriver,
        VPSelfPlayDriver,
    )
    from tetris_mcts_tpu.train.trainer import DistModel, VPModel, VVModel

    evaluator, trains = AGENT_TYPES[args.agent_type]

    wd = None
    if args.stall_timeout > 0:
        from tetris_mcts_tpu.runtime import watchdog as watchdog_mod

        wd = watchdog_mod.install(watchdog_mod.StallWatchdog(
            stall_timeout=args.stall_timeout,
            startup_timeout=args.stall_startup,
        )).start()

    def capture_trace(driver):
        # SURVEY.md §5 tracing: the reference has none; here the whole move
        # is ONE device program, so a short profiler capture shows every
        # phase (select kernel, insert, NN forward, backup) on a timeline.
        import jax

        for _ in range(2):  # warm up: compiles excluded from the capture
            driver.step()
        with jax.profiler.trace(args.trace):
            for _ in range(args.trace_moves):
                driver.step()
        print(f"Trace of {args.trace_moves} moves written to {args.trace}",
              file=sys.stderr)

    if evaluator == "dqn":
        # self-contained Q-learning agent (reference agents/DQN.py): no tree
        from tetris_mcts_tpu.runtime.dqn import DQNConfig, DQNDriver

        if args.save or args.status_dir:
            print("--save/--status_dir are not supported for DQN agents "
                  "(no tree statistics to store)", file=sys.stderr)
        metrics = None
        if args.metrics:
            from tetris_mcts_tpu.obs.metrics import MetricsWriter
            metrics = MetricsWriter(args.metrics)
        # per-net default checkpoint (cli.resolve_ckpt): blobs of different
        # nets must never share a file
        from tetris_mcts_tpu.cli import resolve_ckpt

        ckpt = resolve_ckpt(args.checkpoint, "dqn")
        driver = DQNDriver(
            DQNConfig(
                batch=args.batch, memory_size=args.memory_size,
                distributional=args.agent_type == "DistDQN",
                benchmark=args.benchmark,
                seed=args.seed, actions_per_drop=args.app,
                scoring=args.scoring, randomizer=args.randomizer,
            ),
            metrics=metrics, checkpoint_path=ckpt,
        )
        if args.load_model:
            driver.load()

        import signal

        def _term(signum, frame):
            raise KeyboardInterrupt

        signal.signal(signal.SIGTERM, _term)
        try:
            if args.trace:
                capture_trace(driver)
                return driver
            moves = 0
            while (args.endless or driver.episodes < args.ngames) \
                    and moves < args.max_moves:
                driver.step()
                moves += 1
        except KeyboardInterrupt:
            print("interrupted", file=sys.stderr)
        finally:
            if not args.benchmark and not args.trace:
                try:
                    driver.save(verbose=True)
                except Exception as e:  # noqa: BLE001 — device may be gone
                    print(f"final checkpoint failed ({e!r})", file=sys.stderr)
            if metrics is not None:
                metrics.close()
            if wd is not None:
                wd.stop()
                watchdog_mod.install(None)
        return driver

    sims = 1 if args.agent_type == "Random" else args.mcts_sims
    if args.agent_type == "ValueSimBayes":
        args.policy = "bayes"  # the agent IS the policy choice
    # reference-matching low/min_n defaults, overridable with --low
    if args.low is not None:
        low = args.low
    elif args.policy == "bayes":
        low = 10   # select_index_bayes min_n (core.py:290)
    elif args.agent_type in ("Vanilla", "VanillaC"):
        low = 5    # Vanilla.py low=5 (SURVEY §2.3)
    elif args.agent_type == "DistValueSim":
        low = 5    # select_trace_distributional low=5 (core_distributional.py:83)
    else:
        low = 1
    # online training runs iff the agent trains, --online is set, and we are
    # not in benchmark mode (reference gating, play.py:49 + ValueSim.py:109)
    benchmark = args.benchmark or not (trains and args.online)

    cfg = SelfPlayConfig(
        batch=args.batch, sims=sims, evaluator=evaluator,
        max_nodes=args.max_nodes, max_obs=args.max_obs,
        # open-addressing table: power of two (bitmask probing, tree.py:247)
        # and >= 2x max_obs (load factor cap) — round up for non-pow2 pools
        table_size=max(1 << (2 * args.max_obs - 1).bit_length(), 16),
        max_depth=args.max_depth,
        gamma=args.gamma, policy=args.policy, low=low,
        min_visits_store=args.min_visits,
        memory_size=args.memory_size, memory_growth=args.memory_growth,
        train_rows_trigger=args.train_rows, train_batch=args.train_batch,
        train_iters_per_val=args.train_iters_per_val,
        train_max_iters=args.train_max_iters,
        insert_kernel=bool(args.insert_kernel),
        select_kernel=bool(args.select_kernel), bf16=args.bf16,
        rollout_depth=args.rollout_depth,
        # persist after every training session (crash/timeout resilience);
        # --trace is a profiling probe and must never clobber checkpoints
        checkpoint_each_train=trains and not benchmark and not args.trace,
        benchmark=benchmark, dump_dir=args.dump_dir, seed=args.seed,
        allow_clamp=args.allow_clamp,
        episode_reuse=bool(args.episode_reuse),
        acc_policy=args.acc_policy,
        episodes_per_train=args.episodes_per_train,
        trim_fraction=args.trim_fraction,
        benchmark_every=0 if benchmark else args.benchmark_every,
        benchmark_games=args.benchmark_games,
        benchmark_sims=args.benchmark_sims,
        benchmark_batch=args.benchmark_batch,
        benchmark_max_moves=args.benchmark_max_moves,
        benchmark_max_nodes=args.benchmark_max_nodes,
        actions_per_drop=args.app, scoring=args.scoring,
        randomizer=args.randomizer,
    )
    is_vp = evaluator == "vp"
    is_dist = evaluator == "dist"
    # per-net default checkpoints (cli.resolve_ckpt): different nets' blobs
    # must never share a file
    from tetris_mcts_tpu.cli import resolve_ckpt

    if evaluator in _VP_EVALUATORS:
        ckpt = resolve_ckpt(args.checkpoint, "vp")
        if (args.load_model and ckpt != args.checkpoint
                and not os.path.isfile(ckpt)
                and os.path.isfile(DEFAULT_CKPT)):
            # pre-redirect runs saved VP blobs at the shared default path;
            # the kind of blob there is ambiguous, so point instead of load
            print(
                f"note: {ckpt} not found but {DEFAULT_CKPT} exists — if that "
                "file holds an older VP checkpoint, pass it explicitly with "
                "--checkpoint", file=sys.stderr,
            )
        model = VPModel(checkpoint_path=ckpt)
    elif is_dist:
        model = DistModel(checkpoint_path=resolve_ckpt(args.checkpoint,
                                                       "dist"))
    elif args.ensemble > 0:
        from tetris_mcts_tpu.train.ensemble import EnsembleVVModel

        model = EnsembleVVModel(
            n_models=args.ensemble,
            checkpoint_path=resolve_ckpt(args.checkpoint, "ens"),
        )
    else:
        model = VVModel(checkpoint_path=args.checkpoint)
    if args.load_model:
        model.load()

    saver = metrics = status = None
    if args.save:
        from tetris_mcts_tpu.utils.data import DataSaver
        saver = DataSaver(args.save_dir, args.save_file, cycle=args.cycle)
    if args.metrics:
        from tetris_mcts_tpu.obs.metrics import MetricsWriter
        metrics = MetricsWriter(args.metrics)
    if args.status_dir:
        from tetris_mcts_tpu.obs.metrics import StatusPublisher
        status = StatusPublisher(args.status_dir, batch=args.batch)
    if args.printboard:
        status = _PrintBoard(status)

    driver_cls = (
        VPSelfPlayDriver if is_vp
        else DistSelfPlayDriver if is_dist
        else S2SelfPlayDriver if evaluator == "s2"
        else SelfPlayDriver
    )
    driver = driver_cls(
        cfg, model=model, saver=saver, metrics=metrics, status=status
    )

    # convert SIGTERM (timeouts, schedulers) into the interrupt path so the
    # finally-block checkpoint save runs on managed shutdown
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)

    try:
        if args.trace:
            # inside the try so the finally-block flushes saver/metrics
            capture_trace(driver)
        elif args.endless:
            while True:
                driver.step()
        else:
            driver.run_episodes(args.ngames, max_moves=args.max_moves)
    except KeyboardInterrupt:
        print("interrupted", file=sys.stderr)
    finally:
        if args.save_tree:
            # node-saver channel (reference --save_tree -> agent.saver,
            # play.py:98-99): dump the searched observations at run end
            if not hasattr(driver, "save_nodes"):
                print("--save_tree: only VV-tree agents store (value, "
                      "variance) per observation; ignored", file=sys.stderr)
            else:
                try:
                    os.makedirs(args.save_dir, exist_ok=True)
                    driver.save_nodes(
                        os.path.join(args.save_dir, f"tree{args.cycle}.h5")
                    )
                except Exception as e:  # noqa: BLE001 — device may be gone
                    print(f"save_tree failed ({e!r})", file=sys.stderr)
        # a --trace session is a profiling probe: never clobber checkpoints.
        # The save itself may fail when the device died mid-run (params are
        # unreachable) — the per-session checkpoints already on disk are the
        # recovery point, and saver/metrics must still be flushed.
        if trains and not benchmark and not args.trace:
            try:
                model.save(verbose=True)
            except Exception as e:  # noqa: BLE001 — device may be gone
                print(f"final checkpoint failed ({e!r}); "
                      "last per-session checkpoint stands", file=sys.stderr)
        if saver is not None:
            saver.close()
        if metrics is not None:
            metrics.close()
        if wd is not None:
            wd.stop()
            watchdog_mod.install(None)
    return driver


if __name__ == "__main__":
    main()
