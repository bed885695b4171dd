"""Online self-play driver — the end-to-end slice of the framework.

Capability twin of the reference's main loop (`/root/reference/play.py:118-177`)
fused with the online-training agents (`agents/ValueSim.py:101-186`,
`agents/ValueSimLP.py`, `agents/Vanilla.py`): B games play MCTS moves in
lockstep inside ONE jitted XLA program per move; episode bookkeeping, the
growth-gated training trigger, checkpointing and metrics stay on the host
(thin, like the reference's Python layer).

Reference semantics preserved:
- training data = searched obs with visit >= min_visits and not terminal
  (`ValueSim.store_nodes`, ValueSim.py:122-159), harvested when a tree is
  retired (episode end or node-pool exhaustion — the batched analog of
  `remove_nodes`, agent.py:96-97);
- growth-gated training sessions: the n-th session trains on
  m_size = min(n * growth, memory_size) most recent rows
  (`ValueSim.train_nodes`, ValueSim.py:161-186; growth default 5000,
  memory_size 500000 per agent.cpp:838-842 scaled down by default here);
- benchmark mode plays with training and storage off
  (`--benchmark`, play.py:49, ValueSim.py:109);
- per-episode score/line reporting with min/max/mean/std tracking
  (`ScoreTracker`, play.py:8-40) in the same stderr format the reference's
  dashboards regex-parse (`web/parseLog.py:59-68`).
"""

from __future__ import annotations

import os
import sys
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.search import mcts
from tetris_mcts_tpu.search import tree as _tree
from tetris_mcts_tpu.search.mcts import SearchConfig
from tetris_mcts_tpu.search.tree import TreeConfig
from tetris_mcts_tpu.train.trainer import VVModel

_get_state_batch = jax.jit(engine.get_state_batch)
_unpack = jax.jit(engine.unpack_obs)


def _host_fetch(arrays):
    """ONE device->host sync for a tuple of arrays. On a multi-process mesh
    the jitted move program's batch-sharded outputs are not fully
    addressable on any one host and must be allgathered (small per-move
    arrays; every host then runs identical episode bookkeeping); replicated
    leaves (e.g. the replay counters) read locally."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return tuple(
            np.asarray(a) if getattr(a, "is_fully_addressable", True)
            else multihost_utils.process_allgather(a, tiled=True)
            for a in arrays
        )
    return jax.device_get(arrays)


class SelfPlayConfig(NamedTuple):
    """Driver configuration (union of the reference's play.py flags and the
    agent kwargs, `play.py:46-70`, `agent.cpp:838-842`)."""

    batch: int = 64                # games in lockstep (reference: 1)
    sims: int = 100                # MCTS simulations per move
    evaluator: str = "lp"          # "lp" | "leaf" | "rollout" (Vanilla) |
                                   # "hybrid"/"finite"/"full" (policy-guided
                                   # playouts, legacy *Sim agents)
    rollout_depth: int = 0         # policy-playout depth cap; 0 = the
                                   # reference default per agent (HybridSim
                                   # depth=30, FiniteSim depth=50, FullSim
                                   # to-game-end capped at 512)
    max_nodes: int = 4096
    max_obs: int = 4096
    table_size: int = 8192
    max_depth: int = 96
    gamma: float = 0.999
    policy: str = "clt"
    low: int = 1                   # unvisited-first threshold (TreeConfig.low;
                                   # reference check_low / min_n / Vanilla low)
    min_visits_store: int = 25     # min_visits_to_store (agent.cpp:839)
    memory_size: int = 100_000     # replay capacity (reference 500000)
    memory_growth: int = 5_000     # per-session growth gate (ValueSim.py:14)
    train_rows_trigger: int = 5_000  # new rows between training sessions
    train_batch: int = 128
    train_iters_per_val: int = 100
    train_max_iters: int = 50_000
    benchmark: bool = False        # no training, no storage
    # C++ OnlineMCTSAgent accumulation & trimming (agent.cpp:635-775).
    # acc_policy -1 (default) keeps the Python ValueSim growth-gated ring
    # (ValueSim.py:161-186); 0-3 switch to the C++ agent's semantics:
    #   0: train every episodes_per_train episodes; stochastic store drop
    #      tuned to fit memory; random trim on overflow (agent.cpp:635-661)
    #   1: same gate, weighted (lowest-visit) trim on overflow (:662-676)
    #   2: train on the episode gate OR memory full (:677-686)
    #   3: growth-gated on accumulated rows (:687-695)
    # All 0-3 clear the memory after each session (agent.cpp:703).
    acc_policy: int = -1
    episodes_per_train: int = 25   # policies 0-2 gate (agent.cpp:838)
    trim_fraction: float = 0.01    # trim percentile/fraction (:657,671)
    # Benchmark-game channel (reference cycle.sh:72 / --benchmark runs):
    # every `benchmark_every` episodes play `benchmark_games` completed games
    # at `benchmark_sims` with training+storage off, on a separate lazily
    # compiled benchmark driver sharing this driver's model.
    benchmark_every: int = 0       # 0 = channel off
    benchmark_games: int = 8
    benchmark_sims: int = 0        # 0 = 2x the training sims
    benchmark_batch: int = 0       # 0 = min(benchmark_games, batch)
    benchmark_max_moves: int = 5000
    benchmark_max_nodes: int = 0   # 0 = auto-scale for benchmark_sims
    allow_clamp: bool = False      # accept pools too small for one move
                                   # (degraded search) instead of raising
    episode_reuse: bool = False    # keep trees across episode boundaries
                                   # (reference update_root semantics): done
                                   # lanes re-root into the same pool; only
                                   # pool exhaustion harvests+resets
    insert_kernel: bool = True     # TreeConfig.insert_kernel passthrough
                                   # (default on since round 4 — measured
                                   # faster AND toggle-verified; see the
                                   # TreeConfig field comment)
    select_kernel: bool = True     # TreeConfig.select_kernel passthrough
    bf16: bool = False             # bfloat16 in-search NN forward (training
                                   # stays f32; see VVModel.apply_fn)
    checkpoint_each_train: bool = False  # persist the model after every
                                   # training session so a mid-run crash
                                   # (tunnel drop) loses at most one session
    dump_dir: str = ""             # write data/dump.npz per session
                                   # (reference ValueSim.py:176-177)
    seed: int = 0
    # env knobs (reference Tetris ctor, play.py:75)
    actions_per_drop: int = 1
    scoring: int = 0
    randomizer: int = 0


class EpisodeTracker:
    """`ScoreTracker` (play.py:8-40): running min/max/mean/std over episodes."""

    def __init__(self):
        self.n = 0
        self._sum = 0.0
        self._sumsq = 0.0
        self.min = float("inf")
        self.max = float("-inf")

    def add(self, v: float):
        self.n += 1
        self._sum += v
        self._sumsq += v * v
        self.min = min(self.min, v)
        self.max = max(self.max, v)

    @property
    def mean(self):
        return self._sum / self.n if self.n else 0.0

    @property
    def std(self):
        if self.n < 2:
            return 0.0
        return max(self._sumsq / self.n - self.mean**2, 0.0) ** 0.5


class _OnlineDriverBase:
    """Shared host loop of every online self-play driver: episode
    bookkeeping in the reference's log format, the growth-gated training
    trigger (`ValueSim.train_nodes`, ValueSim.py:161-186), and the run
    loops. Subclasses own the jitted move program and provide
    `_training_columns(order)` (the replay columns for one session)."""

    def _init_bookkeeping(self, cfg: SelfPlayConfig, log, saver, metrics,
                          status):
        self.cfg = cfg
        # Stall watchdog (runtime/watchdog.py): when one is installed
        # process-wide, every log line beats it (episodes, throughput,
        # training-val lines are all proof of host-loop progress) and the
        # known compile points arm grace windows. The benchmark twin driver
        # inherits the wrapped log, so its moves beat the same heartbeat.
        from tetris_mcts_tpu.runtime import watchdog as _wd

        self._watchdog = _wd.get_active()
        if self._watchdog is not None:
            log = self._watchdog.wrap_log(log)
        self.log = log
        self.saver = saver
        self.metrics = metrics
        self.status = status
        self.key = jax.random.PRNGKey(cfg.seed)
        # episode bookkeeping
        self._ep_id = np.arange(cfg.batch, dtype=np.int64)
        self._next_ep = cfg.batch
        self.episodes = 0
        self.moves = 0
        self.score_tracker = EpisodeTracker()
        self.line_tracker = EpisodeTracker()
        # training bookkeeping
        self.n_trains = 0
        self._rows_at_last_train = 0
        self._prev_total = 0
        self.train_history: list = []
        self.last_stats = None
        # C++ accumulation-policy bookkeeping (cfg.acc_policy >= 0)
        self._mem_rows = 0             # logical memory_index (agent.cpp)
        self._last_train_episode = 0
        self._ep_window: list = []     # (episodes, candidates) pairs
        self._cand_prev = 0
        self._last_ep_seen = 0
        self._drop_prob_host = 0.0
        self.trims = 0
        # benchmark-game channel
        self._bench = None
        self._eps_at_last_bench = 0
        self._bench_round = 0
        # actor-loop throughput (SURVEY §5 "per-phase timing in the actor
        # loop; report env-steps/s and sims/s per chip"): a rolling window
        # reset after every report AND every training session, so the
        # published sims/s is pure search time, not search+train blended
        self._tp_t0 = time.perf_counter()
        self._tp_moves = 0

    _TP_REPORT_EVERY = 50  # moves per throughput report
    _TP_REPORT_SECONDS = 120  # ... or by wall time (the window resets after
                              # every training session, so high-sims runs
                              # with frequent sessions would otherwise never
                              # accumulate 50 moves)

    def _report_throughput(self, force: bool = False):
        """Write one `throughput` metrics event per window: wall moves/s of
        the jitted move program and the derived sims/s (= moves/s · B · sims
        — bench.py's definition, so driver logs and bench numbers compare
        directly). `force=True` flushes the pending window (if >= 4 moves)
        without counting a move — called right before a training session or
        benchmark round resets the window: at the post-kernel-fix speeds
        the inter-session play gap (~15-25 s) is usually under the wall
        bar, so windows would otherwise almost never qualify (round 4: one
        event per 280 episodes)."""
        if force:
            if self._tp_moves < 4:
                return
        else:
            self._tp_moves += 1
            # When training sessions fire more often than the wall fallback
            # (heavy online cadence resets the window every ~30 s), no
            # window would ever report — accept any >=4-move window older
            # than 25 s.
            if self._tp_moves < self._TP_REPORT_EVERY and not (
                self._tp_moves >= 4
                and time.perf_counter() - self._tp_t0
                > min(self._TP_REPORT_SECONDS, 25.0)
            ):
                return
        dt = time.perf_counter() - self._tp_t0
        if dt > 0:
            moves_per_s = self._tp_moves / dt
            sims_per_s = moves_per_s * self.cfg.batch * self.cfg.sims
            ll = getattr(self, "_live_lines", None)
            live = ""
            if ll is not None:
                live = (f"  live lines mean/max {float(np.mean(ll)):.2f}/"
                        f"{int(np.max(ll))}")
            self.log(f"Throughput: {moves_per_s:8.2f} moves/s  "
                     f"{sims_per_s:12.1f} sims/s  (window {self._tp_moves} "
                     f"moves, batch {self.cfg.batch}, {self.cfg.sims} sims)"
                     + live)
            if self.metrics is not None:
                # config fields let consumers (bench.py parity_sims_per_s)
                # filter windows to the configuration they describe instead
                # of trusting everything appended to the shared stream
                self.metrics.write(
                    "throughput", moves=self.moves,
                    sims=self.cfg.sims, batch=self.cfg.batch,
                    max_nodes=self.cfg.max_nodes,
                    select_kernel=bool(self.cfg.select_kernel),
                    moves_per_s=round(moves_per_s, 3),
                    sims_per_s=round(sims_per_s, 1),
                    live_lines_mean=(None if ll is None
                                     else round(float(np.mean(ll)), 3)),
                    live_lines_max=(None if ll is None
                                    else int(np.max(ll))),
                )
        self._tp_t0 = time.perf_counter()
        self._tp_moves = 0

    def _after_move(self, stats, envs_prev):
        """Host bookkeeping for one move. ONE device->host sync fetches
        everything the loop needs — each separate `np.asarray` through the
        tunnel costs a ~25 ms round trip (CLAUDE.md)."""
        self.moves += 1
        if self._watchdog is not None:
            self._watchdog.beat()
        self.last_stats = stats
        done, score, lines, total, cand = _host_fetch(
            (stats.done, stats.score, stats.lines, self.replay.total,
             getattr(self.replay, "cand", np.int32(0)))
        )
        self._live_lines, self._live_score = lines, score
        self._publish(stats, envs_prev)
        self._report_throughput()
        self._finish_episodes(done, score, lines)
        if not self.cfg.benchmark:
            if self.cfg.acc_policy < 0:
                self._maybe_train(int(total))
            else:
                self._acc_policy_step(int(total), int(cand))
            self._maybe_benchmark()
        return stats

    def _publish(self, stats, envs):
        """`--save` / status channels, fed from the PRE-move env state: the
        reference records the board the policy/action/value were computed
        from, before `game.play` advances the game (play.py:118-148 order:
        agent.play -> save/GUI/memmap -> game.play). One batched device_get
        fetches every published array in a single tunnel round trip."""
        if self.saver is None and self.status is None:
            return
        cs, var = self._saver_extras(stats)
        boards, combo, score, lines, line_stats, probs, action, rv, cs, var = (
            jax.device_get((
                _get_state_batch(envs), envs.combo, envs.score, envs.lines,
                envs.line_stats, stats.probs, stats.action, stats.root_value,
                cs, var,
            ))
        )
        if self.saver is not None:
            self.saver.add_batch(
                episode=self._ep_id.copy(), board=boards.astype(np.int8),
                policy=probs, action=action,
                combo=combo, lines=lines, line_stats=line_stats, score=score,
                child_stats=cs, value=rv, variance=var,
            )
        if self.status is not None:
            self.status.publish(boards[0], combo, score, lines, line_stats)

    def _saver_extras(self, stats):
        """Hook: (child_stats[B,3,7], variance[B]) saver columns — the VV
        driver has them in its MoveStats; VP/Dist save zeros (no variance
        statistics in those cores)."""
        B = self.cfg.batch
        return np.zeros((B, 3, 7), np.float32), np.zeros(B, np.float32)

    def _finish_episodes(self, done, score, lines):
        if not done.any():
            return
        for i in np.nonzero(done)[0]:
            self.episodes += 1
            self._ep_id[i] = self._next_ep
            self._next_ep += 1
            self.score_tracker.add(float(score[i]))
            self.line_tracker.add(float(lines[i]))
            # reference episode line (play.py:164 field order) — the
            # dashboards regex-parse "Episode: Score: Lines Cleared:"
            # (web/parseLog.py:59-61); tracker stats append after
            self.log(
                f"Episode:{self.episodes:6d}  "
                f"Score:{int(score[i]):10d}  Lines Cleared:{int(lines[i]):5d}  "
                f"lines(min/max/mean):{self.line_tracker.min:.0f}/"
                f"{self.line_tracker.max:.0f}/{self.line_tracker.mean:.2f}  "
                f"score(mean±std):{self.score_tracker.mean:.1f}"
                f"±{self.score_tracker.std:.1f}"
            )
            if self.metrics is not None:
                self.metrics.write(
                    "episode", n=self.episodes, lines=int(lines[i]),
                    score=int(score[i]), benchmark=self.cfg.benchmark,
                )

    @property
    def total_rows(self) -> int:
        """Rows ever harvested into the replay ring (device-side monotone
        counter; survives full ring wraps)."""
        return int(self.replay.total)

    def _maybe_train(self, total_rows: int):
        # Storage sanity: an online driver that has retired whole episodes
        # yet harvested ZERO rows is broken (e.g. a miscompiled device
        # kernel producing garbage walks — seen on TPU at certain pool
        # shapes, runs/campaign2/*_brokenselect) — warn LOUDLY instead of
        # silently never training.
        # Fire within ONE batch-generation of episodes (or a fixed move
        # budget if episodes finish slowly), not 3x — at campaign scale the
        # old 3*batch gate meant hours of silently garbage search before the
        # warning that exists to catch exactly that (VERDICT r2 item 5).
        if (total_rows == 0
                and (self.episodes >= self.cfg.batch
                     or (self.episodes > 0 and self.moves >= 1000))
                and not getattr(self, "_storage_warned", False)):
            self._storage_warned = True
            self.log(
                f"WARNING: {self.episodes} episodes / {self.moves} moves "
                "finished but the replay ring holds ZERO rows — the search "
                "is likely broken (min_visits too high, or a miscompiled "
                "device kernel; try --select_kernel 0). Training will "
                "never trigger."
            )
            if self.metrics is not None:
                self.metrics.write(
                    "zero_storage_warning", episodes=self.episodes,
                    moves=self.moves,
                )
        # `total_rows` is the ring's device-side monotone written counter —
        # unlike an idx delta it survives harvests larger than the capacity
        if total_rows - self._prev_total > self.cfg.memory_size:
            self.log(
                "warning: one move harvested more rows than memory_size; "
                "the ring overwrote itself and the excess was lost"
            )
        self._prev_total = total_rows
        if total_rows - self._rows_at_last_train < self.cfg.train_rows_trigger:
            return
        self._report_throughput(force=True)  # flush before the reset
        if self.train():
            self._rows_at_last_train = total_rows
            # restart the throughput window: training wall time is not
            # search time
            self._tp_t0 = time.perf_counter()
            self._tp_moves = 0
        # on a skip (not enough rows yet) the trigger stays armed and
        # retries next move instead of waiting another full trigger window

    def train(self):
        """One training session with reference growth-gating
        (`ValueSim.train_nodes`, ValueSim.py:161-186). Returns False when
        skipped for lack of rows."""
        m_size = min((self.n_trains + 1) * self.cfg.memory_growth,
                     self.cfg.memory_size)
        # the gate can open below one minibatch when memory_growth is small;
        # clamp up so such configs still train (the reference never hits
        # this: growth 5000 >> batch 1024)
        m_size = max(m_size, self.cfg.train_batch)
        use = min(m_size, int(self.replay.count))
        return self._run_training_session(use)

    def _run_training_session(self, use):
        """Train on the newest `use` ring rows, bucketed to power-of-two
        multiples of train_batch (plus the exact memory cap): every distinct
        `use` SHAPE compiles a new train-chunk/eval program through the slow
        remote-compile path (~a minute per shape on TPU), so the whole run
        pays at most ~log2(memory/batch) compiles instead of one per
        session. Returns False when there aren't enough rows for one
        minibatch."""
        if self._watchdog is not None:
            # a session with a new bucket shape compiles a fresh train-chunk
            # program (~a minute per shape through the remote-compile path);
            # allow one compile-scale window until the first val log beats
            self._watchdog.grace()
        count = int(self.replay.count)
        cap = self.cfg.memory_size - self.cfg.memory_size % self.cfg.train_batch
        use = min(use, count)
        use -= use % self.cfg.train_batch
        if use < self.cfg.train_batch:
            self.log(f"Training session {self.n_trains + 1}: only {count} "
                     "rows, skipped")
            return False
        pad = 0
        if use < cap:
            bucket = self.cfg.train_batch
            while bucket * 2 <= use:
                bucket *= 2
            if self.cfg.acc_policy >= 0 and use > bucket:
                # fresh-clear mode (C++ accumulation policies): the memory
                # is wiped after this session, so rounding DOWN would throw
                # away up to half the fresh rows untrained. Round UP to the
                # next bucket and pad the FRONT with duplicated oldest rows
                # (the validation tail stays pure newest rows; a duplicate
                # among 10^5 rows is statistical noise). The sliding-window
                # mode (-1) keeps rounding down — its older rows were
                # already trained in earlier sessions.
                pad = min(bucket * 2, cap) - use
            else:
                use = min(bucket, cap)
        self.n_trains += 1

        # most recent `use` rows of the ring; boards stored bit-packed in
        # the move program, unpacked to images only here (training prep)
        idx = int(self.replay.idx)
        cap = self.cfg.memory_size
        order = (np.arange(idx - use, idx) % cap).astype(np.int32)
        if pad:
            order = np.concatenate([order[:pad], order]).astype(np.int32)
            use += pad
        data = self._training_columns(order)

        self.log(
            f"Training session {self.n_trains}: {use} rows "
            f"(memory {count}/{cap})"
        )
        self._dump_training_data(data)
        t0 = time.time()
        hist = self.model.train_data(
            data,
            batch_size=self.cfg.train_batch,
            iters_per_val=self.cfg.train_iters_per_val,
            max_iters=self.cfg.train_max_iters,
            shuffle=True,
            log=self.log,
        )
        self.train_history.append(hist)
        self.log(f"Training session {self.n_trains} done in "
                 f"{time.time() - t0:.1f}s")
        if self.cfg.checkpoint_each_train:
            self.model.save()
        if self.metrics is not None:
            last = hist[-1] if hist else (0, float("nan"), float("nan"), 0.0)
            self.metrics.write(
                "train_session", n=self.n_trains, rows=use,
                seconds=time.time() - t0, iters=last[0],
                loss_train=last[1], loss_val=last[2],
                grad_norm=last[4] if len(last) > 4 else None,
            )
        return True

    def _dump_training_data(self, data):
        """Hook: per-session training-set dump (VV driver implements it)."""

    # ------------------------------------------------------- C++ accumulation
    def _acc_policy_step(self, total: int, cand: int):
        """One move's worth of the C++ OnlineMCTSAgent accumulation logic
        (agent.cpp:635-708), re-expressed for the batched driver: the GC
        event becomes the per-move check, `current_episode` the driver's
        completed-episode counter, and `memory_index` the logical
        rows-since-last-clear (`self._mem_rows`). Golden-tested against a
        NumPy transcription in tests/test_replay_policy.py."""
        cfg = self.cfg
        # clamp at capacity: the C++ buffer STOPS storing at memory_size
        # (agent.cpp:817 break) where the ring wraps (newest-wins) — the
        # logical fill level saturates identically either way
        self._mem_rows = min(self._mem_rows + total - self._prev_total,
                             cfg.memory_size)
        self._prev_total = total

        if cfg.acc_policy == 0 and self.episodes > self._last_ep_seen:
            # refresh memory_drop_prob from the candidate rate of the last
            # episodes_per_train episodes (agent.cpp:637-647; `cand` counts
            # pre-drop store candidates, the reference's accumulated_nodes)
            self._ep_window.append(
                (self.episodes - self._last_ep_seen, cand - self._cand_prev)
            )
            self._cand_prev = cand
            self._last_ep_seen = self.episodes
            while (sum(e for e, _ in self._ep_window[1:])
                   >= cfg.episodes_per_train):
                self._ep_window.pop(0)
            sum_e = sum(e for e, _ in self._ep_window)
            sum_c = sum(c for _, c in self._ep_window)
            est = sum_c * (cfg.episodes_per_train / max(sum_e, 1))
            p_drop = max(0.0, 1.0 - cfg.memory_size / max(est, 1.0))
            if abs(p_drop - self._drop_prob_host) > 1e-3:
                self.replay = self.replay._replace(
                    drop_prob=jnp.float32(p_drop))
                self._drop_prob_host = p_drop
                self.log(
                    f"Average nodes stored per episode: "
                    f"{sum_c / max(sum_e, 1):.0f}    "
                    f"Memory dropping probability: {p_drop:.4f}"
                )

        diff = self.episodes - self._last_train_episode
        full = self._mem_rows >= cfg.memory_size
        p = cfg.acc_policy
        if p in (0, 1):
            do_train = diff >= cfg.episodes_per_train
            if not do_train and full:
                if p == 0:
                    self.key, k = jax.random.split(self.key)
                    self.replay, dropped = mcts.replay_trim_random(
                        self.replay, cfg.trim_fraction, k)
                else:
                    self.replay, dropped = mcts.replay_trim_weighted(
                        self.replay, cfg.trim_fraction)
                dropped = int(dropped)
                self.trims += 1
                self._mem_rows = max(self._mem_rows - dropped, 0)
                self.log(
                    "Memory limit exceeded, trimming memory "
                    f"({'random' if p == 0 else 'weighted'}: {dropped} rows; "
                    f"memory {self._mem_rows}/{cfg.memory_size})"
                )
        elif p == 2:
            do_train = diff >= cfg.episodes_per_train or full
        elif p == 3:
            m_size = min(self.n_trains * cfg.memory_growth, cfg.memory_size)
            # the n_trains=0 gate is 0 (agent.cpp:687) — require at least
            # one minibatch so the pre-first-harvest moves don't attempt
            # (and log) a skipped session every move
            do_train = self._mem_rows >= max(m_size, cfg.train_batch)
        else:
            raise ValueError(f"acc_policy {p} not in -1..3")

        if do_train:
            self._report_throughput(force=True)  # flush before the reset
        if do_train and self._run_training_session(
                min(self._mem_rows, cfg.memory_size)):
            # memory_index = 0 after a session (agent.cpp:703)
            self.replay = self.replay._replace(
                idx=jnp.int32(0), count=jnp.int32(0))
            self._mem_rows = 0
            self._last_train_episode = self.episodes
            self._tp_t0 = time.perf_counter()
            self._tp_moves = 0

    # --------------------------------------------------- benchmark channel
    def _bench_ctor_kwargs(self) -> dict:
        """Hook: extra ctor kwargs the benchmark twin needs (Dist overrides)."""
        return {}

    def _reinit_games(self, seed: int):
        """Fresh (trees, envs) with a new seed — subclass provides."""
        raise NotImplementedError

    def reset_games(self, seed: int):
        """Fresh games + episode bookkeeping (benchmark rounds start clean)."""
        self._reinit_games(seed)
        self._ep_id = np.arange(self.cfg.batch, dtype=np.int64)
        self._next_ep = self.cfg.batch
        self.episodes = 0
        self.score_tracker = EpisodeTracker()
        self.line_tracker = EpisodeTracker()
        self.key = jax.random.PRNGKey(seed)

    def _maybe_benchmark(self):
        """Reference benchmark-game channel (cycle.sh:72, ValueSim.py:109):
        every benchmark_every completed episodes, play benchmark_games
        completed games at benchmark_sims on a lazily built benchmark twin
        (training and storage off, shared model), and emit one `benchmark`
        metrics event with the round's line/score statistics."""
        cfg = self.cfg
        if cfg.benchmark_every <= 0 or getattr(self, "_bench_broken", False):
            return
        if self.episodes - self._eps_at_last_bench < cfg.benchmark_every:
            return
        self._report_throughput(force=True)  # flush before the reset
        self._eps_at_last_bench = self.episodes
        self._bench_round += 1
        try:
            self._run_benchmark_round()
        except Exception as e:  # noqa: BLE001 — a broken benchmark twin
            # (e.g. a pool shape the kernel compiler rejects) must not kill
            # a multi-hour training run; log, disable the channel, continue.
            self._bench_broken = True
            self._bench = None
            self.log(f"Benchmark channel DISABLED after error: {e!r}")
            self._tp_t0 = time.perf_counter()
            self._tp_moves = 0

    def _run_benchmark_round(self):
        cfg = self.cfg
        if self._bench is None:
            bsims = cfg.benchmark_sims or 2 * cfg.sims
            bbatch = cfg.benchmark_batch or min(cfg.benchmark_games, cfg.batch)
            auto_nodes = max(cfg.max_nodes, 1 << (8 * bsims - 1).bit_length())
            bnodes = cfg.benchmark_max_nodes or auto_nodes
            bcfg = cfg._replace(
                batch=bbatch, sims=bsims, benchmark=True,
                max_nodes=bnodes, max_obs=max(cfg.max_obs, bnodes),
                # pow2 (bitmask probing) and >= 2x the obs pool
                table_size=max(
                    cfg.table_size,
                    1 << (2 * max(cfg.max_obs, bnodes) - 1).bit_length(),
                ),
                memory_size=max(cfg.train_batch, 1024),
                benchmark_every=0,
            )
            self.log(
                f"Benchmark channel: building twin driver (batch {bbatch}, "
                f"{bsims} sims, {bnodes} nodes)"
            )
            self._bench = type(self)(
                bcfg, model=self.model, log=self.log, metrics=self.metrics,
                **self._bench_ctor_kwargs(),
            )
        bench = self._bench
        bench.reset_games(cfg.seed + 7777 * self._bench_round)
        if self._watchdog is not None:
            # the twin's first move compiles the benchmark-shape program
            # (minutes); later rounds reuse it and this grace is a no-op by
            # the twin's first beat
            self._watchdog.grace()
        t0 = time.time()
        bench.run_episodes(cfg.benchmark_games,
                           max_moves=cfg.benchmark_max_moves)
        lt, st = bench.line_tracker, bench.score_tracker
        if lt.n == 0:
            self.log(
                f"Benchmark round {self._bench_round}: no game finished "
                f"within {cfg.benchmark_max_moves} moves "
                f"[{time.time() - t0:.1f}s]"
            )
            self._tp_t0 = time.perf_counter()
            self._tp_moves = 0
            return
        self.log(
            f"Benchmark round {self._bench_round} ({lt.n} games, "
            f"{bench.cfg.sims} sims): lines {lt.mean:.2f}±{lt.std:.2f} "
            f"(min {lt.min:.0f} max {lt.max:.0f})  score {st.mean:.1f}"
            f"±{st.std:.1f}  [{time.time() - t0:.1f}s]"
        )
        if self.metrics is not None:
            # snapshot the EXACT net this round measured (training runs
            # between a benchmark event and any external watcher's copy,
            # so a file-watcher snapshot could contain post-benchmark
            # updates) — keyed (run, round) like the event itself, and the
            # event records the filename so the snapshot↔score mapping
            # lives in the stream alone (VERDICT r4 weak 5; the
            # snapshot_watch.sh fallback watcher is retired)
            snap_name = None
            if self.cfg.checkpoint_each_train:
                root, ext = os.path.splitext(self.model.checkpoint_path)
                snap = f"{root}.bench{self.metrics.run}_{self._bench_round}{ext}"
                try:
                    self.model.save(snap)
                    snap_name = os.path.basename(snap)
                except OSError as e:
                    self.log(f"benchmark snapshot failed ({e!r})")
            self.metrics.write(
                "benchmark", round=self._bench_round, episode=self.episodes,
                games=lt.n, sims=bench.cfg.sims,
                lines_mean=round(lt.mean, 3), lines_std=round(lt.std, 3),
                lines_min=lt.min, lines_max=lt.max,
                score_mean=round(st.mean, 2), score_std=round(st.std, 2),
                snapshot=snap_name,
            )
        # benchmark wall time is not search time
        self._tp_t0 = time.perf_counter()
        self._tp_moves = 0

    def run(self, n_moves: int):
        for _ in range(n_moves):
            self.step()

    def run_episodes(self, n_episodes: int, max_moves: int = 10_000_000):
        target = self.episodes + n_episodes
        moves = 0
        while self.episodes < target and moves < max_moves:
            self.step()
            moves += 1


class SelfPlayDriver(_OnlineDriverBase):
    """Owns the model, the batched (trees, envs, replay) device state, and the
    jitted move program. `run(n_moves)` / `run_episodes(n)` advance self-play;
    training sessions fire automatically from the growth gate."""

    POLICY_ROLLOUT_EVALUATORS = ("hybrid", "finite", "full")

    def __init__(self, cfg: SelfPlayConfig, model: Optional[VVModel] = None,
                 log=lambda s: print(s, file=sys.stderr, flush=True),
                 saver=None, metrics=None, status=None):
        """`saver`: utils.data.DataSaver — per-move rows (reference `--save`,
        play.py:127-137). `metrics`: obs.metrics.MetricsWriter. `status`:
        obs.metrics.StatusPublisher (reference memmap protocol).

        The policy-playout evaluators (hybrid/finite/full) take a VPModel —
        the legacy rollout agents ran on the (v, p) net (`HybridSim.py:38`
        `evaluate_state` -> v, p)."""
        self._init_bookkeeping(cfg, log, saver, metrics, status)
        if model is None:
            if cfg.evaluator in self.POLICY_ROLLOUT_EVALUATORS:
                from tetris_mcts_tpu.train.trainer import VPModel
                model = VPModel()
            else:
                model = VVModel()
        self.model = model
        self._no_ubound = jnp.zeros(2, jnp.float32)

        tree_cfg = TreeConfig(
            max_nodes=cfg.max_nodes, max_obs=cfg.max_obs,
            table_size=cfg.table_size, max_depth=cfg.max_depth,
            gamma=cfg.gamma, policy=cfg.policy, low=cfg.low,
            insert_kernel=cfg.insert_kernel,
            select_kernel=cfg.select_kernel,
            env=engine.EnvConfig(
                actions_per_drop=cfg.actions_per_drop,
                scoring=cfg.scoring, randomizer=cfg.randomizer,
            ),
        )
        self.search_cfg = SearchConfig(
            tree=tree_cfg, sims=cfg.sims, evaluator=cfg.evaluator,
            allow_clamp=cfg.allow_clamp,
        )

        apply_fn = self.model.apply_fn(jnp.bfloat16 if cfg.bf16 else None)
        if cfg.evaluator == "lp":
            evaluator = mcts.nn_child_evaluator(apply_fn)
        elif cfg.evaluator == "leaf":
            evaluator = mcts.nn_leaf_evaluator(apply_fn)
        elif cfg.evaluator == "rollout":
            evaluator = mcts.rollout_evaluator(self.search_cfg)
        elif cfg.evaluator in self.POLICY_ROLLOUT_EVALUATORS:
            # reference playout depths: HybridSim.py:10 depth=30,
            # FiniteSim.py:9 depth=50, FullSim to game end (capped by the
            # fixed-shape program at rollout_cap)
            depth = cfg.rollout_depth or {
                "hybrid": 30, "finite": 50,
                "full": self.search_cfg.rollout_cap,
            }[cfg.evaluator]
            evaluator = mcts.policy_rollout_evaluator(
                apply_fn, self.search_cfg, depth,
                bootstrap=cfg.evaluator == "hybrid",
            )
        else:
            raise ValueError(f"unknown evaluator {cfg.evaluator!r}")

        move = mcts.make_move_fn(
            evaluator, self.search_cfg,
            min_visits_store=cfg.min_visits_store,
            store=not cfg.benchmark,
            store_drop=cfg.acc_policy == 0,
            episode_reuse=cfg.episode_reuse,
        )
        # NOTE: no donate_argnums — trees.root_state and envs alias the same
        # output buffers (advance_root stores the stepped env state), and XLA
        # rejects donating one buffer twice.
        self._move = jax.jit(move)

        self.trees, self.envs = mcts.init_batch(cfg.seed, cfg.batch, self.search_cfg)
        self.replay = mcts.init_replay(cfg.memory_size)

    def _reinit_games(self, seed: int):
        self.trees, self.envs = mcts.init_batch(
            seed, self.cfg.batch, self.search_cfg)

    # ------------------------------------------------------------------ moves
    def step(self):
        """One batched move (B games advance one action each)."""
        self.key, sub = jax.random.split(self.key)
        envs_prev = self.envs
        # VPModel (the policy-playout evaluators) has no output bounds; the
        # move program's ubound slot is only read by the VV evaluators
        ubound = getattr(self.model, "ubound", self._no_ubound)
        self.trees, self.envs, self.replay, stats = self._move(
            self.model.params, ubound,
            self.trees, self.envs, self.replay, sub,
        )
        return self._after_move(stats, envs_prev)

    def _saver_extras(self, stats):
        return stats.child_stats, stats.root_var

    def _training_columns(self, order):
        states = np.asarray(_unpack(self.replay.boards[jnp.asarray(order)]))
        return [
            states,
            np.asarray(self.replay.value)[order],
            np.asarray(self.replay.var)[order],
            np.asarray(self.replay.weight)[order],
        ]

    def _dump_training_data(self, data):
        if not self.cfg.dump_dir:
            return
        # training-set dump for the offline tools (reference
        # ValueSim.train_nodes, ValueSim.py:176-177; consumed by
        # `tools train_dump`)
        import os
        os.makedirs(self.cfg.dump_dir, exist_ok=True)
        states, value, var, weight = data
        np.savez(
            os.path.join(self.cfg.dump_dir, "dump"),
            states=states, values=value, variance=var, weights=weight,
        )

    def save_nodes(self, path: str, min_visits: int = 1):
        """Dump the current searched observations of every tree to HDF5
        (the reference's `TreeAgent.save_nodes` node-saver channel,
        agents/agent.py:259-289): board image, value, variance, visit count
        per live obs slot, tagged by game index."""
        import h5py

        packed, val, var, w, mask = jax.vmap(
            lambda t: _tree.harvest(t, min_visits, self.search_cfg.tree)
        )(self.trees)
        mask = np.asarray(mask)
        boards = np.asarray(_unpack(packed))
        val, var, w = map(np.asarray, (val, var, w))
        game_idx = np.broadcast_to(
            np.arange(mask.shape[0])[:, None], mask.shape
        )
        sel = mask.reshape(-1)
        with h5py.File(path, "w") as f:
            f.create_dataset("board", data=boards.reshape(-1, 20, 10)[sel])
            f.create_dataset("value", data=val.reshape(-1)[sel])
            f.create_dataset("variance", data=var.reshape(-1)[sel])
            f.create_dataset("visit", data=w.reshape(-1)[sel])
            f.create_dataset("game", data=game_idx.reshape(-1)[sel])
        self.log(f"saved {int(sel.sum())} nodes to {path}")


class VPSelfPlayDriver(_OnlineDriverBase):
    """ApproxPolicyIter-equivalent driver: policy-sampled selection,
    value+policy backup, VP net online training (reference
    `agents/ApproxPolicyIter.py`; same host loop as SelfPlayDriver)."""

    def __init__(self, cfg: SelfPlayConfig, model=None,
                 log=lambda s: print(s, file=sys.stderr, flush=True),
                 saver=None, metrics=None, status=None):
        from tetris_mcts_tpu.search import vp as VP
        from tetris_mcts_tpu.train.trainer import VPModel

        self._init_bookkeeping(cfg, log, saver, metrics, status)
        self.model = model or VPModel()
        self._VP = VP

        tree_cfg = TreeConfig(
            max_nodes=cfg.max_nodes, max_obs=cfg.max_obs,
            table_size=cfg.table_size, max_depth=cfg.max_depth,
            gamma=cfg.gamma, policy=cfg.policy, low=cfg.low,
            insert_kernel=cfg.insert_kernel,
            select_kernel=cfg.select_kernel,
            env=engine.EnvConfig(
                actions_per_drop=cfg.actions_per_drop,
                scoring=cfg.scoring, randomizer=cfg.randomizer,
            ),
        )
        self.search_cfg = SearchConfig(tree=tree_cfg, sims=cfg.sims, allow_clamp=cfg.allow_clamp)

        move = VP.make_vp_move_fn(
            self.model.apply_fn(jnp.bfloat16 if cfg.bf16 else None),
            self.search_cfg,
            min_visits_store=cfg.min_visits_store,
            store=not cfg.benchmark,
        )
        self._move = jax.jit(move)  # no donation: root_state/envs alias
        self.vtrees, self.envs = VP.init_vp_batch(
            cfg.seed, cfg.batch, self.search_cfg
        )
        self.replay = VP.init_vp_replay(cfg.memory_size)

    def _reinit_games(self, seed: int):
        self.vtrees, self.envs = self._VP.init_vp_batch(
            seed, self.cfg.batch, self.search_cfg)

    def step(self):
        self.key, sub = jax.random.split(self.key)
        envs_prev = self.envs
        self.vtrees, self.envs, self.replay, stats = self._move(
            self.model.params, self.vtrees, self.envs, self.replay, sub
        )
        return self._after_move(stats, envs_prev)

    def _training_columns(self, order):
        return [
            np.asarray(_unpack(self.replay.boards[jnp.asarray(order)])),
            np.asarray(self.replay.value)[order],
            np.asarray(self.replay.policy)[order],
            np.asarray(self.replay.weight)[order],
        ]


class S2SelfPlayDriver(_OnlineDriverBase):
    """ValueSim2-equivalent driver (the reference agent rebuilt in spirit —
    SURVEY §2.3 marks it LEGACY/BROKEN): stochastic-transition edge
    statistics + `select_index_2` UCB selection (`search/stochastic.py`),
    single-leaf VV evaluation, no training (the reference agent never
    trained)."""

    def __init__(self, cfg: SelfPlayConfig, model=None,
                 log=lambda s: print(s, file=sys.stderr, flush=True),
                 saver=None, metrics=None, status=None):
        from tetris_mcts_tpu.search import stochastic as S2

        self._init_bookkeeping(cfg, log, saver, metrics, status)
        self.model = model or VVModel()
        self._S2 = S2

        tree_cfg = TreeConfig(
            max_nodes=cfg.max_nodes, max_obs=cfg.max_obs,
            table_size=cfg.table_size, max_depth=cfg.max_depth,
            gamma=cfg.gamma, policy=cfg.policy, low=cfg.low,
            insert_kernel=cfg.insert_kernel,
            select_kernel=cfg.select_kernel,
            env=engine.EnvConfig(
                actions_per_drop=cfg.actions_per_drop,
                scoring=cfg.scoring, randomizer=cfg.randomizer,
            ),
        )
        self.search_cfg = SearchConfig(tree=tree_cfg, sims=cfg.sims, allow_clamp=cfg.allow_clamp)

        move = S2.make_s2_move_fn(
            self.model.apply_fn(jnp.bfloat16 if cfg.bf16 else None),
            self.search_cfg,
            min_visits_store=cfg.min_visits_store,
            store=not cfg.benchmark,
        )
        self._move = jax.jit(move)
        self.s2trees, self.envs = S2.init_s2_batch(
            cfg.seed, cfg.batch, self.search_cfg
        )
        self.replay = mcts.init_replay(cfg.memory_size)

    def _reinit_games(self, seed: int):
        self.s2trees, self.envs = self._S2.init_s2_batch(
            seed, self.cfg.batch, self.search_cfg)

    def step(self):
        self.key, sub = jax.random.split(self.key)
        envs_prev = self.envs
        self.s2trees, self.envs, self.replay, stats = self._move(
            self.model.params, self.model.ubound,
            self.s2trees, self.envs, self.replay, sub,
        )
        return self._after_move(stats, envs_prev)

    def _training_columns(self, order):
        states = np.asarray(_unpack(self.replay.boards[jnp.asarray(order)]))
        return [
            states,
            np.asarray(self.replay.value)[order],
            np.asarray(self.replay.var)[order],
            np.asarray(self.replay.weight)[order],
        ]


class DistSelfPlayDriver(_OnlineDriverBase):
    """DistValueSimOnline-equivalent driver (the reference agent rebuilt
    working — SURVEY.md Appendix A marks it BROKEN): C51 distributional tree
    search + online training of the distribution net on harvested target
    distributions."""

    def __init__(self, cfg: SelfPlayConfig, model=None, atoms: int = 50,
                 vmax: float = 1000.0,
                 log=lambda s: print(s, file=sys.stderr, flush=True),
                 saver=None, metrics=None, status=None):
        from tetris_mcts_tpu.search import distributional as DD
        from tetris_mcts_tpu.train.trainer import DistModel

        self._init_bookkeeping(cfg, log, saver, metrics, status)
        self.model = model or DistModel(atoms=atoms)
        self._DD = DD
        self.dcfg = DD.DistConfig(atoms=atoms, vmax=vmax, low=cfg.low)

        tree_cfg = TreeConfig(
            max_nodes=cfg.max_nodes, max_obs=cfg.max_obs,
            table_size=cfg.table_size, max_depth=cfg.max_depth,
            gamma=cfg.gamma, policy=cfg.policy, low=cfg.low,
            insert_kernel=cfg.insert_kernel,
            select_kernel=cfg.select_kernel,
            env=engine.EnvConfig(
                actions_per_drop=cfg.actions_per_drop,
                scoring=cfg.scoring, randomizer=cfg.randomizer,
            ),
        )
        self.search_cfg = SearchConfig(tree=tree_cfg, sims=cfg.sims, allow_clamp=cfg.allow_clamp)

        move = DD.make_dist_move_fn(
            self.model.apply_fn(jnp.bfloat16 if cfg.bf16 else None),
            self.search_cfg, self.dcfg,
            min_visits_store=cfg.min_visits_store,
            store=not cfg.benchmark,
        )
        self._move = jax.jit(move)
        self.dtrees, self.envs = DD.init_dist_batch(
            cfg.seed, cfg.batch, self.search_cfg, self.dcfg
        )
        self.replay = DD.init_dist_replay(cfg.memory_size, atoms)

    def _reinit_games(self, seed: int):
        self.dtrees, self.envs = self._DD.init_dist_batch(
            seed, self.cfg.batch, self.search_cfg, self.dcfg)

    def _bench_ctor_kwargs(self):
        return dict(atoms=self.dcfg.atoms, vmax=self.dcfg.vmax)

    def step(self):
        self.key, sub = jax.random.split(self.key)
        envs_prev = self.envs
        self.dtrees, self.envs, self.replay, stats = self._move(
            self.model.params, self.dtrees, self.envs, self.replay, sub
        )
        return self._after_move(stats, envs_prev)

    def _training_columns(self, order):
        return [
            np.asarray(_unpack(self.replay.boards[jnp.asarray(order)])),
            np.asarray(self.replay.dist)[order],
            np.asarray(self.replay.weight)[order],
        ]
