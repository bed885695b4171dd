"""Batched DQN agent (the reference's self-contained `agents/DQN.py`,
SURVEY.md §2.3) — rebuilt TPU-native: B envs step in lockstep and the whole
agent step (ε-greedy act → env step → transition write → uniform minibatch →
TD/C51 update) compiles into ONE jitted program per move.

Reference semantics preserved (`agents/DQN.py`):
- per-env-step training: one minibatch SGD update per move (`update_root`,
  `:207-240` trains each step once memory is non-empty);
- ε anneals linearly from eps_init to eps_final with memory fill (`:185`);
- target network synced every `target_update_steps` updates (`:146-153`);
- standard head: y = r + γ·max_a Q_target(s') with SmoothL1 (`:190-199`);
- distributional (C51) head: Bellman-projected categorical target with
  cross-entropy (`:157-187`), vectorized here instead of the reference's
  per-sample Python loops.

Deviation (documented): boards are the engine's 20x10 (the reference DQN
used 22x10 relics); transitions are stored bit-packed.
"""

from __future__ import annotations

import os
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.models.nets import DistQNet, N_ACTIONS, QNet


class DQNConfig(NamedTuple):
    batch: int = 64                 # envs in lockstep (reference: 1)
    memory_size: int = 100_000
    gamma: float = 0.99
    eps_init: float = 1.0
    eps_final: float = 0.01
    train_batch: int = 32
    target_update_steps: int = 100
    distributional: bool = False
    atoms: int = 50
    vmax: float = 2500.0
    lr: float = 1e-3
    seed: int = 0
    benchmark: bool = False         # greedy eval: no training, no replay
                                    # writes, eps pinned to eps_final
    actions_per_drop: int = 1
    scoring: int = 0
    randomizer: int = 0


class DQNReplay(NamedTuple):
    """Transition ring: (s, a, r, s', end), boards bit-packed."""

    si: jax.Array      # uint32[R, 20]
    a: jax.Array       # int32[R]
    r: jax.Array       # float32[R]
    sf: jax.Array      # uint32[R, 20]
    end: jax.Array     # bool[R]
    idx: jax.Array     # int32
    count: jax.Array   # int32


def init_dqn_replay(capacity: int) -> DQNReplay:
    return DQNReplay(
        si=jnp.zeros((capacity, 20), jnp.uint32),
        a=jnp.zeros(capacity, jnp.int32),
        r=jnp.zeros(capacity, jnp.float32),
        sf=jnp.zeros((capacity, 20), jnp.uint32),
        end=jnp.zeros(capacity, bool),
        idx=jnp.int32(0),
        count=jnp.int32(0),
    )


def _imgs(packed):
    return engine.unpack_obs(packed)[..., None].astype(jnp.float32)


class DQNDriver:
    """Host driver: owns params/target/opt-state and the jitted step."""

    def __init__(self, cfg: DQNConfig,
                 log=lambda s: print(s, file=sys.stderr, flush=True),
                 metrics=None,
                 checkpoint_path: str = "./checkpoints/model_dqn.msgpack"):
        self.cfg = cfg
        # beat any installed stall watchdog through the log fn (episode and
        # training lines are the DQN loop's progress signal; see
        # runtime/watchdog.py)
        from tetris_mcts_tpu.runtime import watchdog as _wd

        self._watchdog = _wd.get_active()
        if self._watchdog is not None:
            log = self._watchdog.wrap_log(log)
        self.log = log
        self.metrics = metrics
        self.checkpoint_path = checkpoint_path
        self.env_cfg = engine.EnvConfig(
            actions_per_drop=cfg.actions_per_drop, scoring=cfg.scoring,
            randomizer=cfg.randomizer,
        )

        net = DistQNet(atoms=cfg.atoms) if cfg.distributional else QNet()
        self.net = net
        key = jax.random.PRNGKey(cfg.seed)
        dummy = jnp.zeros((1, 20, 10, 1), jnp.float32)
        self.params = net.init(key, dummy)
        self.target_params = self.params
        self.tx = optax.adam(cfg.lr)
        self.opt_state = self.tx.init(self.params)

        self.envs = engine.reset_batch(cfg.seed, cfg.batch, self.env_cfg)
        self.replay = init_dqn_replay(cfg.memory_size)
        self.key = jax.random.PRNGKey(cfg.seed + 1)

        self.updates = 0
        self.episodes = 0
        self.moves = 0
        self._ep_lines_hist: list = []

        env_cfg = self.env_cfg
        tx = self.tx
        gamma = jnp.float32(cfg.gamma)
        atoms, vmax = cfg.atoms, cfg.vmax
        B, R, TB = cfg.batch, cfg.memory_size, cfg.train_batch
        distributional = cfg.distributional
        benchmark = cfg.benchmark

        def q_values(params, packed):
            out = net.apply(params, _imgs(packed))
            if distributional:
                centers = (jnp.arange(atoms, dtype=jnp.float32) + 0.5) * (
                    vmax / atoms
                )
                return jnp.sum(out * centers, axis=-1)  # (B, 7)
            return out

        def loss_fn(params, target_params, si, a, r, sf, end):
            if not distributional:
                qi = net.apply(params, _imgs(si))          # (TB, 7)
                qf = net.apply(target_params, _imgs(sf))   # (TB, 7)
                target = r + gamma * jnp.max(qf, axis=1) * (~end)
                pred = qi[jnp.arange(TB), a]
                diff = jnp.abs(pred - jax.lax.stop_gradient(target))
                return jnp.mean(
                    jnp.where(diff < 1.0, 0.5 * diff**2, diff - 0.5)
                )
            # C51: project r + gamma*z onto the support for the greedy
            # target action (reference DQN.py:157-187, vectorized)
            pi = net.apply(params, _imgs(si))              # (TB, 7, atoms)
            pf = net.apply(target_params, _imgs(sf))       # (TB, 7, atoms)
            delta = vmax / atoms
            centers = (jnp.arange(atoms, dtype=jnp.float32) + 0.5) * delta
            qf_exp = jnp.sum(pf * centers, axis=-1)        # (TB, 7)
            a_star = jnp.argmax(qf_exp, axis=1)            # (TB,)
            p_star = pf[jnp.arange(TB), a_star]            # (TB, atoms)

            z = r[:, None] + gamma * centers[None, :] * (~end)[:, None]
            b = jnp.clip(z / delta - 0.5, 0.0, atoms - 1.0)
            lo = jnp.floor(b).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, atoms - 1)
            w_hi = b - lo
            w_lo = 1.0 - w_hi
            # terminal rows: point mass at r
            mass = jnp.where(end[:, None], 0.0, p_star)
            y = jnp.zeros((TB, atoms))
            rows = jnp.arange(TB)[:, None]
            y = y.at[rows, lo].add(mass * w_lo)
            y = y.at[rows, hi].add(mass * w_hi)
            r_bin = jnp.clip((r / delta).astype(jnp.int32), 0, atoms - 1)
            y = jnp.where(
                end[:, None],
                jax.nn.one_hot(r_bin, atoms), y,
            )
            pred = jnp.clip(pi[jnp.arange(TB), a], 1e-12)
            return -jnp.mean(jnp.sum(
                jax.lax.stop_gradient(y) * jnp.log(pred), axis=-1
            ))

        def step(params, target_params, opt_state, envs, replay, key, eps):
            key, k_eps, k_act, k_batch = jax.random.split(key, 4)
            packed_i = jax.vmap(engine.pack_obs)(envs)
            q = q_values(params, packed_i)
            greedy = jnp.argmax(q, axis=1).astype(jnp.int32)
            rand_a = jax.random.randint(k_act, (B,), 0, N_ACTIONS)
            explore = jax.random.uniform(k_eps, (B,)) < eps
            action = jnp.where(explore, rand_a, greedy)

            score0 = envs.score
            envs2 = engine.step_batch(envs, action, env_cfg)
            packed_f = jax.vmap(engine.pack_obs)(envs2)
            reward = (envs2.score - score0).astype(jnp.float32)
            done = envs2.end

            loss = jnp.float32(0.0)
            if not benchmark:  # static: eval builds a play-only program
                # write B transitions at the ring head (B > R would scatter
                # duplicate mod-R indices with an unspecified winner)
                assert B <= R, f"batch {B} exceeds replay capacity {R}"
                dst = (replay.idx + jnp.arange(B)) % R
                replay = DQNReplay(
                    si=replay.si.at[dst].set(packed_i),
                    a=replay.a.at[dst].set(action),
                    r=replay.r.at[dst].set(reward),
                    sf=replay.sf.at[dst].set(packed_f),
                    end=replay.end.at[dst].set(done),
                    idx=(replay.idx + B) % R,
                    count=jnp.minimum(replay.count + B, R),
                )

                # one SGD step on a uniform minibatch
                n = jnp.maximum(replay.count, 1)
                bidx = jax.random.randint(k_batch, (TB,), 0, n)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, target_params,
                    replay.si[bidx], replay.a[bidx], replay.r[bidx],
                    replay.sf[bidx], replay.end[bidx],
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)

            # auto-reset finished games
            fresh = jax.vmap(lambda s: engine.soft_reset(s, env_cfg))(envs2)
            envs3 = jax.tree.map(
                lambda a_, b_: jnp.where(
                    done.reshape((-1,) + (1,) * (a_.ndim - 1)), a_, b_
                ),
                fresh, envs2,
            )
            stats = {
                "loss": loss, "done": done,
                "score": envs2.score, "lines": envs2.lines,
            }
            return params, opt_state, envs3, replay, key, stats

        self._step = jax.jit(step)

    @property
    def eps(self):
        if self.cfg.benchmark:
            return self.cfg.eps_final  # greedy eval (replay never fills)
        frac = min(int(self.replay.count) / self.cfg.memory_size, 1.0)
        return self.cfg.eps_init + (self.cfg.eps_final - self.cfg.eps_init) * frac

    def save(self, path: str | None = None, verbose: bool = False):
        """Checkpoint params + target + optimizer state (the reference DQN
        checkpoints its nets too, agents/DQN.py:242-251)."""
        import flax.serialization

        from tetris_mcts_tpu.train.trainer import _atomic_pickle

        path = path or self.checkpoint_path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        _atomic_pickle(path, {
            "params": flax.serialization.to_bytes(self.params),
            "target_params": flax.serialization.to_bytes(self.target_params),
            "opt_state": flax.serialization.to_bytes(self.opt_state),
        })
        if verbose:
            print("Saving model...", flush=True)

    def load(self, path: str | None = None) -> bool:
        import pickle

        import flax.serialization

        path = path or self.checkpoint_path
        if not os.path.isfile(path):
            print("Checkpoint not found, using default model", flush=True)
            return False
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.params = flax.serialization.from_bytes(
            self.params, blob["params"]
        )
        self.target_params = flax.serialization.from_bytes(
            self.target_params, blob["target_params"]
        )
        self.opt_state = flax.serialization.from_bytes(
            self.opt_state, blob["opt_state"]
        )
        return True

    def step(self):
        (self.params, self.opt_state, self.envs, self.replay, self.key,
         stats) = self._step(
            self.params, self.target_params, self.opt_state,
            self.envs, self.replay, self.key, jnp.float32(self.eps),
        )
        self.moves += 1
        if self._watchdog is not None:
            self._watchdog.beat()
        self.updates += 1
        if self.updates % self.cfg.target_update_steps == 0:
            self.target_params = self.params
        done = np.asarray(stats["done"])
        if done.any():
            lines = np.asarray(stats["lines"])
            scores = np.asarray(stats["score"])
            for i in np.nonzero(done)[0]:
                self.episodes += 1
                self._ep_lines_hist.append(int(lines[i]))
                # reference field order (play.py:164): Score before Lines
                self.log(
                    f"Episode:{self.episodes:6d}  "
                    f"Score:{int(scores[i]):10d}  "
                    f"Lines Cleared:{int(lines[i]):5d}  eps:{self.eps:5.3f}"
                )
                if self.metrics is not None:
                    self.metrics.write(
                        "episode", n=self.episodes, lines=int(lines[i]),
                        score=int(scores[i]), eps=self.eps,
                    )
        return stats

    def run(self, n_moves: int):
        for _ in range(n_moves):
            self.step()
