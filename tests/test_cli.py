"""CLI surface tests: argparse contracts, the cycle orchestrator's command
plan (--dry_run), and the tools subcommands that don't need a model run."""

import subprocess
import sys

import numpy as np
import pytest

from tetris_mcts_tpu.cli.cycle import last_cycle
from tetris_mcts_tpu.cli.play import AGENT_TYPES, build_parser
from tetris_mcts_tpu.cli.train import build_targets, episodic_split


class TestPlayParser:
    def test_reference_flags_exist(self):
        p = build_parser()
        args = p.parse_args([
            "--agent_type", "ValueSimLP", "--mcts_sims", "50", "--ngames",
            "3", "--benchmark", "--online", "--save", "--save_dir", "/tmp/x",
            "--cycle", "2", "--app", "2", "--scoring", "1",
            "--randomizer", "1", "--endless", "--policy", "gauss",
        ])
        assert args.mcts_sims == 50 and args.scoring == 1
        assert args.policy == "gauss"

    def test_all_agent_types_mapped(self):
        for name, (ev, trains) in AGENT_TYPES.items():
            assert ev in ("rollout", "leaf", "lp", "vp", "dist", "dqn",
                          "hybrid", "finite", "full", "s2"), name


class TestTrainTargets:
    class FakeLoader:
        def __init__(self):
            rng = np.random.RandomState(0)
            n = 40
            self.board = rng.randint(-1, 2, (n, 20, 10)).astype(np.int8)
            self.value = rng.uniform(0, 50, n).astype(np.float32)
            self.variance = rng.uniform(1, 10, n).astype(np.float32)
            self.score = np.cumsum(rng.randint(0, 100, n)).astype(np.int64)
            self.episode = np.repeat(np.arange(4), 10)
            self.child_stats = rng.uniform(0, 5, (n, 3, 7)).astype(np.float32)

    def test_td_targets(self):
        ld = self.FakeLoader()
        _, value, variance, weight = build_targets(ld, td=True, weighted=True,
                                                   weighted_mode=1)
        np.testing.assert_allclose(value, ld.value)
        np.testing.assert_allclose(weight, 1.0 / np.maximum(variance, 1e-1))

    def test_mc_targets_return_to_episode_end(self):
        ld = self.FakeLoader()
        _, value, variance, weight = build_targets(ld, td=False,
                                                   weighted=False,
                                                   weighted_mode=0)
        # per episode: final score - current score, >= 0, 0 at the last row
        for e in range(4):
            sel = ld.episode == e
            v = value[sel]
            assert v[-1] == 0.0
            assert (v >= 0).all()
        assert (weight == 1).all()

    def test_visit_weighting(self):
        ld = self.FakeLoader()
        _, _, _, weight = build_targets(ld, td=True, weighted=True,
                                        weighted_mode=0)
        np.testing.assert_allclose(
            weight, np.maximum(ld.child_stats[:, 0, :].sum(1), 1.0)
        )

    def test_episodic_split_holds_out_whole_episodes(self):
        ld = self.FakeLoader()
        tr, va = episodic_split(ld, 0.25, np.random.RandomState(0))
        val_eps = set(ld.episode[va].tolist())
        train_eps = set(ld.episode[tr].tolist())
        assert val_eps.isdisjoint(train_eps)
        assert len(val_eps) == 1


class TestCycle:
    def test_last_cycle_scans_files(self, tmp_path):
        d = tmp_path / "self0"
        d.mkdir()
        (d / "data0.h5").touch()
        (d / "data3.h5").touch()
        assert last_cycle(str(tmp_path)) == 3
        assert last_cycle(str(tmp_path / "empty")) == -1

    def test_dry_run_plans_commands(self, tmp_path):
        out = subprocess.run(
            [sys.executable, "-m", "tetris_mcts_tpu.cli.cycle",
             "--iters", "1", "--data_dir", str(tmp_path), "--dry_run",
             "--n_workers", "2"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        plan = out.stdout
        # no data yet -> no train phase; 2 workers + 1 benchmark run
        assert plan.count("cli.play") == 3
        assert "cli.train" not in plan
        assert "--benchmark" in plan


class TestTraceFlag:
    def test_trace_writes_profile(self, tmp_path):
        from tetris_mcts_tpu.cli.play import main

        trace_dir = tmp_path / "trace"
        main([
            "--agent_type", "Random", "--batch", "2", "--ngames", "1",
            "--max_nodes", "64", "--max_obs", "64", "--max_moves", "2",
            "--trace", str(trace_dir), "--trace_moves", "1",
        ])
        files = list(trace_dir.rglob("*"))
        assert any(f.is_file() for f in files), files


def test_replay_gif_export(tmp_path):
    """`replay --gif` renders saved boards to an animated GIF
    (tools/capture.py capability: greyscale shading, scaled grid)."""
    from PIL import Image

    from tetris_mcts_tpu.cli.replay import write_gif

    rng = np.random.RandomState(0)
    boards = rng.choice([-1, 0, 1], size=(5, 20, 10)).astype(np.int8)
    path = str(tmp_path / "ep.gif")
    write_gif(boards, path, scale=4, duration_ms=50)
    im = Image.open(path)
    assert im.size == (40, 80)
    assert im.n_frames == 5
