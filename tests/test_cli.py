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

    def test_model_passthrough_follows_agent(self, tmp_path):
        """VP-net agents train the VP net each cycle (cli.train --model)."""
        d = tmp_path / "self0"
        d.mkdir()
        (d / "data0.h5").touch()  # data present -> train phase planned
        out = subprocess.run(
            [sys.executable, "-m", "tetris_mcts_tpu.cli.cycle",
             "--iters", "1", "--data_dir", str(tmp_path), "--dry_run",
             "--agent_type", "ApproxPolicyIter"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert "--model vp" in out.stdout

    def test_model_passthrough_dist_agent(self, tmp_path):
        """Dist-evaluator agents train the C51 net, into the dist default
        checkpoint on both phases (train and play must agree)."""
        d = tmp_path / "self0"
        d.mkdir()
        (d / "data0.h5").touch()
        out = subprocess.run(
            [sys.executable, "-m", "tetris_mcts_tpu.cli.cycle",
             "--iters", "1", "--data_dir", str(tmp_path), "--dry_run",
             "--agent_type", "DistValueSim"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert "--model dist" in out.stdout

    def test_train_and_play_agree_on_default_checkpoints(self):
        """resolve_ckpt gives every net kind a distinct file; different
        nets' blobs must never share one (from_bytes on a mismatched
        structure raises)."""
        from tetris_mcts_tpu.cli import _CKPT_BY_KIND, resolve_ckpt

        paths = [resolve_ckpt("./checkpoints/model_vv.msgpack", k)
                 for k in _CKPT_BY_KIND]
        assert len(set(paths)) == len(paths)
        # explicit --checkpoint always wins
        assert resolve_ckpt("/x/custom.msgpack", "dist") == "/x/custom.msgpack"


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


class TestTrainModels:
    """Offline training of the VP / Dist / ensemble nets from the shared
    HDF5 schema (`cli/train.py --model`, reference train.py pipeline era)."""

    def _write_data(self, tmp_path):
        from tetris_mcts_tpu.utils.data import DataSaver

        rng = np.random.RandomState(1)
        n = 60
        saver = DataSaver(str(tmp_path), "data", cycle=0)
        pol = rng.dirichlet(np.ones(7), n).astype(np.float32)
        saver.add_batch(
            episode=np.repeat(np.arange(6), 10),
            board=rng.randint(-1, 2, (n, 20, 10)).astype(np.int8),
            policy=pol,
            action=rng.randint(0, 7, n),
            combo=np.zeros(n, np.int32), lines=np.zeros(n, np.int32),
            line_stats=np.zeros((n, 4), np.int32),
            score=np.cumsum(rng.randint(0, 40, n)),
            child_stats=rng.uniform(0, 5, (n, 3, 7)).astype(np.float32),
            value=rng.uniform(0, 80, n).astype(np.float32),
            variance=rng.uniform(1, 10, n).astype(np.float32),
        )
        saver.close()
        return str(tmp_path / "data*.h5")

    def test_gaussian_dist_targets(self):
        from tetris_mcts_tpu.cli.train import gaussian_dist_targets

        value = np.asarray([10.0, 500.0], np.float32)
        var = np.asarray([4.0, 25.0], np.float32)
        d = gaussian_dist_targets(value, var, atoms=50, vmax=1000.0)
        assert d.shape == (2, 50)
        np.testing.assert_allclose(d.sum(1), 1.0, rtol=1e-5)
        centers = (np.arange(50) + 0.5) * 20.0
        # mode lands on the atom nearest the target value
        assert abs(centers[d[0].argmax()] - 10.0) <= 10.0
        assert abs(centers[d[1].argmax()] - 500.0) <= 10.0

    @pytest.mark.parametrize("model", ["vp", "dist"])
    def test_offline_training_runs(self, tmp_path, model):
        from tetris_mcts_tpu.cli.train import main

        glob_ = self._write_data(tmp_path)
        hist = main([
            "--data", glob_, "--td", "--model", model,
            "--batch_size", "16", "--iters_per_val", "4", "--max_iters", "8",
            "--checkpoint", str(tmp_path / f"m_{model}.msgpack"),
        ])
        assert len(hist) == 2
        assert np.isfinite(hist[-1][2])
        assert (tmp_path / f"m_{model}.msgpack").exists()

    def test_offline_ensemble_runs(self, tmp_path):
        from tetris_mcts_tpu.cli.train import main

        glob_ = self._write_data(tmp_path)
        hist = main([
            "--data", glob_, "--td", "--ensemble", "2", "--weighted",
            "--batch_size", "16", "--iters_per_val", "4", "--max_iters", "8",
            "--checkpoint", str(tmp_path / "ens.msgpack"),
            "--dump_dir", str(tmp_path),
        ])
        assert len(hist) == 2 and np.isfinite(hist[-1][2])
        assert (tmp_path / "ens.msgpack").exists()


@pytest.mark.parametrize("model", ["vp", "dist"])
def test_tools_sanity_all_nets(tmp_path, capsys, model):
    """`tools sanity --model {vp,dist}` — the reference's test_dist.py-style
    entropy + flip-invariance panel for the non-VV nets."""
    from tetris_mcts_tpu.cli.tools import main as tools_main

    rc = tools_main([
        "sanity", "--model", model,
        "--checkpoint", str(tmp_path / "none.msgpack"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Parameters:" in out and "entropy" in out
    assert "flip-invariance RMSE" in out


def test_train_last_nfiles_numeric_order(tmp_path, capsys):
    """--last_nfiles must take the newest cycles by NUMBER (reference
    util/Data.py keyFile): data10.h5 sorts before data2.h5 lexically."""
    from tetris_mcts_tpu.cli.train import main as train_main
    from tetris_mcts_tpu.utils.data import DataSaver

    rng = np.random.RandomState(0)
    for c in (2, 10):
        s = DataSaver(str(tmp_path), "data", cycle=c)
        n = 4 if c == 2 else 8  # row count tags which file got used
        s.add_batch(
            episode=np.zeros(n, np.int64),
            board=rng.randint(-1, 2, (n, 20, 10)).astype(np.int8),
            policy=np.full((n, 7), 1 / 7, np.float32),
            action=np.zeros(n, np.int64), combo=np.zeros(n, np.int32),
            lines=np.zeros(n, np.int32),
            line_stats=np.zeros((n, 4), np.int32),
            score=np.full(n, 100 * c, np.int64),
            child_stats=np.ones((n, 3, 7), np.float32),
            value=np.full(n, float(c), np.float32),
            variance=np.ones(n, np.float32),
        )
        s.close()
    hist = train_main([
        "--data", str(tmp_path / "data*.h5"), "--td", "--last_nfiles", "1",
        "--max_iters", "2", "--iters_per_val", "2", "--batch_size", "4",
        "--checkpoint", str(tmp_path / "m.msgpack"),
    ])
    assert len(hist) == 1
    out = capsys.readouterr().out
    # the 8-row cycle-10 file is numerically last (lexically data10 < data2)
    assert "Loaded 8 rows from 1 file(s)" in out


def test_min_iters_blocks_early_stop():
    """--min_iters: early stopping may not fire before the floor
    (reference train.py:25)."""
    from tetris_mcts_tpu.train.trainer import VVModel

    rng = np.random.RandomState(1)
    n = 64
    data = [
        rng.randint(0, 2, (n, 20, 10)).astype(np.int8),
        rng.uniform(0, 50, n).astype(np.float32),
        rng.uniform(1, 10, n).astype(np.float32),
        np.ones(n, np.float32),
    ]
    m = VVModel(seed=2)
    # patience 1 with a huge threshold => wants to stop at the 2nd window;
    # min_iters forces it to at least 8 iterations (4 windows)
    hist = m.train_data(
        data, batch_size=16, iters_per_val=2, max_iters=20,
        early_stopping=True, early_stopping_patience=1,
        early_stopping_threshold=-1e9, min_iters=8, shuffle=True,
        log=lambda s: None,
    )
    assert hist[-1][0] >= 8


def test_printboard_wrapper_prints_and_forwards(capsys):
    from tetris_mcts_tpu.cli.play import _PrintBoard

    seen = {}

    class Inner:
        def publish(self, board, combo, score, lines, line_stats):
            seen["board"] = board

    board = np.zeros((20, 10), np.int8)
    board[19, :4] = 1
    _PrintBoard(Inner()).publish(
        board, np.zeros(2, np.int32), np.asarray([120, 0]),
        np.asarray([3, 0]), np.zeros((2, 4), np.int32),
    )
    out = capsys.readouterr().out
    assert "score 120" in out and "lines 3" in out
    assert seen["board"] is board


def test_interactive_loop_plays_from_stdin(monkeypatch, capsys):
    """--interactive (reference play.py:119-160): actions come from stdin,
    the board is printed, 'Play more?' on game end."""
    from tetris_mcts_tpu.cli.play import build_parser, interactive_loop

    args = build_parser().parse_args(["--interactive", "--seed", "3"])
    moves = iter(["6"] * 60 + [""])  # hard drops until game over, then EOF
    monkeypatch.setattr("builtins.input", lambda *a: next(moves))
    rc = interactive_loop(args)
    assert rc == 0
    out = capsys.readouterr().out
    assert "score" in out


def test_cycle_rejects_dqn_agents(tmp_path, capsys):
    """DQN agents train per env step and save no HDF5 — a cycle would
    self-play forever without ever training; rejected up front."""
    from tetris_mcts_tpu.cli.cycle import main as cycle_main

    rc = cycle_main(["--agent_type", "DQN", "--iters", "1",
                     "--data_dir", str(tmp_path), "--dry_run"])
    assert rc == 2


def test_tools_sanity_redirects_default_checkpoint(tmp_path, capsys,
                                                   monkeypatch):
    """`tools sanity --model vp` with the shared default --checkpoint must
    resolve to the VP net's own path, not load the VV blob (structure
    mismatch raises in flax.serialization.from_bytes)."""
    from tetris_mcts_tpu.cli.tools import main as tools_main
    from tetris_mcts_tpu.train.trainer import VVModel

    monkeypatch.chdir(tmp_path)
    VVModel(checkpoint_path="./checkpoints/model_vv.msgpack").save()
    rc = tools_main(["sanity", "--model", "vp"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "flip-invariance RMSE" in out


def test_tools_plot_entropy_dump_response(tmp_path, capsys):
    """`tools plot --what {entropy,dump,response}` — the reference's
    tools/plot_entropy.py (mean visit entropy vs cycle), plot_dump.py
    (log-count hists of a training dump), and plot_response.py (truth-vs-
    prediction heatmaps from model re-inference) as static SVG exports."""
    from tetris_mcts_tpu.cli.tools import main as tools_main
    from tetris_mcts_tpu.train.trainer import VVModel
    from tetris_mcts_tpu.utils.data import DataSaver

    rng = np.random.RandomState(3)
    for c in (0, 1):
        s = DataSaver(str(tmp_path), "data", cycle=c)
        n = 6
        s.add_batch(
            episode=np.zeros(n, np.int64),
            board=rng.randint(-1, 2, (n, 20, 10)).astype(np.int8),
            policy=np.full((n, 7), 1 / 7, np.float32),
            action=np.zeros(n, np.int64), combo=np.zeros(n, np.int32),
            lines=np.zeros(n, np.int32),
            line_stats=np.zeros((n, 4), np.int32),
            score=np.zeros(n, np.int64),
            child_stats=np.abs(rng.rand(n, 3, 7)).astype(np.float32),
            value=np.zeros(n, np.float32), variance=np.ones(n, np.float32),
        )
        s.close()
    out = str(tmp_path / "entropy.svg")
    rc = tools_main(["plot", "--what", "entropy",
                     "--data", str(tmp_path / "data*.h5"), "--out", out])
    assert rc == 0 and "<svg" in open(out).read()

    m = 30
    dump = str(tmp_path / "dump.npz")
    np.savez(dump, states=rng.randint(-1, 2, (m, 20, 10)).astype(np.int8),
             values=rng.rand(m, 1) * 100, variance=rng.rand(m, 1) * 10 + 1,
             weights=np.ones((m, 1)))
    out = str(tmp_path / "dump.svg")
    rc = tools_main(["plot", "--what", "dump", "--dump", dump, "--out", out])
    assert rc == 0 and "<svg" in open(out).read()

    ckpt = str(tmp_path / "vv.msgpack")
    VVModel(checkpoint_path=ckpt).save()
    out = str(tmp_path / "response.svg")
    rc = tools_main(["plot", "--what", "response", "--dump", dump,
                     "--checkpoint", ckpt, "--out", out])
    assert rc == 0
    svg = open(out).read()
    assert "<svg" in svg and "truth vs pred" in svg


def test_replay_vp_reinference(tmp_path, capsys):
    """`replay --model_type vp` re-infers value+policy per frame (the
    reference's (v, p) panel, tools/replay.py:126-143)."""
    from tetris_mcts_tpu.cli.replay import main as replay_main
    from tetris_mcts_tpu.train.trainer import VPModel
    from tetris_mcts_tpu.utils.data import DataSaver

    rng = np.random.RandomState(0)
    n = 4
    saver = DataSaver(str(tmp_path), "data", cycle=0)
    saver.add_batch(
        episode=np.zeros(n, np.int64),
        board=rng.randint(-1, 2, (n, 20, 10)).astype(np.int8),
        policy=np.full((n, 7), 1 / 7, np.float32),
        action=np.zeros(n, np.int64), combo=np.zeros(n, np.int32),
        lines=np.zeros(n, np.int32), line_stats=np.zeros((n, 4), np.int32),
        score=np.zeros(n, np.int64),
        child_stats=np.zeros((n, 3, 7), np.float32),
        value=np.zeros(n, np.float32), variance=np.ones(n, np.float32),
    )
    saver.close()
    ckpt = str(tmp_path / "vp.msgpack")
    VPModel(checkpoint_path=ckpt).save()
    rc = replay_main([
        str(tmp_path / "data0.h5"), "--dump", "--model", ckpt,
        "--model_type", "vp",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "model value" in out and "policy" in out


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


class TestRound2Additions:
    def test_select_kernel_flag(self):
        p = build_parser()
        assert p.parse_args([]).select_kernel == 1
        assert p.parse_args(["--select_kernel", "0"]).select_kernel == 0

    def test_table_size_rounds_to_pow2(self):
        # the CLI derives table_size = next_pow2(2 * max_obs): bitmask
        # probing (tree.py:_probe) requires a power of two
        for max_obs, want in [(2048, 4096), (3584, 8192), (4096, 8192),
                              (96, 256), (1, 16)]:
            t = max(1 << (2 * max_obs - 1).bit_length(), 16)
            assert t == want and t & (t - 1) == 0, (max_obs, t)
