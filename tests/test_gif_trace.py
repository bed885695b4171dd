"""External env validation against the reference's own demo recording.

`/root/reference/demo/test.gif` is a real pyTetris game capture (200 frames,
0.5 s polls of the 220-byte `board_output` stream — `tools/capture.py` in the
reference). Round 1's engine<->oracle parity was self-referential (both sides
implement env/RULES.md); this test pins the rules to the reference's own
artifact:

- every frame's current-piece cells must match a (piece, rotation) entry of
  the engine's box-spin tables (all 7 pieces appear in the recording);
- a verified action chain (extracted by exhaustive search over RULES.md
  dynamics — `scripts/gif_analysis/{decode_gif,gen_trace,gen_units}.py`
  regenerate `tests/data/gif_trace.npz` from the gif; the chain reproduces
  all 199 frame transitions) replays bit-exactly on BOTH the C++ oracle and
  the JAX engine.

The demo board is 22x10 (DQN-era `getState`); units are pre-shifted onto the
20x10 board (the shift only re-labels rows — see gen_units.py). The recording
also rules out per-action auto-gravity at actions_per_drop 1-2 (RULES.md
"Gravity"), so units replay under the gravity-off mode.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tetris_mcts_tpu.env import engine
from tetris_mcts_tpu.env.engine import BOARD_H, BOARD_W, EnvConfig, EnvState
from tetris_mcts_tpu.env.pieces import PIECE_CELLS
from tetris_mcts_tpu.utils import oracle as co

DATA = os.path.join(os.path.dirname(__file__), "data", "gif_trace.npz")
CFG = EnvConfig(actions_per_drop=0, scoring=0, randomizer=0)


@pytest.fixture(scope="module")
def gif():
    return np.load(DATA)


def _piece_patterns():
    """All 28 (piece, rot) cell sets, normalized to their bounding box."""
    pats = set()
    for p in range(7):
        for r in range(4):
            cells = PIECE_CELLS[p, r]
            y0, x0 = cells[:, 0].min(), cells[:, 1].min()
            pats.add(frozenset((int(y - y0), int(x - x0)) for y, x in cells))
    return pats


def test_piece_tables_cover_every_frame(gif):
    """Each of the 200 frames' piece cells matches the engine's tables."""
    pats = _piece_patterns()
    for k, g in enumerate(gif["grids"]):
        cur = np.argwhere(g == -1)
        assert len(cur) == 4, f"frame {k}: {len(cur)} piece cells"
        y0, x0 = cur.min(axis=0)
        rel = frozenset((int(y - y0), int(x - x0)) for y, x in cur)
        assert rel in pats, f"frame {k}: piece cells {sorted(rel)} not a " \
                            f"known (piece, rot) pattern"


def _unit_iter(gif):
    for j in range(len(gif["u_type"])):
        o, ln = int(gif["u_off"][j]), int(gif["u_len"][j])
        yield (
            j,
            gif["u_rows"][j],
            gif["u_pose"][j],
            gif["u_seq"][o:o + ln],
            int(gif["u_type"][j]),
            gif["u_end_rows"][j],
            gif["u_end_pose"][j],
        )


def test_oracle_replays_gif_units(gif):
    orc = co.Oracle(1, 2, actions_per_drop=0, scoring=0, randomizer=0)
    n_move = n_lock = 0
    for j, rows, pose, seq, typ, erows, epose in _unit_iter(gif):
        s = orc._s
        for r in range(20):
            s.rows[r] = int(rows[r])
        s.piece, s.rot, s.py, s.px = int(pose[0]), int(pose[1]), int(pose[2]), int(pose[3])
        s.gravity = 0
        s.end = 0
        for a in seq:
            orc.play(int(a))
        got_rows = np.asarray(orc.snapshot()["rows"], np.uint32)
        np.testing.assert_array_equal(
            got_rows, erows, err_msg=f"unit {j}: stack mismatch")
        if typ == 0:
            snap = orc.snapshot()
            assert (snap["piece"], snap["rot"], snap["py"], snap["px"]) == (
                int(epose[0]), int(epose[1]), int(epose[2]), int(epose[3])
            ), f"unit {j}: piece pose mismatch"
            n_move += 1
        else:
            assert not orc.end, f"unit {j}: unexpected game over after lock"
            n_lock += 1
    assert n_move > 150 and n_lock > 20  # the artifact covers both kinds


def test_engine_replays_gif_units(gif):
    """Same replay through the batched JAX engine: all units step in lockstep
    (type-0 units pad with action 0, a true no-op under gravity-off)."""
    units = list(_unit_iter(gif))
    U = len(units)
    maxlen = max(len(u[3]) for u in units)
    acts = np.zeros((U, maxlen), np.int32)
    for j, (_, _, _, seq, _, _, _) in enumerate(units):
        acts[j, :len(seq)] = seq
        # type-1 units end at their lock; pad with no-ops after it too (the
        # respawned piece holds still under gravity-off)
    rows = np.stack([u[1] for u in units]).astype(np.uint32)
    pose = np.stack([u[2] for u in units]).astype(np.int32)
    B = U
    s = EnvState(
        rows=jnp.asarray(rows),
        piece=jnp.asarray(pose[:, 0]), rot=jnp.asarray(pose[:, 1]),
        py=jnp.asarray(pose[:, 2]), px=jnp.asarray(pose[:, 3]),
        bag=jnp.tile(jnp.arange(7, dtype=jnp.int32), (B, 1)),
        bag_pos=jnp.zeros(B, jnp.int32),
        k0=jnp.full(B, 7, jnp.uint32), k1=jnp.arange(B, dtype=jnp.uint32),
        ctr=jnp.zeros(B, jnp.uint32),
        gravity=jnp.zeros(B, jnp.int32), score=jnp.zeros(B, jnp.int32),
        combo=jnp.zeros(B, jnp.int32), lines=jnp.zeros(B, jnp.int32),
        line_stats=jnp.zeros((B, 4), jnp.int32),
        end=jnp.zeros(B, bool),
    )
    stepf = jax.jit(lambda st, a: engine.step_batch(st, a, CFG))
    for t in range(maxlen):
        s = stepf(s, jnp.asarray(acts[:, t]))
    got_rows = np.asarray(s.rows, np.uint32)
    erows = np.stack([u[5] for u in units]).astype(np.uint32)
    np.testing.assert_array_equal(got_rows, erows)
    for j, (_, _, _, _, typ, _, epose) in enumerate(units):
        if typ == 0:
            got = (int(s.piece[j]), int(s.rot[j]), int(s.py[j]), int(s.px[j]))
            assert got == tuple(int(x) for x in epose), f"unit {j}"
        else:
            assert not bool(s.end[j]), f"unit {j}: game over after lock"


REF_CKPT = "/root/reference/tmp/model_10k"


@pytest.mark.skipif(not os.path.exists(REF_CKPT), reason="reference absent")
def test_reference_checkpoint_contract():
    """`tmp/model_10k` is a real reference checkpoint; its top-level keys pin
    the Model save contract (model/model.py:143-174): net + optimizer state
    plus the target-normalization stats and the EWC fisher. (Its state dict
    is an OLDER net era — 4 convs / fc 896->128, a 22x10 valid-pad geometry —
    predating the current model_vv.py 3-conv/fc256 architecture that
    models/nets.py mirrors; asserted here so the era distinction stays
    documented.)"""
    torch = pytest.importorskip("torch")
    d = torch.load(REF_CKPT, map_location="cpu", weights_only=False)
    assert {"model_state_dict", "optimizer_state_dict", "v_mean", "v_std",
            "var_mean", "var_std", "fisher"} <= set(d.keys())
    sd = d["model_state_dict"]
    assert tuple(sd["fc1.weight"].shape) == (128, 896)  # 32ch * 28 = 22x10 era
    assert {k.split(".")[0] for k in sd} == {
        "conv1", "conv2", "conv3", "conv4", "fc1", "fc_v", "fc_var"}
