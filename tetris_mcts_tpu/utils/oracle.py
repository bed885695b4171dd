"""ctypes driver for the scalar C++ oracle (native/oracle.cpp).

Compiles the shared library on demand (cached by source mtime) — the TPU-native
analog of the reference's cppimport-on-import flow
(`/root/reference/agents/helper.py:1-4`), with ctypes instead of pybind11
(pybind11 is not available in this environment).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "oracle.cpp"
_BUILD = _NATIVE_DIR / "build"
_SO = _BUILD / "liboracle.so"


class OracleState(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_uint32 * 20),
        ("piece", ctypes.c_int32),
        ("rot", ctypes.c_int32),
        ("px", ctypes.c_int32),
        ("py", ctypes.c_int32),
        ("bag", ctypes.c_int32 * 7),
        ("bag_pos", ctypes.c_int32),
        ("k0", ctypes.c_uint32),
        ("k1", ctypes.c_uint32),
        ("ctr", ctypes.c_uint32),
        ("gravity", ctypes.c_int32),
        ("score", ctypes.c_int32),
        ("combo", ctypes.c_int32),
        ("lines", ctypes.c_int32),
        ("line_stats", ctypes.c_int32 * 4),
        ("end", ctypes.c_int32),
    ]


def _build() -> Path:
    _BUILD.mkdir(exist_ok=True)
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    proc = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
        capture_output=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            "oracle build failed "
            f"(exit {proc.returncode}):\n{proc.stderr.decode()}"
        )
    return _SO


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        lib.oracle_reset.argtypes = [
            ctypes.POINTER(OracleState), ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.oracle_soft_reset.argtypes = [
            ctypes.POINTER(OracleState), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.oracle_step.argtypes = [
            ctypes.POINTER(OracleState), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.oracle_get_state.argtypes = [
            ctypes.POINTER(OracleState), ctypes.POINTER(ctypes.c_int8),
        ]
        lib.oracle_threefry_lane0.argtypes = [ctypes.c_uint32] * 4
        lib.oracle_threefry_lane0.restype = ctypes.c_uint32
        _lib = lib
    return _lib


class Oracle:
    """Scalar Tetris game with the reference pyTetris-style surface
    (`play/getState/score/combo/line_clears/line_stats/end/reset`,
    `/root/reference/play.py:143-176`)."""

    def __init__(self, k0, k1, actions_per_drop=1, scoring=0, randomizer=0):
        self._lib = _load()
        self._cfg = (int(actions_per_drop), int(scoring), int(randomizer))
        self._s = OracleState()
        self._lib.oracle_reset(
            ctypes.byref(self._s), np.uint32(k0), np.uint32(k1), *self._cfg
        )

    def play(self, action: int):
        self._lib.oracle_step(ctypes.byref(self._s), int(action), *self._cfg)

    def reset(self):
        self._lib.oracle_soft_reset(ctypes.byref(self._s), *self._cfg)

    def getState(self) -> np.ndarray:
        out = (ctypes.c_int8 * 200)()
        self._lib.oracle_get_state(ctypes.byref(self._s), out)
        return np.ctypeslib.as_array(out).reshape(20, 10).copy()

    # -- observables -------------------------------------------------------
    @property
    def score(self):
        return int(self._s.score)

    @property
    def combo(self):
        return int(self._s.combo)

    @property
    def line_clears(self):
        return int(self._s.lines)

    @property
    def line_stats(self):
        return np.ctypeslib.as_array(self._s.line_stats).copy()

    @property
    def end(self):
        return bool(self._s.end)

    def snapshot(self) -> dict:
        """Full state dict in engine.EnvState field order (for parity tests)."""
        s = self._s
        return dict(
            rows=np.ctypeslib.as_array(s.rows).copy(),
            piece=s.piece, rot=s.rot, px=s.px, py=s.py,
            bag=np.ctypeslib.as_array(s.bag).copy(), bag_pos=s.bag_pos,
            k0=s.k0, k1=s.k1, ctr=s.ctr,
            gravity=s.gravity, score=s.score, combo=s.combo, lines=s.lines,
            line_stats=np.ctypeslib.as_array(s.line_stats).copy(),
            end=bool(s.end),
        )


def threefry_lane0(k0, k1, c0, c1) -> int:
    return int(_load().oracle_threefry_lane0(
        np.uint32(k0), np.uint32(k1), np.uint32(c0), np.uint32(c1)
    ))
