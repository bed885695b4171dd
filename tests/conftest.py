"""Test harness: run every test on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising pod-style sharding without TPU
hardware (SURVEY.md §4 "Implication for the new build"). bench.py and the CLI
do NOT import this — they run on the real chip.
"""

import os
import pathlib

# Force CPU: the session environment may pin JAX_PLATFORMS to the real TPU
# (e.g. "axon"); tests must run on the virtual 8-device CPU mesh regardless.
# Some TPU plugins ignore the env var, so set the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compile cache: XLA:CPU compiles of the scan-heavy test programs
# are expensive; cache them across test runs (shared helper, imports no jax).
import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from tetris_mcts_tpu import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
