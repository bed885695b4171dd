"""Persistent-compile-cache defaults, shared by the CLI, bench, and tests.

The first TPU compile of a 500-sim move program costs ~20 min through the
axon remote-compile tunnel; caching the serialized executable makes every
later launch (campaign resume, bench re-run) near-instant. The axon plugin
DOES serialize executables (verified round 2) and the blobs are committed,
so fresh clones skip the compile when keys match.

MUST run before the first `import jax`: JAX reads JAX_COMPILATION_CACHE_DIR
at import time, so setting the env var after import is a silent no-op (the
round-2 CLI bug: ADVICE.md r2, medium). This module itself imports nothing
heavy, so callers can safely invoke it first thing. As a belt-and-braces
measure `enable()` also pushes the value through jax.config when jax is
already imported.

Opt out with TMT_NO_COMPILE_CACHE=1; override the location with
TMT_CACHE_DIR.
"""

from __future__ import annotations

import os
import sys


def repo_root() -> str:
    """The checkout root (parent of the package dir) when running from the
    repo; the current directory otherwise (never write into site-packages)."""
    cand = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.exists(os.path.join(cand, "bench.py")):
        return cand
    return os.getcwd()


def cache_dir() -> str:
    return os.environ.get(
        "TMT_CACHE_DIR", os.path.join(repo_root(), ".jax_cache")
    )


def enable() -> None:
    if os.environ.get("TMT_NO_COMPILE_CACHE") == "1":
        return
    cache = cache_dir()
    os.makedirs(cache, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    if "jax" in sys.modules:
        # env vars were read at import time; re-assert through the config so
        # the cache still engages for callers that imported jax first.
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes",
            int(os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]),
        )
