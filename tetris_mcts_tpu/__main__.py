"""`python -m tetris_mcts_tpu {play,train,cycle,bench}` dispatcher."""

import os
import sys


def _honor_platform_env():
    """Make `JAX_PLATFORMS=cpu python -m tetris_mcts_tpu ...` actually force
    the platform: a PJRT plugin (axon TPU) ignores the env var once it
    initializes, so re-assert it through jax.config before first device use.
    The chip is single-tenant — a "CPU" smoke run that silently grabs the TPU
    deadlocks against a concurrent bench/learning run."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def _default_compile_cache():
    """Point JAX's persistent compilation cache at .jax_cache/ by default.

    The first TPU compile of a 500-sim move program takes ~20 min through the
    axon remote-compile tunnel; caching the serialized executable makes every
    later launch (campaign resume, bench re-run) near-instant. If the PJRT
    plugin can't serialize executables JAX logs a warning and compiles as
    usual — strictly no worse. Opt out with TMT_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("TMT_NO_COMPILE_CACHE") == "1":
        return
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m tetris_mcts_tpu "
              "{play,train,cycle,dashboard,replay} [args...]")
        return 0
    _honor_platform_env()
    _default_compile_cache()
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "play":
        from tetris_mcts_tpu.cli.play import main as m
    elif cmd == "train":
        from tetris_mcts_tpu.cli.train import main as m
    elif cmd == "cycle":
        from tetris_mcts_tpu.cli.cycle import main as m
    elif cmd == "dashboard":
        from tetris_mcts_tpu.cli.dashboard import main as m
    elif cmd == "replay":
        from tetris_mcts_tpu.cli.replay import main as m
    elif cmd == "tools":
        from tetris_mcts_tpu.cli.tools import main as m
    else:
        print(f"unknown command {cmd!r}", file=sys.stderr)
        return 2
    m(argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
