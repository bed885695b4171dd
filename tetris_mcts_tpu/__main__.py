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


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m tetris_mcts_tpu "
              "{play,train,cycle,dashboard,replay} [args...]")
        return 0
    # Cache env vars must be set BEFORE the first `import jax` —
    # _honor_platform_env imports jax whenever JAX_PLATFORMS is set (the
    # documented TPU launch), which froze the cache config as off in round 2
    # (ADVICE.md r2 medium). compile_cache imports no jax itself.
    from tetris_mcts_tpu import compile_cache

    compile_cache.enable()
    _honor_platform_env()
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
