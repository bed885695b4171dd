"""Shared CLI helpers."""

# Single source of truth for the shared-default sentinel: VVModel's own
# default checkpoint path. resolve_ckpt's "explicit --checkpoint always
# wins" comparison breaks silently if the two strings ever diverge.
from tetris_mcts_tpu.train.trainer import DEFAULT_CKPT

_CKPT_BY_KIND = {
    "vv": DEFAULT_CKPT,
    "vp": "./checkpoints/model_vp.msgpack",
    "dist": "./checkpoints/model_dist.msgpack",
    "dqn": "./checkpoints/model_dqn.msgpack",
    "ens": "./checkpoints/model_vv_ens.msgpack",
}


def resolve_ckpt(args_ckpt: str, kind: str) -> str:
    """Per-net default checkpoint path. Blobs of different nets must never
    share a file — `flax.serialization.from_bytes` on a mismatched
    structure raises, and a save would clobber the other net's weights. An
    explicit --checkpoint always wins; only the shared default is
    redirected."""
    if args_ckpt != DEFAULT_CKPT:
        return args_ckpt
    return _CKPT_BY_KIND[kind]
