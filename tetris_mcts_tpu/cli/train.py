"""`train` entrypoint — offline training from saved self-play data.

The reference's `train.py` (the pipeline `cycle.sh` drives, SURVEY.md §3.3),
with its dead globals fixed (Appendix A): load HDF5 rows, build TD or
Monte-Carlo targets, weight by 1/variance or visit count, split
random/episodic validation, train with early stopping, write loss history.

Target semantics (`/root/reference/train.py:81-131`):
- TD: target value/variance = the stored per-node search statistics.
- MC: target value = final episode score minus score at the state (undiscounted
  return to end of episode); variance = 1.
Weighting (`--weighted_mode`): 0 = visit counts (child_stats visits summed),
1 = inverse variance (`train.py:96-104`).

`--model` picks the net (the reference's train.py targeted the
(v, var[, policy])-head model era, `train.py:184`):
- vv (default): value/variance targets as above; `--ensemble K` trains the
  K-member deep ensemble instead of one net.
- vp: value target as above + the stored visit-proportional policy column
  (`util/Data.py:18` schema) as the KL target.
- dist: the scalar (value, variance) targets projected onto the C51 atom
  grid as a Gaussian — the offline analog of the online distributional
  driver's tree-distribution targets (no reference counterpart; the
  reference never trained its C51 net offline).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="tetris-tpu train")
    p.add_argument("--data", default="./data/data*.h5",
                   help="glob of DataSaver files")
    p.add_argument("--td", action="store_true", help="TD targets (else MC)")
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--weighted_mode", type=int, default=1, choices=(0, 1))
    p.add_argument("--early_stopping", action="store_true")
    p.add_argument("--early_stopping_patience", type=int, default=10,
                   help="validation windows without improvement before "
                        "stopping (reference train.py:20)")
    p.add_argument("--validation", action="store_true",
                   help="episodic validation split (else random tail)")
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--iters_per_val", type=int, default=500)
    p.add_argument("--epoch_mode", action="store_true",
                   help="reference epoch loop (train.py:246-291): an epoch "
                        "is one pass (n_data//batch_size iters); with "
                        "--early_stopping, train until patience epochs "
                        "without validation improvement (plain < best, no "
                        "threshold rule); else run --epochs passes")
    p.add_argument("--epochs", type=int, default=10,
                   help="epoch count for --epoch_mode without early "
                        "stopping (reference train.py:21)")
    p.add_argument("--min_iters", type=int, default=-1,
                   help="never early-stop before this many iterations "
                        "(reference train.py:25; -1 = no floor)")
    p.add_argument("--max_iters", type=int, default=100000)
    p.add_argument("--last_nfiles", type=int, default=-1,
                   help="train on only the last n data files by cycle "
                        "number (reference train.py:24; -1 = all)")
    p.add_argument("--new", action="store_true",
                   help="train a fresh model even if --load_model was "
                        "given (reference train.py:27)")
    p.add_argument("--model", default="vv", choices=("vv", "vp", "dist"))
    p.add_argument("--ensemble", type=int, default=0,
                   help="K-member VV deep ensemble (0 = single net; "
                        "vv model only)")
    p.add_argument("--atoms", type=int, default=50,
                   help="C51 atom count (--model dist)")
    p.add_argument("--vmax", type=float, default=1000.0,
                   help="C51 value-grid upper bound (--model dist)")
    p.add_argument("--loss_type", default="kldiv",
                   help="vv loss (models/losses.py); vp/dist have fixed "
                        "reference losses")
    p.add_argument("--lr", type=float, default=None,
                   help="learning rate (default: 1e-3 for vv/dist, the "
                        "reference's 1e-4 for vp)")
    p.add_argument("--cycle", type=int, default=0)
    p.add_argument("--save_loss", default="",
                   help="loss-history dir ('' = off)")
    from tetris_mcts_tpu.cli import DEFAULT_CKPT

    p.add_argument("--checkpoint", default=DEFAULT_CKPT)
    p.add_argument("--load_model", action="store_true")
    p.add_argument("--dump_dir", default="./data",
                   help="grad-norm watchdog dump directory "
                        "(model/model.py:105-109)")
    p.add_argument("--ewc", action="store_true")
    p.add_argument("--ewc_lambda", type=float, default=1.0,
                   help="EWC importance weight (reference train.py:23)")
    p.add_argument("--seed", type=int, default=0)
    return p


def build_targets(loader, td: bool, weighted: bool, weighted_mode: int):
    """(states, value, variance, weight) from a DataLoader's columns."""
    boards = loader.board.astype(np.int8)
    if td:
        value = loader.value.astype(np.float32)
        variance = np.maximum(loader.variance.astype(np.float32), 1e-1)
    else:
        # MC: return-to-episode-end = final episode score - score here
        score = loader.score.astype(np.float64)
        ep = loader.episode.astype(np.int64)
        final = {}
        for e, s in zip(ep, score):
            final[e] = max(final.get(e, s), s)
        value = np.asarray(
            [final[e] - s for e, s in zip(ep, score)], np.float32
        )
        variance = np.ones_like(value)

    if not weighted:
        weight = np.ones(len(boards), np.float32)
    elif weighted_mode == 0:
        weight = loader.child_stats[:, 0, :].sum(axis=1).astype(np.float32)
        weight = np.maximum(weight, 1.0)
    else:
        weight = 1.0 / np.maximum(variance, 1e-1)
    return boards, value, variance, weight


def gaussian_dist_targets(value, variance, atoms: int, vmax: float):
    """Project scalar (value, variance) targets onto the C51 atom grid as a
    normalized Gaussian pmf. Grid matches the online distributional search
    (`search/distributional.DistConfig`): support [0, vmax], atom centers
    (b + 0.5)·vmax/atoms."""
    centers = (np.arange(atoms, dtype=np.float64) + 0.5) * (vmax / atoms)
    sd = np.sqrt(np.maximum(variance.astype(np.float64), 1e-2))[:, None]
    logits = -0.5 * ((centers[None, :] - value[:, None]) / sd) ** 2
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits)
    return (p / p.sum(axis=1, keepdims=True)).astype(np.float32)


def episodic_split(loader, frac: float, rng):
    """Hold out whole episodes for validation (`train.py:148-174`)."""
    eps = np.unique(loader.episode)
    n_val = max(int(len(eps) * frac), 1)
    val_eps = set(rng.choice(eps, n_val, replace=False).tolist())
    val_mask = np.asarray([e in val_eps for e in loader.episode])
    return ~val_mask, val_mask


def main(argv=None):
    args = build_parser().parse_args(argv)

    from tetris_mcts_tpu.train.trainer import DistModel, VPModel, VVModel
    from tetris_mcts_tpu.utils.data import DataLoader, LossSaver

    import glob
    import re

    # numeric-suffix file order (the reference's keyFile sort,
    # util/Data.py) so --last_nfiles takes the newest cycles, not the
    # lexically-last names (data10.h5 sorts before data2.h5 otherwise)
    def cycle_no(path):
        m = re.search(r"(\d+)\.h5$", path)
        return int(m.group(1)) if m else -1

    paths = sorted(glob.glob(args.data), key=cycle_no)
    if args.last_nfiles > 0:
        paths = paths[-args.last_nfiles:]
    loader = DataLoader(paths)
    print(f"Loaded {len(loader)} rows from {len(paths)} file(s) "
          f"({args.data})", flush=True)

    states, value, variance, weight = build_targets(
        loader, args.td, args.weighted, args.weighted_mode
    )
    if args.model == "vp":
        pol = loader.policy.astype(np.float32)
        pol = pol / np.maximum(pol.sum(axis=1, keepdims=True), 1e-9)
        cols = [states, value, pol, weight]
    elif args.model == "dist":
        cols = [
            states,
            gaussian_dist_targets(value, variance, args.atoms, args.vmax),
            weight,
        ]
    else:
        cols = [states, value, variance, weight]

    rng = np.random.RandomState(args.seed)
    val_rows = None
    if args.validation:
        tr, va = episodic_split(loader, args.val_fraction, rng)
        order = np.concatenate([np.nonzero(tr)[0], np.nonzero(va)[0]])
        cols = [d[order] for d in cols]
        shuffle = False  # split already arranged: validation tail
        # pin the split to the exact episode boundary — a fraction-derived
        # tail count would slice through the held-out episodes and leak
        # training rows into validation
        val_rows = int(va.sum())
    else:
        shuffle = True

    # per-net default checkpoints (cli.resolve_ckpt — same mapping the play
    # CLI uses, so a cycle's train and play phases agree on the file)
    from tetris_mcts_tpu.cli import resolve_ckpt

    # reference learning rates: vv/dist yogi 1e-3, vp adam-amsgrad 1e-4
    lr = args.lr if args.lr is not None else (
        1e-4 if args.model == "vp" else 1e-3
    )
    if args.model != "vv":
        for flag, off in (("--ewc", args.ewc),
                          ("--loss_type", args.loss_type != "kldiv"),
                          ("--ensemble", args.ensemble > 0)):
            if off:
                print(f"{flag} applies to the vv model only; ignored",
                      flush=True)
    if args.model == "vp":
        model = VPModel(lr=lr, weighted=args.weighted, seed=args.seed,
                        checkpoint_path=resolve_ckpt(args.checkpoint, "vp"))
    elif args.model == "dist":
        model = DistModel(atoms=args.atoms, weighted=args.weighted,
                          lr=lr, seed=args.seed,
                          checkpoint_path=resolve_ckpt(args.checkpoint,
                                                       "dist"))
    elif args.ensemble > 0:
        from tetris_mcts_tpu.train.ensemble import EnsembleVVModel

        model = EnsembleVVModel(
            n_models=args.ensemble, loss_type=args.loss_type,
            weighted=args.weighted, lr=lr, seed=args.seed,
            checkpoint_path=resolve_ckpt(args.checkpoint, "ens"),
            ewc=args.ewc, ewc_lambda=args.ewc_lambda,
        )
    else:
        model = VVModel(
            loss_type=args.loss_type, weighted=args.weighted, lr=lr,
            seed=args.seed, checkpoint_path=args.checkpoint, ewc=args.ewc,
            ewc_lambda=args.ewc_lambda,
        )
    if args.load_model and not args.new:
        model.load()

    # only the VV family runs the grad-norm watchdog (model/model.py:105-109)
    extra = {"dump_dir": args.dump_dir} if args.model == "vv" else {}
    iters_per_val = args.iters_per_val
    max_iters = args.max_iters
    if args.epoch_mode:
        # reference epoch semantics (train.py:193,246-291): one epoch = one
        # pass over the training rows; early stopping uses the plain
        # `val < best` rule (threshold 0) and no iteration bound
        n_rows = len(cols[1])
        iters_per_val = max(n_rows // args.batch_size, 1)
        max_iters = (10**9 if args.early_stopping
                     else args.epochs * iters_per_val)
        extra["early_stopping_threshold"] = 0.0
    history = model.train_data(
        cols,
        batch_size=args.batch_size,
        iters_per_val=iters_per_val,
        validation_fraction=args.val_fraction,
        validation_rows=val_rows,
        early_stopping=args.early_stopping,
        early_stopping_patience=args.early_stopping_patience,
        shuffle=shuffle,
        min_iters=max(args.min_iters, 0),
        max_iters=max_iters,
        **extra,
    )
    if args.ewc and args.model == "vv":
        # single net and ensemble both support the Fisher anchor (the
        # ensemble computes one per member, train/ensemble.py)
        model.compute_fisher(cols)
    model.save(verbose=True)

    if args.save_loss:
        saver = LossSaver(args.save_loss, cycle=args.cycle)
        saver.add_history(history)
        saver.close()
    return history


if __name__ == "__main__":
    main()
