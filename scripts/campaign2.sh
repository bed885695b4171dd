#!/bin/bash
# Round-2 learning-parity campaign (VERDICT r1 item 1), v3 config.
#
# Reference v2 training conditions (README.md:56-60, play.py defaults):
# 500 sims/move, guideline scoring (0), bag randomizer (0), app=1,
# min_visit 25, memory 500k — run batched (256 games in lockstep) with the
# benchmark-game channel (1000 sims, training+storage off) firing every
# 400 completed episodes.
#
# Config notes vs campaign1 (runs/campaign1, stopped):
# - pools 3584 (smallest 128-multiple holding one 500-sim move: 7*501+2 =
#   3509 nodes) — the 8192 pools made the Pallas walks ~5x slower (VMEM-
#   resident stats are O(M) per access; probes in runs/campaign1/).
# - TMT_LP_BLOCK pins the lp-backup kernel block under the 16 MB scoped-
#   VMEM limit at M=3584 (Mosaic stack is superlinear in M; measured
#   24.5M@bg128, 16.52M@bg64).
# - app=1: the reference's default actions-per-drop — its headline runs
#   used defaults (tmp/default.sh, play.py:48). campaign1's app=0 deviated.
# - train cadence 60k-row trigger / 3000 iters ~= the reference's ~1
#   training iter per game-move at batch 256 (campaign1 run1 burned 95%
#   duty on training with the 15k/50k cadence).
# - select kernel ON (round 4): the round-3 "miscompile" was two real
#   bugs elsewhere — input_output_aliases on the backup kernels corrupting
#   the stat triple in composition, and Mosaic argmax breaking exact ties
#   differently than XLA — both fixed (ops/tree_walk.py KNOWN ISSUE).
#   B=256/3584/96/500-sims now compares bit-exact against the XLA walk
#   over full multi-move programs (runs/r4probe/probes4.log), so the
#   campaign runs the fused kernel path at full speed.
#
# Usage: END_BY=<epoch-secs> bash scripts/campaign2.sh [OUT_DIR]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/campaign2}
END_BY=${END_BY:?set END_BY (epoch seconds) so the chip is free for the round driver}
mkdir -p "$OUT"
exec >>"$OUT/campaign.log" 2>&1
echo "=== campaign2 start $(date -u +%FT%TZ) out=$OUT end_by=$END_BY"

left_s() { echo $((END_BY - $(date +%s))); }

attempt=0
resume_flag=""
# Resume a prior campaign (or a pre-seeded net, e.g. runs/tpu_run2's) when
# $OUT/model.msgpack already exists — fresh environments lose runs/ state,
# so seeding $OUT before launch is how a campaign continues across rounds.
if [ -f "$OUT/model.msgpack" ]; then
    echo "=== resuming from existing $OUT/model.msgpack"
    resume_flag="--load_model"
fi
BENCH_EVERY=${BENCH_EVERY:-400}
while [ "$(left_s)" -gt 300 ]; do
    attempt=$((attempt + 1))
    echo "=== attempt $attempt ($(($(left_s) / 60)) min left) at $(date -u +%FT%TZ)"
    timeout "$(left_s)" \
    env TMT_LP_BLOCK=32 python -m tetris_mcts_tpu play \
        --agent_type ValueSimLP --online --endless \
        --mcts_sims 500 --batch 256 --app 1 --scoring 0 --randomizer 0 \
        --max_nodes 3584 --max_obs 3584 \
        --min_visits 25 --memory_size 500000 --memory_growth 5000 \
        --train_rows 60000 --train_batch 1024 \
        --train_iters_per_val 100 --train_max_iters 3000 \
        --benchmark_every "$BENCH_EVERY" --benchmark_sims 1000 --benchmark_games 64 \
        --benchmark_batch 64 --benchmark_max_nodes 8192 \
        --benchmark_max_moves 2500 \
        --stall_timeout 600 --stall_startup 3600 \
        --bf16 $resume_flag --seed $((42 + attempt)) \
        --metrics "$OUT/m.jsonl" \
        --checkpoint "$OUT/model.msgpack" >> "$OUT/run.log" 2>&1
    rc=$?
    resume_flag="--load_model"
    if [ $rc -eq 124 ] || [ $rc -eq 0 ]; then
        break  # clean end of budget or voluntary exit
    fi
    # rc=86: the in-process stall watchdog detected a wedged tunnel and
    # hard-exited after checkpointing state (runtime/watchdog.py) — retry
    # resumes from the last training session's checkpoint.
    echo "=== run died rc=$rc at $(date -u +%FT%TZ); retrying in 60s"
    sleep 60
done
echo "=== campaign2 done $(date -u +%FT%TZ) after $attempt attempt(s)"
