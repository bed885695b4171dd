#!/bin/bash
# Round-5 campaign: reference-faithful learning DYNAMICS at batch 256.
#
# What changed vs campaign2 (runs/campaign2, rounds 2-4) and why — each item
# maps to a measured deviation from the reference's endless run
# (/root/reference/results/online-200sims/log_endless, the 296-lines/episode
# curve the verdict demands):
#
# 1. --acc_policy 3: train on FRESH rows only and CLEAR the memory after
#    every session (ValueSimOnline.py train_nodes: memory_index=0). The
#    campaign2 cadence (-1) re-trained a 262k-row sliding window where 77%
#    of rows carried targets from nets up to ~4 sessions old — stale TD
#    targets damp the value-compounding takeoff the reference shows at
#    episode ~400.
# 2. Sessions run to early-stopping convergence (--train_max_iters 15000,
#    patience 10 at 1 sigma — the reference's rule) instead of campaign2's
#    hard 3000-iter cap that val-loss plateaus showed never let early
#    stopping engage. Reference steady state is ~2-6 epochs per fresh
#    batch; at train_batch 1024 a session costs ~4% duty, so convergence
#    sessions do NOT starve play (the round-4 A/B's starvation was the
#    zero-gradient spin bug, fixed, plus an unscaled 5k growth gate).
# 3. --memory_growth 30000: the reference growth gate (n_trains*rate)
#    scaled to the 256-lane data rate so session pacing per unit data
#    matches the log_endless profile (gates 2500*n at ~900 rows/episode).
# 4. --mcts_sims 150 --max_nodes 8192: the endless run's own search depth
#    (150 sims/move), with pools holding ~7 moves of cross-move tree reuse.
#    campaign2's 3584-pool/500-sims config harvested+reset the tree EVERY
#    move — the reference reuses a 250-500k-node pool across many moves
#    and episodes, accumulating root statistics (better targets, stronger
#    moves per sim). 8192:96 stays inside the select-kernel verified
#    envelope.
# 5. --min_visits 10: ValueSim's min_visits_to_store default — the value
#    the reference actually ran (its play.py --min_visit flag is silently
#    swallowed by a kwarg-name mismatch). campaign2 used 25.
#
# Benchmark channel unchanged (64 games @ 1000 sims, training+storage off)
# for comparability with rounds 2-4 and the v2 headline.
#
# Usage: END_BY=<epoch-secs> bash scripts/campaign3.sh [OUT_DIR]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/campaign3}
END_BY=${END_BY:?set END_BY (epoch seconds)}
mkdir -p "$OUT"
exec >>"$OUT/campaign.log" 2>&1
echo "=== campaign3 start $(date -u +%FT%TZ) out=$OUT end_by=$END_BY"

left_s() { echo $((END_BY - $(date +%s))); }

attempt=0
resume_flag=""
if [ -f "$OUT/model.msgpack" ]; then
    echo "=== resuming from existing $OUT/model.msgpack"
    resume_flag="--load_model"
fi
BENCH_EVERY=${BENCH_EVERY:-3000}
SIMS=${SIMS:-150}
NODES=${NODES:-8192}
preflight() {
    # round-5 failure mode: axon backend INIT hangs ~25 min then errors
    # UNAVAILABLE when the chip service is down. Probe cheaply (10-min cap)
    # so dead-chip retries cycle 2.5x faster than a full launch would.
    timeout 600 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

while [ "$(left_s)" -gt 300 ]; do
    if ! preflight; then
        echo "=== preflight: chip unavailable at $(date -u +%FT%TZ); retry in 60s"
        sleep 60
        continue
    fi
    attempt=$((attempt + 1))
    echo "=== attempt $attempt ($(($(left_s) / 60)) min left) at $(date -u +%FT%TZ)"
    timeout "$(left_s)" \
    python -m tetris_mcts_tpu play \
        --agent_type ValueSimLP --online --endless \
        --mcts_sims "$SIMS" --batch 256 --app 1 --scoring 0 --randomizer 0 \
        --max_nodes "$NODES" --max_obs "$NODES" --max_depth 96 \
        --min_visits 10 --memory_size 500000 --memory_growth 30000 \
        --acc_policy 3 --train_batch 1024 \
        --train_iters_per_val 100 --train_max_iters 15000 \
        --benchmark_every "$BENCH_EVERY" --benchmark_sims 1000 --benchmark_games 64 \
        --benchmark_batch 64 --benchmark_max_nodes 8192 \
        --benchmark_max_moves 2500 \
        --stall_timeout 900 --stall_startup 3600 \
        --bf16 $resume_flag --seed $((500 + attempt)) \
        --metrics "$OUT/m.jsonl" \
        --checkpoint "$OUT/model.msgpack" >> "$OUT/run.log" 2>&1
    rc=$?
    resume_flag="--load_model"
    if [ $rc -eq 124 ] || [ $rc -eq 0 ]; then
        break
    fi
    echo "=== run died rc=$rc at $(date -u +%FT%TZ); retrying in 60s"
    sleep 60
done
echo "=== campaign3 done $(date -u +%FT%TZ) after $attempt attempt(s)"
