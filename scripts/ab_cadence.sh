#!/bin/bash
# Training-cadence A/B (VERDICT r3 item 3): two campaign segments from the
# SAME checkpoint, same seed, differing ONLY in training cadence:
#   a: the round-3 campaign cadence — 60k-row trigger, 3000-iter cap
#      (every round-3 session hit exactly iters=3000: the cap binds)
#   b: reference-faithful — ~5k-row growth-gated trigger and a 50k-iter
#      ceiling so EARLY STOPPING (patience on val loss), not the cap, ends
#      sessions (/root/reference/agents/ValueSim.py:161-186,
#      model/model.py:176-249)
# Compare lines/episode at equal episode counts AND episodes/hour (the
# faithful cadence spends more duty on training).
#
# Usage: SECONDS_EACH=3000 bash scripts/ab_cadence.sh [OUT_ROOT]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/ab_cadence}
SECONDS_EACH=${SECONDS_EACH:-3000}
SEED_CKPT=${SEED_CKPT:-runs/campaign2/model.msgpack}
mkdir -p "$OUT"

run_segment() {
    name=$1; rows=$2; iters=$3
    d="$OUT/$name"
    mkdir -p "$d"
    cp "$SEED_CKPT" "$d/model.msgpack"
    echo "=== segment $name: train_rows=$rows max_iters=$iters ($(date -u +%T))"
    timeout "$SECONDS_EACH" \
    env TMT_LP_BLOCK=32 python -m tetris_mcts_tpu play \
        --agent_type ValueSimLP --online --endless \
        --mcts_sims 500 --batch 256 --app 1 --scoring 0 --randomizer 0 \
        --max_nodes 3584 --max_obs 3584 \
        --min_visits 25 --memory_size 500000 --memory_growth 5000 \
        --train_rows "$rows" --train_batch 1024 \
        --train_iters_per_val 100 --train_max_iters "$iters" \
        --stall_timeout 600 --stall_startup 3600 \
        --bf16 --load_model --seed 4242 \
        --metrics "$d/m.jsonl" \
        --checkpoint "$d/model.msgpack" >> "$d/run.log" 2>&1
    echo "=== segment $name done rc=$? ($(date -u +%T))"
}

run_segment a 60000 3000
run_segment b 5000 50000
echo "=== ab_cadence done"
