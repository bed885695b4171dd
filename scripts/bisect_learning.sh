#!/bin/bash
# Round-5 learning-gap bisect (VERDICT r4 task 1): run the framework in the
# reference's ENDLESS configuration — near-single-game batch, 150 sims/move,
# growth-gated train-to-convergence sessions on fresh-only data (cleared
# after each session), tree reuse across moves — and overlay lines/episode
# against the reference's own curve
# (/root/reference/results/online-200sims/log_endless: ep 400 -> 40 lines,
# ep 450 -> 184, ep 500 -> 216).
#
# Key semantics vs the batch-256 campaign (runs/campaign2):
# - batch 8 (verdict: <= 8) instead of 256
# - --acc_policy 3: the reference's growth gate on FRESH rows with
#   memory cleared after every session (ValueSimOnline.py:159-218 /
#   agent.cpp:687-695) — campaign2 trains a sliding window (77% stale)
# - --train_max_iters 100000: sessions end by early stopping (patience 10,
#   1-sigma threshold), not an iteration cap (campaign2 caps at 3000)
# - --train_batch 128: the endless run's batch (log_endless head)
# - --max_nodes 65536: cross-move tree reuse (campaign2's 3584 pool forces
#   a harvest+reset EVERY move; the reference ran a 500k pool, GC every
#   ~7-15 episodes)
# - --min_visits 10: ValueSim(Online) min_visits_to_store default (the
#   play.py --min_visit flag is silently swallowed by the reference's
#   kwarg-name wart, so the default ruled)
# - --memory_growth 2500: the gate sequence in log_endless (2500, 5000, ...)
#
# Usage: END_BY=<epoch-secs> bash scripts/bisect_learning.sh [OUT_DIR]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/bisect_r5}
END_BY=${END_BY:?set END_BY (epoch seconds)}
mkdir -p "$OUT"
exec >>"$OUT/campaign.log" 2>&1
echo "=== bisect_learning start $(date -u +%FT%TZ) out=$OUT end_by=$END_BY"

left_s() { echo $((END_BY - $(date +%s))); }

attempt=0
resume_flag=""
if [ -f "$OUT/model.msgpack" ]; then
    echo "=== resuming from existing $OUT/model.msgpack"
    resume_flag="--load_model"
fi
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
        --mcts_sims 150 --batch 8 --app 1 --scoring 0 --randomizer 0 \
        --max_nodes 65536 --max_obs 65536 --max_depth 128 --episode_reuse 1 \
        --min_visits 10 --memory_size 500000 --memory_growth 2500 \
        --acc_policy 3 --train_batch 128 \
        --train_iters_per_val 100 --train_max_iters 100000 \
        --stall_timeout 900 --stall_startup 3600 \
        --bf16 $resume_flag --seed $((1205 + attempt)) \
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
echo "=== bisect_learning done $(date -u +%FT%TZ) after $attempt attempt(s)"
