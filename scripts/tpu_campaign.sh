#!/bin/bash
# One-button TPU campaign. Safe to launch while the axon tunnel is down:
# phase 0 polls device health until the chip answers, then the phases run
# strictly sequentially (the chip is single-tenant — nothing else may touch
# it while this script is alive).
#
#   0. wait for the tunnel (poll every 5 min, give up after MAX_WAIT_H)
#   1. bench.py baseline (bf16 in-search forward — the headline config)
#      -> $OUT/bench_base.json
#   2. bench.py with TMT_INSERT_KERNEL=1      -> $OUT/bench_insertk.json
#      (the Pallas obs-insert kernel's first clean real-chip measurement;
#      >3% win flips it on for the long run)
#      and with TMT_NN_F32=1                  -> $OUT/bench_f32.json
#      (quantifies the bf16 inference win; informational only)
#   3. long online 500-sims ValueSimLP run    -> $OUT/long/   (RUN_H hours)
#      crash-resilient: the driver checkpoints after every training session,
#      so a tunnel drop mid-run costs at most one session — this phase
#      re-waits for the chip and resumes from the checkpoint until the
#      RUN_H budget is spent
#   4. 1000-sims benchmark games on the net   -> $OUT/bench_games.log
#
# Usage: bash scripts/tpu_campaign.sh [OUT_DIR]   (default runs/campaign1)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/campaign1}
RUN_H=${RUN_H:-4}
MAX_WAIT_H=${MAX_WAIT_H:-24}
# Absolute drop-dead time (epoch seconds). The chip is single-tenant, so the
# campaign must be COMPLETELY off it before anything else (e.g. the round
# driver's bench.py) needs it; every phase checks this and the long run's
# budget is clamped to it. 0 = no deadline.
END_BY=${END_BY:-0}
mkdir -p "$OUT"
exec >>"$OUT/campaign.log" 2>&1

echo "=== campaign start $(date -u +%FT%TZ) out=$OUT run_h=$RUN_H end_by=$END_BY"

left_s() {
    # seconds until END_BY (a large number when no deadline is set)
    if [ "$END_BY" = "0" ]; then echo 9999999; else
        echo $((END_BY - $(date +%s))); fi
}

wait_for_chip() {
    # poll until jax sees the TPU; returns 1 if MAX_WAIT_H or END_BY elapses
    local deadline=$((SECONDS + MAX_WAIT_H * 3600))
    until timeout 90 python - <<'EOF'
import jax
assert jax.devices()[0].platform == "tpu"
EOF
    do
        if [ $SECONDS -ge $deadline ]; then
            echo "=== giving up: tunnel still down after ${MAX_WAIT_H}h"
            return 1
        fi
        if [ "$(left_s)" -lt 1200 ]; then
            echo "=== giving up: END_BY deadline reached while tunnel down"
            return 1
        fi
        echo "tunnel down at $(date -u +%T); retrying in 300s"
        sleep 300
    done
    echo "=== chip healthy at $(date -u +%FT%TZ)"
}

# --- 0: wait for the chip -------------------------------------------------
wait_for_chip || exit 1

# --- 1+2: bench baseline, insert-kernel A/B, f32 A/B ----------------------
timeout 2400 python bench.py > "$OUT/bench_base.json"
echo "baseline: $(cat "$OUT/bench_base.json")"
base=$(python -c "import json;print(json.load(open('$OUT/bench_base.json'))['value'])" 2>/dev/null || echo 0)
if [ "$base" = "0" ] || [ -z "$base" ]; then
    echo "=== aborting: baseline bench failed (tunnel degraded?) — not burning the long run"
    exit 1
fi
timeout 2400 env TMT_INSERT_KERNEL=1 python bench.py > "$OUT/bench_insertk.json"
echo "insert-kernel: $(cat "$OUT/bench_insertk.json")"
ik=$(python -c "import json;print(json.load(open('$OUT/bench_insertk.json'))['value'])" 2>/dev/null || echo 0)
use_ik=$(python -c "print(1 if $ik > 1.03*$base else 0)")
echo "decision: insert kernel on=$use_ik (base=$base insertk=$ik)"
ik_flag=""
[ "$use_ik" = "1" ] && ik_flag="--insert_kernel"
timeout 2400 env TMT_NN_F32=1 python bench.py > "$OUT/bench_f32.json" \
    && echo "f32 forward: $(cat "$OUT/bench_f32.json")" \
    || echo "f32 A/B failed (informational only; continuing)"

# --- 3: the long 500-SPM online run (reference v2 training config:
#        500 sims/move, guideline scoring, min_visit 25). Resumes from the
#        per-session checkpoint after a tunnel drop until RUN_H is spent. ---
mkdir -p "$OUT/long"
budget=$((RUN_H * 3600))
# clamp to the END_BY deadline, leaving 50 min for phase 4 + final save
room=$(($(left_s) - 3000))
[ "$room" -lt "$budget" ] && budget=$room && \
    echo "long-run budget clamped to $((budget / 60)) min by END_BY"
long_end=$((SECONDS + budget))
attempt=0
resume_flag=""
while [ $((long_end - SECONDS)) -gt 300 ]; do
    attempt=$((attempt + 1))
    echo "=== long run attempt $attempt ($(((long_end - SECONDS) / 60)) min left) at $(date -u +%FT%TZ)"
    timeout $((long_end - SECONDS)) \
    python -m tetris_mcts_tpu play --bf16 $ik_flag $resume_flag \
        --agent_type ValueSimLP --online --endless --mcts_sims 500 --batch 128 \
        --max_nodes 8192 --max_obs 8192 --min_visits 25 \
        --memory_size 500000 --memory_growth 20000 \
        --train_rows 20000 --train_batch 512 \
        --train_iters_per_val 200 --train_max_iters 2000 \
        --seed 4242 --metrics "$OUT/long/m.jsonl" \
        --checkpoint "$OUT/long/model.msgpack" >> "$OUT/long/run.log" 2>&1
    rc=$?
    resume_flag="--load_model"
    if [ $rc -eq 124 ] || [ $rc -eq 0 ]; then
        break        # clean end of budget (timeout) or voluntary exit
    fi
    echo "=== long run died rc=$rc at $(date -u +%FT%TZ); re-waiting for chip"
    wait_for_chip || break
done
echo "=== long run finished at $(date -u +%FT%TZ) after $attempt attempt(s)"

# --- 4: benchmark-game channel (reference cycle.sh: 1000-sims eval) -------
if [ "$(left_s)" -lt 1500 ]; then
    echo "=== skipping benchmark games: END_BY deadline too close"
    echo "=== campaign done (clamped) $(date -u +%FT%TZ)"
    exit 0
fi
wait_for_chip || exit 1
timeout $(($(left_s) < 3600 ? $(left_s) - 300 : 3600)) \
python -m tetris_mcts_tpu play --bf16 \
    --agent_type ValueSimLP --benchmark --mcts_sims 1000 --batch 32 \
    --ngames 32 --max_nodes 16384 --max_obs 16384 \
    --load_model --checkpoint "$OUT/long/model.msgpack" \
    --metrics "$OUT/bench_games.jsonl" --seed 999 > "$OUT/bench_games.log" 2>&1
echo "=== campaign done $(date -u +%FT%TZ)"
