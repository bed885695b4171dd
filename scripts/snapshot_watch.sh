#!/bin/bash
# FALLBACK watcher: the driver itself now snapshots the exact benchmarked
# net at benchmark time (selfplay._run_benchmark_round — a file watcher can
# only copy up to 60 s late, after further training updates). Keep this only
# for runs without driver-side checkpointing.
# Usage: bash scripts/snapshot_watch.sh [OUT_DIR] ; stops with the round.
set -u
OUT=${1:-runs/campaign2}
last=0
while sleep 60; do
    [ -f "$OUT/m.jsonl" ] || continue
    # NB: grep -c prints 0 itself on no match (its exit code 1 must not
    # trigger an `|| echo 0`, which would make $n the two-line "0\n0")
    n=$(grep -c '"kind": "benchmark"' "$OUT/m.jsonl" 2>/dev/null || true)
    n=${n:-0}
    if [ "$n" -gt "$last" ] && [ -f "$OUT/model.msgpack" ]; then
        cp "$OUT/model.msgpack" "$OUT/model_bench$n.msgpack"
        echo "$(date -u +%FT%TZ) snapshot after benchmark event $n"
        last=$n
    fi
done
