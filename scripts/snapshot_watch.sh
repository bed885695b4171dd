#!/bin/bash
# Snapshot the campaign checkpoint after every benchmark-channel event, so a
# late-run training divergence can never lose the best net (the benchmark
# rounds tell us which snapshot was best). Cheap: one stat per minute.
# Usage: bash scripts/snapshot_watch.sh [OUT_DIR] ; stops with the round.
set -u
OUT=${1:-runs/campaign2}
last=0
while sleep 60; do
    [ -f "$OUT/m.jsonl" ] || continue
    n=$(grep -c '"kind": "benchmark"' "$OUT/m.jsonl" 2>/dev/null || echo 0)
    if [ "$n" -gt "$last" ] && [ -f "$OUT/model.msgpack" ]; then
        cp "$OUT/model.msgpack" "$OUT/model_bench$n.msgpack"
        echo "$(date -u +%FT%TZ) snapshot after benchmark event $n"
        last=$n
    fi
done
