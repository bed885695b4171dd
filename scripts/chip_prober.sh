#!/bin/bash
# Featherweight chip-availability prober (round-5 outage): every 5 min, try
# jax.devices() with a 5-min cap; touch $FLAG on success and exit. Costs ~5s
# of host CPU per cycle (imports only), unlike a full campaign attempt which
# re-traces the move program (~minutes of the single host core).
FLAG=${1:-/tmp/chip_up.flag}
rm -f "$FLAG"
while true; do
    if timeout 300 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
        date -u +%FT%TZ > "$FLAG"
        echo "chip up at $(cat "$FLAG")"
        exit 0
    fi
    sleep 240
done
