#!/bin/sh
# Probe the axon TPU tunnel (jax.devices() hangs when it is down —
# CLAUDE.md) and launch the given queue script once it answers.
# Usage: sh benchmarks/run_queue_when_tunnel_up.sh benchmarks/measure_hardware_r4f.sh /tmp/r4f.log
QUEUE="$1"
LOG="$2"
i=0
while [ $i -lt 40 ]; do
    if timeout 120 python -c "import jax; print(jax.devices())" \
        > /dev/null 2>&1; then
        echo "tunnel up at $(date); starting $QUEUE" >> "$LOG"
        exec sh "$QUEUE" >> "$LOG" 2>&1
    fi
    echo "tunnel probe failed at $(date); retry in 300s" >> "$LOG"
    sleep 300
    i=$((i + 1))
done
echo "tunnel never came up; giving up at $(date)" >> "$LOG"
exit 1
