#!/bin/bash
# Probe the axon TPU relay until it answers, then run on-chip validation and
# the benchmark (fresh processes, per CLAUDE.md relay rules). Logs to /tmp.
cd /root/repo
while true; do
    echo "$(date +%H:%M:%S) probing relay..."
    if timeout 300 python -c "import jax; print(jax.devices())" > /tmp/relay_probe.log 2>&1; then
        echo "$(date +%H:%M:%S) RELAY UP: $(cat /tmp/relay_probe.log)"
        break
    fi
    echo "$(date +%H:%M:%S) relay still down, sleeping 300s"
    sleep 300
done
echo "$(date +%H:%M:%S) running validate_tpu..."
timeout 3000 python tools/validate_tpu.py > /tmp/validate_tpu.log 2>&1
echo "validate_tpu exit=$? (log /tmp/validate_tpu.log)"
echo "$(date +%H:%M:%S) running bench..."
timeout 3000 python bench.py > /tmp/bench.log 2>&1
echo "bench exit=$? (log /tmp/bench.log)"
tail -3 /tmp/bench.log
echo "$(date +%H:%M:%S) MONITOR DONE"
