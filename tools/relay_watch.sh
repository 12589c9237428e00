#!/bin/sh
# Watch for the axon tunnel relay to come back (port 8082 listening),
# then run the staged real-TPU measurement queue (tools/tpu_queue.sh).
# See CLAUDE.md "relay death" gotcha: nothing inside the container can
# restart the relay; we can only poll and pounce.
cd "$(dirname "$0")/.."
echo "relay_watch: start $(date -u +%FT%TZ)"
while true; do
    if (echo > /dev/tcp/127.0.0.1/8082) 2>/dev/null; then
        echo "relay_watch: port 8082 OPEN $(date -u +%FT%TZ)"
        # Debounce: require it to stay open for 30 s before committing a
        # TPU client to it (a flapping relay mid-handshake can seat-lock).
        sleep 30
        if (echo > /dev/tcp/127.0.0.1/8082) 2>/dev/null; then
            echo "relay_watch: stable, launching queue $(date -u +%FT%TZ)"
            PYTHONUNBUFFERED=1 sh tools/tpu_queue.sh > /tmp/tpu_queue.log 2>&1
            echo "relay_watch: queue finished rc=$? $(date -u +%FT%TZ)"
            exit 0
        fi
        echo "relay_watch: flapped closed again, keep waiting"
    fi
    sleep 60
done
