#!/bin/bash
# Poll the axon relay; when it accepts connections, fire the serial TPU queue once.
cd /root/repo
while true; do
  if python - <<'PY'
import socket, sys
s = socket.socket(); s.settimeout(3)
try:
    s.connect(("127.0.0.1", 8082)); sys.exit(0)
except Exception:
    sys.exit(1)
PY
  then
    echo "$(date -u +%FT%TZ) tunnel up — firing queue" >> out/r3/tunnel_watch.log
    sleep 30  # let the relay settle
    bash out/r3/tpu_queue_resume.sh > out/r3/queue_resume.log 2>&1
    echo "$(date -u +%FT%TZ) queue finished rc=$?" >> out/r3/tunnel_watch.log
    exit 0
  fi
  sleep 60
done
