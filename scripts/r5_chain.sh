#!/bin/sh
# Round-5 TPU sequencing: wait for the running campaign_r5 (PID $1) to
# release the tunnel client, then re-run campaign_r5 (the callback-crash
# eval phases resume with fixed code; trainings skip), then campaign_r5b.
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain] campaign_r5 (pid $PID) exited; re-running eval phases"
python -u scripts/campaign_r5.py
echo "[chain] campaign_r5 rerun done; starting campaign_r5b"
python -u scripts/campaign_r5b.py
echo "[chain] ALL DONE"
