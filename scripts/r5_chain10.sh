#!/bin/sh
# Tenth leg: after chain9 (K8 + bench, PID $1), run r5h O2 (rotation-
# model odometry; O1 skips as done).
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain10] chain9 exited; running r5h O2"
python -u scripts/campaign_r5h.py
echo "[chain10] ALL DONE"
