#!/bin/sh
# Eighth leg: after the K7 rotation campaign (PID $1), run the cascade
# odometry demo (r5h).
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain8] r5g exited; running campaign_r5h"
python -u scripts/campaign_r5h.py
echo "[chain8] ALL DONE"
