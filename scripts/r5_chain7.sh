#!/bin/sh
# Seventh (final) leg: after chain6 (G3 routing + final bench, PID $1),
# run the validation campaign (r5f).
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain7] chain6 exited; running campaign_r5f"
python -u scripts/campaign_r5f.py
echo "[chain7] ALL DONE"
