#!/bin/sh
# Fourth leg: after chain3 (r5b redo + G2 + pallas bench, PID $1), run
# the guard-ablation campaign (r5e).
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain4] chain3 exited; running campaign_r5e"
python -u scripts/campaign_r5e.py
echo "[chain4] ALL DONE"
