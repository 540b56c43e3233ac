#!/bin/sh
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain11] r5j exited; running campaign_r5k (frozen-BN K10)"
python -u scripts/campaign_r5k.py
echo "[chain11] ALL DONE"
