#!/bin/sh
# Ninth leg: after chain8 (cascade odometry, PID $1), run the long
# rotation-weighted schedule (K8), then the final headline bench.
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain9] chain8 exited; running campaign_r5i"
python -u scripts/campaign_r5i.py
echo "[chain9] r5i done; final bench"
python bench.py --iters 6 > artifacts/bench_r5_final2.json 2> artifacts/bench_r5_final2.log
echo "[chain9] ALL DONE"
cat artifacts/bench_r5_final2.json
