#!/bin/sh
# Sixth leg: after chain5 (r5b re-measure, PID $1), run the routing eval
# (campaign_r5d G3; G2 skips as done) and a final bench.
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain6] chain5 exited; running r5d G3 + final bench"
python -u scripts/campaign_r5d.py
python bench.py --iters 5 > artifacts/bench_r5_final.json 2> artifacts/bench_r5_final.log
echo "[chain6] ALL DONE"
cat artifacts/bench_r5_final.json
