#!/bin/sh
# Second sequencing leg: after the r5-eval + r5b chain (PID $1) exits,
# run the rotation-push campaign (r5c), then the headline bench with the
# new two-level default — all in one tunnel-client succession.
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain2] r5b chain (pid $PID) exited; running campaign_r5c"
python -u scripts/campaign_r5c.py
echo "[chain2] r5c done; running bench"
python bench.py --iters 5 > artifacts/bench_r5_preview.json 2> artifacts/bench_r5_preview.log
echo "[chain2] ALL DONE"
cat artifacts/bench_r5_preview.json
