#!/bin/sh
# Final measurement leg: after chain4 (r5e guard ablation, PID $1),
# clear the stale W1-W4 results (pre-precision-fix kernel, pre-redesign
# initializer, transfer-dominated timings) and re-run campaign_r5b.
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain5] chain4 exited; clearing stale W phases"
python - <<'PY'
import json, os
p = "artifacts/campaign_r5b/summary.json"
if os.path.exists(p):
    s = json.load(open(p))
    for k in ("W1_onehot_tpu", "W2_twolevel_bench", "W3_twolevel_tax",
              "W4_so3_noise"):
        s.pop(k, None)
    json.dump(s, open(p, "w"), indent=2)
    print("cleared; keeping", sorted(s))
PY
python -u scripts/campaign_r5b.py
echo "[chain5] ALL DONE"
