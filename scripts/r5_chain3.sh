#!/bin/sh
# Third sequencing leg: after chain2 (r5c + bench preview, PID $1),
# re-run campaign_r5b with the FIXED one-hot kernel (drop the stale W4
# result first — its phase recorded a number, not an error, so the
# restart logic would skip it), then the G2 generalist retry, then the
# headline bench again (now on the Pallas path).
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain3] chain2 (pid $PID) exited"
python - <<'PY'
import json, os
p = "artifacts/campaign_r5b/summary.json"
if os.path.exists(p):
    s = json.load(open(p))
    s.pop("W4_so3_noise", None)   # stale: measured the pre-fix initializer
    json.dump(s, open(p, "w"), indent=2)
    print("cleared stale W4; keeping", sorted(s))
PY
python -u -c "
import sys; sys.path.insert(0, 'scripts')
import campaign_r5b, campaign_r5d
campaign_r5b.main()
campaign_r5d.main()
"
echo "[chain3] campaigns done; running bench (pallas path)"
python bench.py --iters 5 > artifacts/bench_r5_pallas.json 2> artifacts/bench_r5_pallas.log
echo "[chain3] ALL DONE"
cat artifacts/bench_r5_pallas.json
