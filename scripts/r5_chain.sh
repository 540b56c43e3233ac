#!/bin/sh
# Round-5 TPU sequencing: wait for the running campaign_r5 (PID $1) to
# release the tunnel client, then run the campaign_r5 eval re-run and
# campaign_r5b in ONE python process (one client, one tunnel handoff
# instead of two — the handoff costs 7-20 min each).
set -u
PID=$1
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "[chain] campaign_r5 (pid $PID) exited; running r5 evals + r5b"
python -u -c "
import sys
sys.path.insert(0, 'scripts')
import campaign_r5, campaign_r5b
campaign_r5.main()
campaign_r5b.main()
"
echo "[chain] ALL DONE"
