"""Round-4 TPU runner: part 1 (resume at R1S + DECISION recompute) then
part 2 (K1/K2/Q5/Q7) inside ONE process, so the axon tunnel client slot
is acquired once — a second client would wait 7-20 min to be accepted
(CLAUDE.md).  Each part is restart-safe on its own summary.json.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import campaign_r4      # noqa: E402
import campaign_r4b     # noqa: E402

for mod in (campaign_r4, campaign_r4b):
    try:
        mod.main()
    except Exception:
        traceback.print_exc()
        print(f"[run_all] {mod.__name__} FAILED; continuing", flush=True)

print("[run_all] DONE", flush=True)
