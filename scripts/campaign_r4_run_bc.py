"""Round-4 TPU runner, leg 2: resume part 2 (redesigned Q5 + Q7) then
part 3 (lidar-gap levers) inside ONE process — one tunnel client slot.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import campaign_r4b     # noqa: E402
import campaign_r4c     # noqa: E402

for mod in (campaign_r4b, campaign_r4c):
    try:
        mod.main()
    except Exception:
        traceback.print_exc()
        print(f"[run_bc] {mod.__name__} FAILED; continuing", flush=True)

print("[run_bc] DONE", flush=True)
