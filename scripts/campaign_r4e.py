"""Round-4 campaign, part 5: fine-grid KITTI stage.

Part 4 (K3) showed the KITTI-scale rotation floor (0.3-0.4 deg GT-free)
is the CPG soft-argmax resolution at 0.4 m voxels, not training steps —
exactly the situation the ModelNet fine-grid stage solved (voxel 0.4 ->
0.2 took uniform RRE 2.4 -> 0.8 deg). Same move at meter scale:

  K4  fine-tune model_k3 under search_radius=0.6 m / voxel_len=0.2 m
      (216 -> 343 candidates, 2x finer pitch; CPG convs are
      grid-size-agnostic so params transfer), jitter ball (5 deg,
      0.4 m) covering the held identity-init error; guarded sweep;
      `beats_paper_rre` (0.164 deg, with the synthetic-proxy caveat).

Artifacts: artifacts/campaign_r4e/. Restart-safe.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from campaign_r4_common import (  # noqa: E402
    Campaign,
    load_trained,
    registrar_eval,
    residual_tcfg,
    train_model,
    variables_of,
    wait_for_device,
)


def main():
    import jax

    TINY = os.environ.get("CAMPAIGN_TINY") == "1"
    if TINY:
        jax.config.update("jax_platforms", "cpu")

    from deepvcp_tpu import DeepVCPConfig
    from deepvcp_tpu.data import LidarLikeDataset, batch_iterator

    wait_for_device()
    c = Campaign("campaign_r4e")

    if TINY:
        N, MAX_RANGE, EXTENT = 128, 2.0, 5.0
        n_train, n_held = 4, 2
        BUDGET = 0.2
    else:
        N, MAX_RANGE, EXTENT = 10000, 25.0, 55.0
        n_train, n_held = 256, 16
        BUDGET = 16.0

    if TINY:
        cfg_coarse = dataclasses.replace(
            DeepVCPConfig.tiny(num_points=N, use_normal=False),
            neighbor_method="banded", spatial_extent=EXTENT, band_tile=64,
        )
        cfg_fine = cfg_coarse
    else:
        cfg_coarse = DeepVCPConfig(
            num_points=N, use_normal=False, spatial_extent=EXTENT
        )
        cfg_fine = dataclasses.replace(
            cfg_coarse, search_radius=0.6, voxel_len=0.2
        )
    train_k = LidarLikeDataset(num_clouds=n_train, num_points=N,
                               max_range=MAX_RANGE, seed=10)
    held_k = {
        "lidar25_small": LidarLikeDataset(
            num_clouds=n_held, num_points=N, max_range=MAX_RANGE, seed=110,
            max_rotation_deg=5.0, max_translation=0.5),
    }
    tcfg_coarse = residual_tcfg(rot_jitter_deg=6.0, trans_jitter=0.5)
    tcfg_fine = residual_tcfg(rot_jitter_deg=5.0, trans_jitter=0.4)
    spe = len(train_k)
    sample = next(batch_iterator(train_k, 1, epoch=0, seed=0))

    # fine grid = 343 vs 216 candidates -> ~1.6x the K step (33 ms)
    step_ms = 90.0 if TINY else 53.0
    epochs = max(min(int(BUDGET * 60e3 / step_ms) // spe, 200), 1)

    if not c.done("K4_fine_grid"):
        try:
            init_k = None
            if not TINY:
                tr_k3 = load_trained(
                    Campaign("campaign_r4d"), "model_k3", cfg_coarse,
                    tcfg_coarse, 177, sample, spe)
                init_k = tr_k3.state
            tr_k4, res = train_model(
                c, "model_k4", cfg_fine, tcfg_fine, epochs, train_k,
                held_k, sample, spe, init_state=init_k)
            if init_k is not None:
                del tr_k3, init_k
            c.save("K4_fine_grid", res)
            variables = variables_of(tr_k4)
            sweep = {
                f"iters_{i}": {
                    "lidar25_small": registrar_eval(
                        cfg_fine, variables, held_k["lidar25_small"], i,
                        batches=8)}
                for i in ((1,) if TINY else (1, 2))
            }
            best = min((v["lidar25_small"] for v in sweep.values()),
                       key=lambda r: r["gt_free_rre_deg"])
            sweep["beats_paper_rre"] = bool(
                best["gt_free_rre_deg"] <= 0.164)
            sweep["paper_bar"] = {"rre_deg": 0.164, "rte_m": 0.071,
                                  "caveat": "paper = real KITTI; this = "
                                            "synthetic lidar-like proxy"}
            c.save("K4_sweep", sweep)
            del tr_k4
        except Exception:
            c.save("K4_fine_grid", {"error": traceback.format_exc()})

    print("[campaign_r4e] DONE", flush=True)


if __name__ == "__main__":
    main()
