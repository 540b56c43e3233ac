"""Round-5 campaign part B: TPU validation + benchmarking of the
two-level candidate path (W1-W3) and the global SO(3) initializer
evaluation (W4). Runs AFTER campaign_r5 releases the TPU client.

  W1_onehot_tpu      Mosaic lowering + exactness of the one-hot MXU
                     gather at the operating size, timed vs XLA
                     take_along_axis.
  W2_twolevel_bench  Registrar per-call latency at the bench operating
                     point (N=10k, extent-20, B=1): tgt_knn flat vs
                     two-level; plus selection recall of the two-level
                     path vs exact at that point.
  W3_twolevel_tax    GT-free accuracy of the best KITTI model under
                     flat vs two-level (T=512/1024) — the go/no-go for
                     the default gate at lidar scales.
  W4_so3_noise       full-SO(3) + sensor-noise pairs: identity init vs
                     so3_global_init feeding the ModelNet cascade.

Artifacts: artifacts/campaign_r5b/. Restart-safe.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from campaign_r4_common import Campaign, ROOT, wait_for_device  # noqa: E402
from campaign_r5 import eval_reg  # noqa: E402


def main():
    import jax

    TINY = os.environ.get("CAMPAIGN_TINY") == "1"
    if TINY:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from deepvcp_tpu import DeepVCPConfig, pretrained
    from deepvcp_tpu.data import (
        LidarLikeDataset,
        SyntheticDataset,
        batch_iterator,
    )
    from deepvcp_tpu.registration import CascadeRegistrar, Registrar

    wait_for_device()
    c = Campaign("campaign_r5b")

    def fetch(x):
        return np.asarray(x)

    def timeit(fn, iters=10):
        fn()  # compile + warmup
        fn()
        ts = []
        for _ in range(iters):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    # --- W1: one-hot gather kernel on the real TPU -----------------------
    if not c.done("W1_onehot_tpu"):
        try:
            from deepvcp_tpu.ops.pallas.onehot_gather import onehot_gather

            rng = np.random.default_rng(0)
            if TINY:
                B, K, T, D, Q = 1, 2, 64, 35, 128
            else:
                B, K, T, D, Q = 1, 64, 512, 35, 6912
            table = jnp.asarray(
                rng.normal(size=(B, K, T, D)).astype(np.float32))
            idx = jnp.asarray(
                rng.integers(0, T, (B, K, Q)).astype(np.int32))
            out = onehot_gather(table, idx)
            ref = jnp.take_along_axis(table, idx[..., None], axis=-2)
            exact = bool((fetch(out) == fetch(ref)).all())
            # fetch a CHECKSUM, not the 62 MB output: the tunnel moves
            # ~30 MB/s, so a full-array fetch times the relay, not the
            # device (first W1 measured 2-3 SECONDS of pure transfer)
            g_pal = jax.jit(lambda tb, ix: jnp.sum(onehot_gather(tb, ix)))
            t_pal = timeit(lambda: fetch(g_pal(table, idx)))
            f_xla = jax.jit(
                lambda tb, ix: jnp.sum(jnp.take_along_axis(
                    tb, ix[..., None], axis=-2)))
            t_xla = timeit(lambda: fetch(f_xla(table, idx)))
            c.save("W1_onehot_tpu", {
                "bit_exact": exact,
                "pallas_ms": round(t_pal * 1e3, 3),
                "xla_gather_ms": round(t_xla * 1e3, 3),
                "note": "checksum fetch; times still include one ~23 ms "
                        "tunnel round trip - compare the difference",
            })
        except Exception:
            c.save("W1_onehot_tpu", {"error": traceback.format_exc()})

    # --- W2: end-to-end latency at the bench operating point -------------
    if not c.done("W2_twolevel_bench"):
        try:
            if TINY:
                N, EXT = 256, 20.0
                base = dataclasses.replace(
                    DeepVCPConfig.tiny(num_points=N, use_normal=False),
                    spatial_extent=EXT, neighbor_method="banded",
                    band_tile=64, tgt_knn_table=128)
            else:
                N, EXT = 10000, 20.0
                base = DeepVCPConfig(num_points=N, use_normal=False)
            from deepvcp_tpu.models import DeepVCP

            ds = SyntheticDataset(num_clouds=1, num_points=N,
                                  use_normal=False, extent=EXT / 2)
            src, tgt, R, t = next(batch_iterator(ds, 1, epoch=0, seed=0))
            src, tgt = jnp.asarray(src), jnp.asarray(tgt)
            model = DeepVCP(cfg=base)
            variables = jax.jit(
                model.init, static_argnames=("train",))(
                jax.random.key(0), src, tgt, jnp.asarray(R),
                jnp.asarray(t), train=False)
            res = {}
            for mode in ("flat", "two_level"):
                cfg_m = dataclasses.replace(base, tgt_knn=mode)
                reg = Registrar(cfg_m, variables)

                def call():
                    return fetch(reg(src, tgt).R)

                per_call = timeit(call, iters=8)
                # stream mode (amortizes the host round trip)
                def stream(n=20):
                    out = None
                    for _ in range(n):
                        out = reg(src, tgt)
                    fetch(out.R)

                stream(2)
                t0 = time.time()
                stream(30)
                res[mode] = {
                    "per_call_ms": round(per_call * 1e3, 2),
                    "stream_ms_per_pair": round(
                        (time.time() - t0) / 30 * 1e3, 2),
                }
            # selection recall of the two-level path vs exact at this
            # operating point (uses the model-side table default)
            from deepvcp_tpu.ops.knn import knn
            from deepvcp_tpu.ops.two_level import two_level_rows

            K, C, k = base.num_keypoints, base.num_candidates, \
                base.num_neighbors
            kp = jnp.asarray(
                np.random.default_rng(1).uniform(
                    -EXT / 2 * 0.8, EXT / 2 * 0.8, (1, K, 3)
                ).astype(np.float32))
            reach = base.grid_reach
            cand = kp[:, :, None, :] + jnp.asarray(
                np.random.default_rng(2).uniform(
                    -reach, reach, (1, K, C, 3)).astype(np.float32))
            rows = tgt[..., :3]
            out_tl = fetch(two_level_rows(
                rows, rows, kp, cand, k,
                table_size=base.tgt_knn_table,
                select_dtype="bfloat16",
                use_pallas=not TINY))
            _, idx_ex = knn(rows, cand.reshape(1, K * C, 3), k)
            ref_rows = fetch(jnp.take_along_axis(
                rows, idx_ex.reshape(1, K * C * k)[..., None], axis=-2
            ).reshape(1, K, C, k, 3))
            m = 0.0
            for kk in range(K):
                for cc in range(0, C, 9):
                    o = {tuple(np.round(r, 5))
                         for r in out_tl[0, kk, cc]}
                    r_ = {tuple(np.round(r, 5))
                          for r in ref_rows[0, kk, cc]}
                    m += len(o & r_) / k
            res["recall_vs_exact"] = round(m / (K * ((C + 8) // 9)), 4)
            c.save("W2_twolevel_bench", res)
        except Exception:
            c.save("W2_twolevel_bench", {"error": traceback.format_exc()})

    # --- W3: two-level accuracy tax at KITTI scale ------------------------
    if not c.done("W3_twolevel_tax"):
        try:
            if TINY:
                c.save("W3_twolevel_tax", {"skipped": "tiny mode"})
            else:
                N = 10000
                cfg_k = DeepVCPConfig(
                    num_points=N, use_normal=False, spatial_extent=55.0)
                v_k = pretrained.load_variables(os.path.join(
                    ROOT, "artifacts/campaign_r4b/model_k1/final"))
                held = LidarLikeDataset(
                    num_clouds=16, num_points=N, max_range=25.0,
                    seed=110, max_rotation_deg=5.0, max_translation=0.5)
                res = {}
                for tag, kw in (
                    ("flat", {"tgt_knn": "flat"}),
                    ("two_level_512", {"tgt_knn": "two_level",
                                       "tgt_knn_table": 512}),
                    ("two_level_1024", {"tgt_knn": "two_level",
                                        "tgt_knn_table": 1024}),
                ):
                    cfg_m = dataclasses.replace(cfg_k, **kw)
                    reg = Registrar(cfg_m, v_k,
                                    use_saliency_weights=True,
                                    refine_iters=2, guard=True)
                    res[tag] = eval_reg(reg, held)
                res["tax_512_deg"] = round(
                    res["two_level_512"]["gt_free_rre_deg"]
                    - res["flat"]["gt_free_rre_deg"], 4)
                res["tax_1024_deg"] = round(
                    res["two_level_1024"]["gt_free_rre_deg"]
                    - res["flat"]["gt_free_rre_deg"], 4)
                c.save("W3_twolevel_tax", res)
        except Exception:
            c.save("W3_twolevel_tax", {"error": traceback.format_exc()})

    # --- W5: two-level stage attribution ----------------------------------
    # W2 measured two-level SLOWER end-to-end than flat (17.6 vs 7.8 ms
    # stream) — break the path into its stages to find the regression:
    # level-1 top-T selection, table gather, level-2 selection, and the
    # two gather variants (Pallas one-hot vs XLA take_along_axis).
    if not c.done("W5_stage_split") and not TINY:
        try:
            from deepvcp_tpu.ops.grouping import index_points
            from deepvcp_tpu.ops.knn import approx_knn
            from deepvcp_tpu.ops.pallas.onehot_gather import onehot_gather
            from deepvcp_tpu.ops.two_level import two_level_rows

            rng = np.random.default_rng(3)
            N, K, C, k, T, D = 10000, 64, 216, 32, 512, 35
            tgt_xyz = jnp.asarray(
                rng.uniform(-10, 10, (1, N, 3)).astype(np.float32))
            rows = jnp.concatenate(
                [tgt_xyz, jnp.asarray(rng.normal(
                    size=(1, N, D - 3)).astype(np.float32))], axis=-1)
            kp = jnp.asarray(
                rng.uniform(-8, 8, (1, K, 3)).astype(np.float32))
            cand = kp[:, :, None, :] + jnp.asarray(
                rng.uniform(-1, 1, (1, K, C, 3)).astype(np.float32))
            table = jnp.asarray(rng.normal(
                size=(1, K, T, D)).astype(np.float32))
            idx_q = jnp.asarray(rng.integers(
                0, T, (1, K, C * k)).astype(np.int32))
            flat_q = cand.reshape(1, K * C, 3)

            res = {}

            def t_of(f, *a):
                g = jax.jit(lambda *aa: jnp.sum(f(*aa)))
                return round(timeit(lambda: fetch(g(*a))) * 1e3, 3)

            res["l1_top512_bf16"] = t_of(
                lambda t_, q_: approx_knn(
                    t_, q_, T, select_dtype="bfloat16")[1],
                tgt_xyz, kp)
            res["l1_top512_f32"] = t_of(
                lambda t_, q_: approx_knn(t_, q_, T)[1], tgt_xyz, kp)
            res["table_gather"] = t_of(
                lambda r_, t_, q_: index_points(
                    r_, approx_knn(t_, q_, T,
                                   select_dtype="bfloat16")[1]),
                rows, tgt_xyz, kp)
            res["pallas_onehot"] = t_of(onehot_gather, table, idx_q)
            res["xla_table_gather"] = t_of(
                lambda tb, ix: jnp.take_along_axis(
                    tb, ix[..., None], axis=-2), table, idx_q)
            res["two_level_full"] = t_of(
                lambda t_, r_, k_, c_: two_level_rows(
                    t_, r_, k_, c_, k, table_size=T,
                    select_dtype="bfloat16", use_pallas=True),
                tgt_xyz, rows, kp, cand)
            res["two_level_full_xla"] = t_of(
                lambda t_, r_, k_, c_: two_level_rows(
                    t_, r_, k_, c_, k, table_size=T,
                    select_dtype="bfloat16", use_pallas=False),
                tgt_xyz, rows, kp, cand)
            # flat-path reference stages at the same operating point
            res["flat_knn"] = t_of(
                lambda t_, q_: approx_knn(
                    t_, q_, k, chunk=4608, select_dtype="bfloat16")[1],
                tgt_xyz, flat_q)
            res["flat_gather"] = t_of(
                lambda r_, t_, q_: index_points(
                    r_, approx_knn(t_, q_, k, chunk=4608,
                                   select_dtype="bfloat16")[1]),
                rows, tgt_xyz, flat_q)
            res["note"] = ("checksum fetch; subtract the ~23 ms tunnel "
                           "round trip common to every row")
            c.save("W5_stage_split", res)
        except Exception:
            c.save("W5_stage_split", {"error": traceback.format_exc()})

    # --- W4: global SO(3) initializer on noisy full-SO(3) pairs -----------
    if not c.done("W4_so3_noise"):
        try:
            from deepvcp_tpu.initializer import so3_global_init
            from deepvcp_tpu.utils.rotations import rotation_geodesic_deg

            if TINY:
                N, n_held = 128, 2
                iters = 1
            else:
                N, n_held = 10000, 16
                iters = 2
            held = SyntheticDataset(
                num_clouds=n_held, num_points=N, extent=1.0, seed=102,
                noise_std=0.01)         # full SO(3), 1% sensor noise
            if TINY:
                cfg_c = dataclasses.replace(
                    DeepVCPConfig.tiny(num_points=N, use_normal=False),
                    spatial_extent=5.0, neighbor_method="banded",
                    band_tile=64)
                from deepvcp_tpu.models import DeepVCP

                s0, t0_, R0, tt0 = next(batch_iterator(held, 1, 0, 0))
                model = DeepVCP(cfg=cfg_c)
                v_c = model.init(jax.random.key(0), jnp.asarray(s0),
                                 jnp.asarray(t0_), jnp.asarray(R0),
                                 jnp.asarray(tt0), train=False)
                stages = [(cfg_c, v_c, iters)]
            else:
                cfg_c, v_c = pretrained.load("modelnet-coarse",
                                             num_points=N)
                cfg_f, v_f = pretrained.load("modelnet-fine",
                                             num_points=N)
                stages = [(cfg_c, v_c, 2), (cfg_f, v_f, 1)]
            regs = [Registrar(cf, vv, use_saliency_weights=True,
                              refine_iters=it, guard=True)
                    for cf, vv, it in stages]
            casc = CascadeRegistrar(regs)
            rre_id = rre_init = rre_ref = rte_ref = 0.0
            n = 0
            for srcb, tgtb, Rb, tb in batch_iterator(
                    held, 2, epoch=0, seed=777, shuffle=False):
                srcb, tgtb = jnp.asarray(srcb), jnp.asarray(tgtb)
                Rb, tb = jnp.asarray(Rb), jnp.asarray(tb)
                eye = jnp.broadcast_to(jnp.eye(3), Rb.shape)
                rre_id += float(jnp.mean(
                    rotation_geodesic_deg(eye, Rb)))
                init = so3_global_init(srcb, tgtb)
                rre_init += float(jnp.mean(
                    rotation_geodesic_deg(init.R, Rb)))
                out = casc(srcb, tgtb, init.R, init.t)
                rre_ref += float(jnp.mean(
                    rotation_geodesic_deg(out.R, Rb)))
                rte_ref += float(jnp.mean(
                    jnp.linalg.norm(out.t - tb, axis=-1)))
                n += 1
                if n >= 8:
                    break
            c.save("W4_so3_noise", {
                "identity_rre_deg": round(rre_id / n, 2),
                "after_global_init_rre_deg": round(rre_init / n, 3),
                "after_cascade_rre_deg": round(rre_ref / n, 3),
                "after_cascade_rte": round(rte_ref / n, 4),
                "noise_std": 0.01,
                "target": "init < 10 deg, refined < 2 deg (VERDICT #5)",
            })
        except Exception:
            c.save("W4_so3_noise", {"error": traceback.format_exc()})

    print("[campaign_r5b] DONE", flush=True)


if __name__ == "__main__":
    main()
