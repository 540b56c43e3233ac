"""Per-stage latency + FLOP/HBM roofline report of the registration pipeline.

Capability parity with the reference's ad-hoc per-stage wall-clock prints
(deepVCP.py:28-98), but measured properly: each stage is separately jitted,
warmed up, synchronized via host fetch, and annotated with the compiler's
cost analysis (FLOPs + HBM bytes accessed) against the chip's roofline —
naming which stages are compute-, bandwidth-, or overhead-bound. This
workload is gather/selection-bound by design, so raw MFU is expected to be
low; the per-stage bound classification is the actionable output.

    python -m deepvcp_tpu.profile_stages --num-points 10000 [--batch B] [--cpu]
"""

from __future__ import annotations

import argparse
import json

# v5e roofline (per chip): 197 TFLOP/s bf16 MXU peak (f32 ~ half), 819 GB/s
# HBM. Used only for % columns; absolute numbers are reported alongside.
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def stage_cost(jitted, *args):
    """Compiler cost analysis {flops, bytes} for a jitted fn, or None."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca:
            return None
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=10000)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from deepvcp_tpu import DeepVCPConfig
    from deepvcp_tpu.loss.registration import svd_refine
    from deepvcp_tpu.models import DeepVCP, FeatureExtraction
    from deepvcp_tpu.models.layers import CPG, FeatEmbedding, WeightingLayer
    from deepvcp_tpu.ops import index_points, voxelize
    from deepvcp_tpu.ops.knn import approx_knn
    from deepvcp_tpu.utils.profiling import StageTimer

    cfg = (
        DeepVCPConfig.tiny(args.num_points, use_normal=False)
        if args.tiny
        else DeepVCPConfig(num_points=args.num_points, use_normal=False)
    )
    B = args.batch
    rng = np.random.default_rng(0)
    src = jnp.asarray(
        rng.uniform(-10, 10, (B, cfg.num_points, 3)).astype(np.float32)
    )
    tgt = jnp.asarray(
        rng.uniform(-10, 10, (B, cfg.num_points, 3)).astype(np.float32)
    )
    model = DeepVCP(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), src, tgt,
        jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), jnp.zeros((B, 3)),
        train=False,
    )
    params = variables["params"]
    K, ns, C = cfg.num_keypoints, cfg.num_neighbors, cfg.num_candidates

    fe = FeatureExtraction(cfg, name="fe")
    wl = WeightingLayer(cfg.wl_mlp, name="wl")
    dfe = FeatEmbedding(cfg.dfe_mlp, activation=cfg.dfe_activation, name="dfe")
    cpg = CPG(cfg.cpg_channels, grid_size=cfg.grid_size, name="cpg")

    f_fe = jax.jit(
        lambda x: fe.apply({"params": params["fe"],
                            "batch_stats": variables["batch_stats"].get("fe", {})},
                           x, None, train=False)
    )
    f_wl = jax.jit(lambda f: wl.apply({"params": params["wl"]}, f))
    f_knn = jax.jit(
        lambda t_, q_: approx_knn(
            t_, q_, ns, chunk=cfg.knn_query_chunk,
            select_dtype=cfg.knn_select_dtype_effective,
        )
    )
    f_dfe = jax.jit(lambda x: dfe.apply({"params": params["dfe"]}, x))
    f_cpg = jax.jit(
        lambda s, t_, c: cpg.apply({"params": params["cpg"]}, s, t_, c)
    )
    f_solve = jax.jit(lambda kp, vcp: svd_refine(kp, vcp)[:2])

    stage_args = {}

    def run_once(timer: StageTimer):
        sf = timer.timeit("fe(src)", f_fe, src)
        tf = timer.timeit("fe(tgt)", f_fe, tgt)
        sal = timer.timeit("weighting", f_wl, sf)
        _, kp_idx = jax.lax.top_k(sal, K)
        kp = index_points(src, kp_idx)
        cand = voxelize(kp, cfg.search_radius, cfg.voxel_len).reshape(B, K * C, 3)
        d, i = timer.timeit("candidate knn", f_knn, tgt, cand)
        tgt_cat = jnp.zeros((B, K, C, ns, 3 + cfg.feat_dim))
        src_cat = jnp.zeros((B, K, ns, 3 + cfg.feat_dim))
        sd = timer.timeit("dfe(src)", f_dfe, src_cat)
        td = timer.timeit("dfe(tgt)", f_dfe, tgt_cat)
        vcp, _ = timer.timeit(
            "cpg", f_cpg, sd, td, cand.reshape(B, K, C, 3)
        )
        timer.timeit("svd solve", f_solve, kp, vcp)
        stage_args.update({
            "fe(src)": (f_fe, (src,)),
            "fe(tgt)": (f_fe, (tgt,)),
            "weighting": (f_wl, (sf,)),
            "candidate knn": (f_knn, (tgt, cand)),
            "dfe(src)": (f_dfe, (src_cat,)),
            "dfe(tgt)": (f_dfe, (tgt_cat,)),
            "cpg": (f_cpg, (sd, td, cand.reshape(B, K, C, 3))),
            "svd solve": (f_solve, (kp, vcp)),
        })

    # warm-up (compiles)
    run_once(StageTimer())
    best = None
    for _ in range(args.iters):
        t = StageTimer()
        run_once(t)
        if best is None or sum(t.as_dict().values()) < sum(best.as_dict().values()):
            best = t
    print(best.report())

    # roofline: compiler cost analysis per stage vs chip peaks
    table = {}
    lines = [
        f"{'stage':16s} {'ms':>8s} {'GFLOP':>9s} {'GB':>8s} {'TFLOP/s':>8s}"
        f" {'GB/s':>7s} {'%flops':>7s} {'%bw':>6s}  bound"
    ]
    for name, (fn, a) in stage_args.items():
        cost = stage_cost(fn, *a)
        ms = best.as_dict().get(name, 0.0) * 1e3
        if cost is None or ms <= 0:
            continue
        sec = ms / 1e3
        tflops = cost["flops"] / sec / 1e12
        gbs = cost["bytes"] / sec / 1e9
        pf = 100.0 * cost["flops"] / sec / PEAK_FLOPS
        pb = 100.0 * cost["bytes"] / sec / PEAK_BYTES
        bound = (
            "compute" if pf >= max(pb, 5.0)
            else "bandwidth" if pb >= 5.0
            else "overhead"
        )
        lines.append(
            f"{name:16s} {ms:8.2f} {cost['flops']/1e9:9.2f}"
            f" {cost['bytes']/1e9:8.3f} {tflops:8.2f} {gbs:7.1f}"
            f" {pf:7.2f} {pb:6.1f}  {bound}"
        )
        table[name] = {
            "ms": round(ms, 3),
            "gflop": round(cost["flops"] / 1e9, 3),
            "gb": round(cost["bytes"] / 1e9, 4),
            "pct_peak_flops": round(pf, 3),
            "pct_peak_bw": round(pb, 2),
            "bound": bound,
        }
    print("\n".join(lines))
    print(json.dumps({
        "batch": B,
        "stages_ms": {k: v * 1e3 for k, v in best.as_dict().items()},
        "roofline": table,
    }))


if __name__ == "__main__":
    main()
