"""Per-stage latency report of the registration pipeline.

Capability parity with the reference's ad-hoc per-stage wall-clock prints
(deepVCP.py:28-98), but measured properly: each stage is separately jitted,
warmed up, and synchronized via host fetch.

    python -m deepvcp_tpu.profile_stages --num-points 10000 [--cpu]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=10000)
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
    rng = np.random.default_rng(0)
    src = jnp.asarray(
        rng.uniform(-10, 10, (1, cfg.num_points, 3)).astype(np.float32)
    )
    tgt = jnp.asarray(
        rng.uniform(-10, 10, (1, cfg.num_points, 3)).astype(np.float32)
    )
    model = DeepVCP(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), src, tgt, jnp.eye(3)[None], jnp.zeros((1, 3)),
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

    def run_once(timer: StageTimer):
        sf = timer.timeit("fe(src)", f_fe, src)
        tf = timer.timeit("fe(tgt)", f_fe, tgt)
        sal = timer.timeit("weighting", f_wl, sf)
        _, kp_idx = jax.lax.top_k(sal, K)
        kp = index_points(src, kp_idx)
        cand = voxelize(kp, cfg.search_radius, cfg.voxel_len).reshape(1, K * C, 3)
        d, i = timer.timeit("candidate knn", f_knn, tgt, cand)
        tgt_cat = jnp.zeros((1, K, C, ns, 3 + cfg.feat_dim))
        src_cat = jnp.zeros((1, K, ns, 3 + cfg.feat_dim))
        sd = timer.timeit("dfe(src)", f_dfe, src_cat)
        td = timer.timeit("dfe(tgt)", f_dfe, tgt_cat)
        vcp, _ = timer.timeit(
            "cpg", f_cpg, sd, td, cand.reshape(1, K, C, 3)
        )
        timer.timeit("svd solve", f_solve, kp, vcp)

    # warm-up (compiles)
    run_once(StageTimer())
    best = None
    for _ in range(args.iters):
        t = StageTimer()
        run_once(t)
        if best is None or sum(t.as_dict().values()) < sum(best.as_dict().values()):
            best = t
    print(best.report())
    print(json.dumps({"stages_ms": {k: v * 1e3 for k, v in best.as_dict().items()}}))


if __name__ == "__main__":
    main()
