"""Per-stage latency + FLOP/HBM roofline report of the registration pipeline.

Capability parity with the reference's ad-hoc per-stage wall-clock prints
(deepVCP.py:28-98), but measured properly: each stage is AOT-compiled ONCE
(the same executable is timed and asked for the compiler's cost analysis —
no jit/AOT double compile, which matters on the remote-compile TPU leg),
warmed up, synchronized via host fetch, and scored against the chip's
roofline (FLOPs + HBM bytes vs peaks) — naming which stages are compute-,
bandwidth-, or overhead-bound. This workload is gather/selection-bound by
design, so raw MFU is expected to be low; the per-stage bound
classification is the actionable output.

    python -m deepvcp_tpu.profile_stages --num-points 10000 [--batch B] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import time

# v5e roofline (per chip): 197 TFLOP/s bf16 MXU peak (f32 ~ half), 819 GB/s
# HBM. Used only for % columns; absolute numbers are reported alongside.
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=10000)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--reps", type=int, default=10,
                   help="calls per timed stream (pipelined; one sync)")
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
    from deepvcp_tpu.ops import voxelize
    from deepvcp_tpu.ops.grouping import index_points
    from deepvcp_tpu.ops.knn import approx_knn
    from deepvcp_tpu.ops.two_level import two_level_rows

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
    F = cfg.feat_dim

    fe = FeatureExtraction(cfg, name="fe")
    wl = WeightingLayer(cfg.wl_mlp, name="wl")
    dfe = FeatEmbedding(cfg.dfe_mlp, activation=cfg.dfe_activation, name="dfe")
    cpg = CPG(cfg.cpg_channels, grid_size=cfg.grid_size, name="cpg")

    # representative synthetic inputs per stage (values don't change TPU
    # schedules; shapes/dtypes do)
    feats = jnp.asarray(
        rng.standard_normal((B, cfg.num_points, F)).astype(np.float32)
    )
    kp = src[:, :K]
    cand = voxelize(kp, cfg.search_radius, cfg.voxel_len)   # [B,K,C,3]
    cand_flat = cand.reshape(B, K * C, 3)
    src_cat = jnp.asarray(
        rng.standard_normal((B, K, ns, 3 + F)).astype(np.float32)
    )
    tgt_cat = jnp.asarray(
        rng.standard_normal((B, K, C, ns, 3 + F)).astype(np.float32)
    )
    src_desc = jnp.asarray(
        rng.standard_normal((B, K, F)).astype(np.float32)
    )
    tgt_desc = jnp.asarray(
        rng.standard_normal((B, K, C, F)).astype(np.float32)
    )
    vcp = kp + 0.1 * jnp.asarray(
        rng.standard_normal((B, K, 3)).astype(np.float32)
    )

    stages = {
        "fe(src)": (
            lambda x: fe.apply(
                {"params": params["fe"],
                 "batch_stats": variables["batch_stats"].get("fe", {})},
                x, None, train=False),
            (src,),
        ),
        "fe(tgt)": (
            lambda x: fe.apply(
                {"params": params["fe"],
                 "batch_stats": variables["batch_stats"].get("fe", {})},
                x, None, train=False),
            (tgt,),
        ),
        "weighting": (
            lambda f: wl.apply({"params": params["wl"]}, f), (feats,)
        ),
        "candidate knn": (
            lambda t_, q_: approx_knn(
                t_, q_, ns, chunk=cfg.knn_query_chunk,
                select_dtype=cfg.knn_select_dtype_effective,
            ),
            (tgt, cand_flat),
        ),
        # flat-path fused neighbor-row gather (the [K*C*ns]-row random
        # gather the two-level path replaces)
        "row gather": (
            lambda r_, i_: index_points(r_, i_),
            (
                jnp.concatenate([tgt, feats], axis=-1),
                jnp.asarray(rng.integers(
                    0, cfg.num_points, (B, K * C, ns)).astype(np.int32)),
            ),
        ),
        # two-level replacement for candidate knn + row gather
        # (ops/two_level.py: per-keypoint table, local-coordinate
        # selection, one-hot MXU gather)
        "two-level rows": (
            lambda t_, r_, k_, c_: two_level_rows(
                t_, r_, k_, c_, ns,
                table_size=cfg.tgt_knn_table,
                select_dtype=cfg.knn_select_dtype,
                center_select_dtype=cfg.knn_select_dtype_effective,
                use_pallas=(cfg.use_pallas_onehot_gather
                            and jax.default_backend() == "tpu"),
            ),
            (tgt, jnp.concatenate([tgt, feats], axis=-1), kp, cand),
        ),
        "dfe(src)": (
            lambda x: dfe.apply({"params": params["dfe"]}, x), (src_cat,)
        ),
        "dfe(tgt)": (
            lambda x: dfe.apply({"params": params["dfe"]}, x), (tgt_cat,)
        ),
        "cpg": (
            lambda s, t_, c: cpg.apply({"params": params["cpg"]}, s, t_, c),
            (src_desc, tgt_desc, cand),
        ),
        "svd solve": (lambda x, y: svd_refine(x, y)[:2], (kp, vcp)),
    }

    # Timing methodology (axon measured facts, CLAUDE.md): every
    # host<->device sync costs ~23 ms on the tunnel, and
    # block_until_ready is optimistic — only a host FETCH is a true
    # sync. So each stage is timed as a PIPELINED STREAM: `reps`
    # back-to-back dispatches, then one tiny scalar fetch; the same
    # harness around a trivial kernel measures the dispatch+sync floor,
    # which is subtracted before dividing by reps. Per-stage numbers are
    # device time, not tunnel round trips.
    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    def stream_time(compiled, a):
        t_best = None
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.reps):
                out = compiled(*a)
            fetch(out)
            dt = time.perf_counter() - t0
            t_best = dt if t_best is None else min(t_best, dt)
        return t_best

    z = jnp.zeros((8,), jnp.float32)
    nul = jax.jit(lambda x: x + 1.0).lower(z).compile()
    fetch(nul(z))  # warm-up
    null_floor = stream_time(nul, (z,))

    best = {}
    costs = {}
    for name, (fn, a) in stages.items():
        compiled = jax.jit(fn).lower(*a).compile()
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if ca:
                costs[name] = {
                    "flops": float(ca.get("flops", 0.0)),
                    "bytes": float(ca.get("bytes accessed", 0.0)),
                }
        except Exception:
            pass
        fetch(compiled(*a))  # warm-up
        best[name] = max(
            (stream_time(compiled, a) - null_floor) / args.reps, 1e-9
        )

    total = sum(best.values())
    lines = [f"{'stage':16s} {'ms':>8s} {'%':>6s} {'GFLOP':>9s} {'GB':>8s}"
             f" {'TFLOP/s':>8s} {'GB/s':>7s} {'%flops':>7s} {'%bw':>6s}  bound"]
    table = {}
    for name, sec in best.items():
        ms = sec * 1e3
        pct = 100.0 * sec / total if total else 0.0
        cost = costs.get(name)
        if cost is None:
            lines.append(f"{name:16s} {ms:8.2f} {pct:6.1f}")
            continue
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
            f"{name:16s} {ms:8.2f} {pct:6.1f} {cost['flops']/1e9:9.2f}"
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
    lines.append(f"{'total':16s} {total*1e3:8.2f}")
    print("\n".join(lines))
    print(json.dumps({
        "batch": B,
        "stages_ms": {k: v * 1e3 for k, v in best.items()},
        "roofline": table,
    }))


if __name__ == "__main__":
    main()
