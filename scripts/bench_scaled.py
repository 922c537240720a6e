"""Scaled-rig benchmark (BASELINE config 4): 10+ cameras x 10 people.

Measures association-only and full-IK fps on synthetic Panoptic-style
sequences.  With the multi-tile fused ALS kernel the 10x10 config (N = 136)
and a 20-cam rig (N = 216) both run the whole ADMM loop in one VMEM-resident
pallas_call instead of the per-iteration XLA path.

Run ON THE TPU (no --cpu), one process at a time:
    python scripts/bench_scaled.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.eval import mpjpe_vs_ground_truth
from multiview_motion_capture_tpu.tracker import (
    TrackerContext,
    assemble_tracklets,
    run_offline,
)


def bench_config(n_views, n_people, n_frames=200, als_backend="auto",
                 clusters=1, ik_max_views=None, ik_solver="gj", **cfg_kw):
    cfg = PipelineConfig(
        n_views=n_views, max_people=n_people, max_tracks=16,
        max_frames=None, als_max_iter=100, ik_warm_stages=1,
        ik_solver=ik_solver,
        als_backend=als_backend, assoc_clusters=clusters,
        ik_max_views=ik_max_views, **cfg_kw,
    )
    seq = synthetic_sequence(n_frames=n_frames, n_people=n_people,
                             n_views=n_views, cfg=cfg, seed=0,
                             noise_px=1.0, drop_prob=0.05)
    kps = jnp.asarray(seq.batch.kps)
    valid = jnp.asarray(seq.batch.valid)
    out = {}
    for use_ik, name in ((False, "assoc_tri"), (True, "full_ik")):
        ctx = TrackerContext.build(seq.cameras, cfg, use_ik=use_ik)
        _, o = run_offline(ctx, kps, valid)       # compile
        jax.block_until_ready(o.pose3d)
        t0 = time.perf_counter()
        _, o = run_offline(ctx, kps, valid)
        jax.block_until_ready(o.pose3d)
        dt = time.perf_counter() - t0
        tlets = assemble_tracklets(jax.device_get(o))
        long = [t for t in tlets if len(t) >= n_frames // 2]
        mpjpe = mpjpe_vs_ground_truth(
            long, seq.gt_3d,
            joint_map=(None if not use_ik else None),
        ) if not use_ik else float("nan")
        out[name] = {
            "fps": round(n_frames / dt, 1),
            "n_tracklets": len(tlets),
            "n_long": len(long),
            "mpjpe_m": None if np.isnan(mpjpe) else round(mpjpe, 4),
            "pallas_als": (ctx.als_pallas_ctx is not None
                           or ctx.cluster_pallas_ctx is not None),
            "n_matrix": cfg.n_matrix,
        }
    return out


def main():
    results = {
        "10cam_x_10ppl": bench_config(10, 10),
        "20cam_x_10ppl": bench_config(20, 10, n_frames=100),
        # N = 336, the widest monolithic 3-tile fused-kernel config
        "32cam_x_10ppl": bench_config(32, 10, n_frames=60),
        # N = 16 + 640 = 656, past the fused kernel's 384: hierarchical
        # association (2 interleaved clusters of 32 cams, each N_c = 336 on
        # the 3-tile fused kernel + centroid merge); ik_max_views=16 is the
        # recommended wide-rig setting (docs/PERF.md)
        "64cam_x_10ppl_2clusters": bench_config(64, 10, n_frames=60,
                                                clusters=2, ik_max_views=16),
    }
    if "--cam128" in sys.argv:
        # r5 (VERDICT r4 next #4): 128 cameras.  4 interleaved clusters of
        # 32 cams — each per-cluster solve is the same N_c = 336 three-tile
        # fused-kernel shape as the monolithic 32-cam rig; the global
        # matrix is synthesized + centroid-merged.  The 5-cluster variant
        # exercises the non-divisible path (ceil 26 views, dead-pad) at a
        # smaller per-cluster solve.
        results["128cam_x_10ppl_4clusters"] = bench_config(
            128, 10, n_frames=60, clusters=4, ik_max_views=16)
        results["128cam_x_10ppl_5clusters_nondiv"] = bench_config(
            128, 10, n_frames=60, clusters=5, ik_max_views=16)
        # the wide() preset's IK levers (cold1 + warm3, the 64-cam
        # recommendation from the r4 sweep — quality-gated there)
        results["128cam_x_10ppl_4clusters_levers"] = bench_config(
            128, 10, n_frames=60, clusters=4, ik_max_views=16,
            ik_cold_stages=1, ik_warm_iters=3)
        # + cold-iteration budget 25 (the 128-cam recommendation): from the
        # geometric init the cold LM converges well before 15 iterations at
        # ik_max_views=16 — 50/25/15 budgets measured IDENTICAL track
        # structure and MPJPE (0.8628 m) at 94.2/103.9/109.1 fps
        # (docs/PERF.md r5); 25 keeps 2x convergence headroom
        results["128cam_x_10ppl_4clusters_levers_cold25"] = bench_config(
            128, 10, n_frames=60, clusters=4, ik_max_views=16,
            ik_cold_stages=1, ik_warm_iters=3, ik_cold_iters=25)
    if "--ik-levers" in sys.argv:
        # r4 wide-rig IK levers (VERDICT r3 next #1): merged cold schedule
        # (quality-neutral-or-better on Shelf, docs/PERF.md) and looser LM
        # exits (a Shelf quality hazard; candidate for wide rigs only)
        results["64cam_coldstages1"] = bench_config(
            64, 10, n_frames=60, clusters=2, ik_max_views=16,
            ik_cold_stages=1)
        results["64cam_coldstages1_loose"] = bench_config(
            64, 10, n_frames=60, clusters=2, ik_max_views=16,
            ik_cold_stages=1, ik_ftol=1e-4, ik_xtol=1e-4)
        results["64cam_warmiters3"] = bench_config(
            64, 10, n_frames=60, clusters=2, ik_max_views=16,
            ik_cold_stages=1, ik_warm_iters=3)
        # one-program JtJ/g assembly + GJ (J read once per LM iteration)
        results["64cam_gj_fused"] = bench_config(
            64, 10, n_frames=60, clusters=2, ik_max_views=16,
            ik_solver="gj_fused")
        results["64cam_gj_fused_warm3_cold1"] = bench_config(
            64, 10, n_frames=60, clusters=2, ik_max_views=16,
            ik_solver="gj_fused", ik_cold_stages=1, ik_warm_iters=3)
        # Shelf-regression check for the fused solver is bench.py's job
        # (parity config keeps solver="gj")
    print(json.dumps({
        "metric": "scaled_rig_fps",
        "value": results["10cam_x_10ppl"]["full_ik"]["fps"],
        "unit": "frames/s",
        "extra": {**results, "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    main()
