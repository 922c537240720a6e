"""Per-stage LM iteration statistics (VERDICT r3 next #1b).

The 64-cam profile shows LM whiles at 46% of device time; before touching
budgets, measure what the batched while actually EXECUTES per frame — the
slowest-active-slot iteration count is what the device pays.  This script
replays a wide-rig scenario, reconstructs every update frame's warm-solve
inputs exactly as the tracker builds them, and histograms the executed
iteration counts for the warm solve at the current budget and tolerance,
plus the cold solve on spawn frames.

    python scripts/ik_iteration_study.py [--tpu]      # CPU by default
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.debug import _state_at, replay_states
from multiview_motion_capture_tpu.ops import ik as ik_ops
from multiview_motion_capture_tpu.tracker import TrackerContext, _gather_obs

N_VIEWS = 64
N_PEOPLE = 10
N_FRAMES = 30


@functools.partial(jax.jit, static_argnames=("n_iters", "stages", "ftol",
                                             "xtol"))
def _warm_iters(x0, skel, obs, view_w, P, n_iters, stages, ftol, xtol):
    obs18 = ik_ops.add_mid_spine(obs)
    free_pose = jnp.asarray(ik_ops._FREE_POSE)
    free_all = jnp.asarray(ik_ops._FREE_ALL)
    kw = dict(n_iters=n_iters, eps=1e-5, lam0=1e-3, lam_up=10.0,
              lam_down=0.33, interpret=True, ftol=ftol, xtol=xtol,
              return_iters=True)
    if stages == 1:
        _, it = ik_ops._lm_solve_batched(x0, skel, obs18, view_w, P,
                                         free_all, **kw)
        return it, jnp.asarray(0, jnp.int32)
    x1, it1 = ik_ops._lm_solve_batched(x0, skel, obs18, view_w, P,
                                       free_pose, **kw)
    _, it2 = ik_ops._lm_solve_batched(x1, skel, obs18, view_w, P,
                                      free_all, **kw)
    return it1, it2


def main():
    cfg = PipelineConfig(
        n_views=N_VIEWS, max_people=N_PEOPLE, max_tracks=16, max_frames=None,
        als_max_iter=100, ik_warm_stages=1, ik_solver="gj",
        assoc_clusters=2, ik_max_views=16,
    )
    seq = synthetic_sequence(n_frames=N_FRAMES, n_people=N_PEOPLE,
                             n_views=N_VIEWS, cfg=cfg, seed=0, noise_px=1.0,
                             drop_prob=0.05)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    pre_states, outs = replay_states(ctx, seq.batch.kps, seq.batch.valid)

    updated = np.asarray(outs.updated)
    spawned = np.asarray(outs.spawned)
    matched = np.asarray(outs.matched_pose)  # POST-step matches

    skel = ctx.skel
    warm_counts = {}
    for label, (stages, ftol, xtol, budget) in {
        "warm_default(stages1,ftol2e-6,b5)": (1, 2e-6, 1e-6, 5),
        "warm_loose(ftol1e-4)": (1, 1e-4, 1e-4, 5),
        "warm_budget3": (1, 2e-6, 1e-6, 3),
        "warm_stages2(parity)": (2, 2e-6, 1e-6, 5),
    }.items():
        counts = []
        for f in range(N_FRAMES):
            upd = updated[f] & ~spawned[f]
            if not upd.any():
                continue
            state = _state_at(pre_states, f)
            kps_f = jnp.asarray(seq.batch.kps[f])
            m = jnp.asarray(matched[f])
            exists = (m >= 0) & jnp.asarray(upd)[:, None]
            obs, w = _gather_obs(kps_f, m, exists)
            w = w * jnp.asarray(upd)[:, None].astype(w.dtype)
            # the tracker's wide-rig view cap
            if cfg.ik_max_views is not None and cfg.ik_max_views < N_VIEWS:
                score = jnp.sum(obs[..., 2], axis=-1) + w
                idx = jnp.argsort(-score, axis=1, stable=True)[:, :cfg.ik_max_views]
                obs = jnp.take_along_axis(obs, idx[:, :, None, None].astype(jnp.int32), axis=1)
                w = jnp.take_along_axis(w, idx.astype(jnp.int32), axis=1)
                P_t = ctx.cams.P[idx]
            else:
                P_t = ctx.cams.P
            x0 = ik_ops.IkParams(state.root, state.euler, state.side_lens).pack()
            it1, it2 = _warm_iters(x0, skel, obs, w, P_t, budget, stages,
                                   ftol, xtol)
            counts.append(int(it1) + int(it2))
        counts = np.asarray(counts)
        warm_counts[label] = {
            "frames": int(counts.size),
            "mean": round(float(counts.mean()), 2),
            "p50": int(np.percentile(counts, 50)),
            "max": int(counts.max()),
            "budget_hit_frac": round(float(
                (counts >= budget * stages).mean()), 2),
        }
        print(label, warm_counts[label], file=sys.stderr)

    print(json.dumps({"metric": "ik_iteration_stats",
                      "extra": {"rig": f"{N_VIEWS}cam_x_{N_PEOPLE}",
                                **warm_counts}}, indent=1))


if __name__ == "__main__":
    main()
