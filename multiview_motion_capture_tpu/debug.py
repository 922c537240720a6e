"""Per-frame association debug artifacts (the reference's debug surface as a
first-class switch).

The reference, when debugging association, dumps its cost matrices to xlsx
and annotated match/unmatch crop strips to disk
(ref:src/motion_capture.py:885-921).  This module provides that capability
for the packed-tensor tracker: for any tracked sequence, dump — per
requested frame —

- the similarity matrix actually fed to ALS (csv + npz),
- the continuous ALS ``X`` and its ``|X - 0.5|`` decision margins
  (bistable near-threshold associations show up as small margins),
- the parsed groups (leader / members / sizes) and each track's match,
- the raw track->detection reprojection distances behind the 2D-3D block
  (what the rescue pass gates on),
- with ``images``: a crop strip per dying track of its nearest detections
  across views (the reference's unmatched-crop dump).

The fragmentation and identity studies each re-derived this plumbing ad hoc
(scripts/fragmentation_study.py); new studies should call
:func:`dump_association_debug` instead.  CLI: ``run --debug_dump DIR
[--debug_frames 3,17]``.

Debug solves use the XLA ALS (`ops.association.match_als`) because the
fused Pallas kernel binarizes in VMEM and never writes the continuous X
out; the two produce identical groupings (tests/test_als_pallas.py).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.ops import association as assoc
from multiview_motion_capture_tpu.tracker import (
    TrackerContext,
    TrackerState,
    _appearance_gain,
    _spatial_similarity,
    _spatial_time_similarity,
    make_step,
)


def replay_states(ctx: TrackerContext, kps, valid, app=None):
    """Scan the sequence emitting each frame's PRE-step state alongside the
    outputs (the debug/replay entry point shared with the study scripts).
    `app` (F, V, P, D) is required for appearance-enabled contexts."""
    if ctx.cfg.appearance_dim > 0 and app is None:
        raise ValueError("cfg.appearance_dim > 0: replay_states needs "
                         "app=(F, V, P, D) detection embeddings")
    step = make_step(ctx)

    @jax.jit
    def scan_with_states(*frames):
        def body(s, fr):
            s2, out = step(s, fr)
            return s2, (s, out)

        s0 = TrackerState.zeros(ctx.cfg)
        return jax.lax.scan(body, s0, frames)

    args = (jnp.asarray(kps), jnp.asarray(valid))
    if app is not None:
        args = args + (jnp.asarray(app),)
    _, (pre_states, outs) = scan_with_states(*args)
    return jax.device_get(pre_states), jax.device_get(outs)


def _state_at(pre_states, f: int) -> TrackerState:
    """Rebuild frame f's pre-step state (by keyword: field-order safe)."""
    return TrackerState(**{
        fld.name: jnp.asarray(np.asarray(getattr(pre_states, fld.name))[f])
        for fld in dataclasses.fields(TrackerState)
    })


def _als_xla(ctx: TrackerContext, sim, diag_mask, init_A):
    cfg = ctx.cfg
    return assoc.match_als(
        sim, diag_mask, init_A,
        alpha=cfg.als_alpha, beta=cfg.als_beta, mu0=cfg.als_mu,
        tol=cfg.als_tol, max_iter=cfg.als_max_iter,
        stable_iters=cfg.als_stable_iters,
    )


def frame_debug(ctx: TrackerContext, state: TrackerState, kps, valid,
                app=None) -> dict:
    """Re-run ONE frame's association with full diagnostics.

    `state` is the PRE-step state (before the time_since_update predict);
    `app` (V, P, D) is this frame's detection embeddings (appearance
    contexts); returns a dict of numpy arrays / nested summaries, one
    entry per cluster on hierarchical rigs.
    """
    cfg = ctx.cfg
    T, V, P = cfg.max_tracks, cfg.n_views, cfg.max_people
    kps = jnp.asarray(kps)
    valid = jnp.asarray(valid)
    # replicate the step's predict
    tsu = state.time_since_update + (state.active > 0).astype(jnp.int32)
    state = state.replace(time_since_update=tsu)
    any_alive = bool(jax.device_get(jnp.any(state.active > 0)))

    clusters = []
    if cfg.assoc_clusters > 1:
        C = cfg.assoc_clusters
        cluster_of_view = np.arange(V) % C
        Vc = -(-V // C)
        for c in range(C):
            views_c = np.nonzero(cluster_of_view == c)[0]
            # pad short clusters to the shared ceil width exactly as
            # tracker._clustered_association does (non-divisible V)
            if len(views_c) < Vc:
                views_p = np.concatenate(
                    [views_c,
                     np.full(Vc - len(views_c), views_c[0], views_c.dtype)])
                vvalid = np.arange(Vc) < len(views_c)
            else:
                views_p, vvalid = views_c, None
            sim_st, _, d23c = _spatial_time_similarity(
                ctx, state, kps, valid, view_idx=views_p, app=app,
                view_valid=vvalid)
            sim_sp, _ = _spatial_similarity(
                ctx, kps, valid, view_idx=views_p, app=app,
                app_gain=_appearance_gain(cfg, state), view_valid=vvalid)
            sim = sim_st if any_alive else sim_sp
            als = _als_xla(ctx, sim, ctx.cluster_diag_mask, ctx.cluster_init_A)
            clusters.append({
                "views": views_c, "sim": np.asarray(sim),
                "x": np.asarray(als.x), "x_bin": np.asarray(als.x_bin),
                "n_iters": int(als.n_iters),
            })
        # the global picture: distances + validity (the step's own assembly)
        from multiview_motion_capture_tpu.tracker import _clustered_association
        als_g, elem_valid, d23 = _clustered_association(
            ctx, state, kps, valid, jnp.asarray(any_alive), app=app)
        x_bin, x_soft = np.asarray(als_g.x_bin), None
        n_iters = int(als_g.n_iters)
    else:
        sim_st, ev_st, d23 = _spatial_time_similarity(ctx, state, kps, valid,
                                                      app=app)
        sim_sp, ev_sp = _spatial_similarity(
            ctx, kps, valid, app=app, app_gain=_appearance_gain(cfg, state))
        sim = sim_st if any_alive else sim_sp
        elem_valid = ev_st if any_alive else ev_sp
        als = _als_xla(ctx, sim, ctx.diag_mask, ctx.init_A)
        x_bin, x_soft, n_iters = np.asarray(als.x_bin), np.asarray(als.x), int(als.n_iters)
        clusters.append({"views": np.arange(V), "sim": np.asarray(sim),
                         "x": x_soft, "x_bin": np.asarray(als.x_bin),
                         "n_iters": n_iters})

    groups = assoc.extract_groups(jnp.asarray(x_bin), jnp.asarray(elem_valid))
    rep = np.asarray(groups.rep)
    member = np.asarray(groups.member)
    gsize = np.asarray(groups.group_size)
    d23 = np.asarray(d23)

    # per-track association summary
    tracks = []
    active = np.asarray(state.active)
    for t in range(T):
        if active[t] == 0:
            continue
        dmin = d23[t][np.isfinite(d23[t])]
        row = {
            "slot": t,
            "track_id": int(np.asarray(state.track_id)[t]),
            "active": int(active[t]),
            "time_since_update": int(np.asarray(state.time_since_update)[t]),
            "is_group_leader": bool(member[t] and rep[t] == t),
            "group_size": int(gsize[t]),
            "nearest_det_px": float(dmin.min()) if dmin.size else None,
        }
        if x_soft is not None:
            det_row = x_soft[t, T:]
            dv = np.asarray(valid).reshape(-1)
            sub = det_row[dv]
            row["best_soft_x"] = float(sub.max()) if sub.size else None
            row["margin_to_05"] = (float(np.abs(sub - 0.5).min())
                                   if sub.size else None)
        tracks.append(row)

    # detection-group summary (spawn candidates)
    det_groups = []
    rep_det = rep[T:]
    for e in range(V * P):
        if member[T + e] and rep_det[e] == T + e:
            members = np.nonzero(member[T:] & (rep_det == T + e))[0]
            det_groups.append({
                "leader": int(T + e),
                "views": sorted({int(m // P) for m in members}),
                "slots": [[int(m // P), int(m % P)] for m in members],
            })

    return {
        "any_alive": any_alive,
        "clusters": clusters,
        "x_bin": x_bin,
        "x": x_soft,
        "elem_valid": np.asarray(elem_valid),
        "d23": d23,
        "rep": rep,
        "member": member,
        "group_size": gsize,
        "n_iters": n_iters,
        "tracks": tracks,
        "det_groups": det_groups,
    }


def _write_csv(path: Path, mat: np.ndarray, T: int, V: int, P: int) -> None:
    """The similarity/X matrix with [trk*|v*p*] headers (the reference's
    xlsx cost-matrix dump, ref:src/motion_capture.py:885-899, as csv)."""
    names = [f"trk{t}" for t in range(T)] + [
        f"v{v}p{p}" for v in range(V) for p in range(P)
    ]
    with open(path, "w") as fh:
        fh.write("," + ",".join(names) + "\n")
        for name, row in zip(names, mat):
            fh.write(name + "," + ",".join(f"{x:.4f}" for x in row) + "\n")


def dump_association_debug(
    ctx: TrackerContext,
    kps,
    valid,
    out_dir: Path,
    frames: Optional[Sequence[int]] = None,
    images: Optional[np.ndarray] = None,
    max_auto_frames: int = 20,
    app: Optional[np.ndarray] = None,
) -> List[Path]:
    """Dump per-frame association diagnostics for a sequence.

    frames: frame indices to dump; None = every frame where a track DIES
    (the moments the studies keep re-deriving), capped at `max_auto_frames`.
    images: optional (F, V, H, W, 3) uint8 frames for crop strips.
    Returns the list of per-frame npz paths written.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = ctx.cfg
    T, V, P = cfg.max_tracks, cfg.n_views, cfg.max_people

    pre_states, outs = replay_states(ctx, kps, valid, app=app)
    died = np.asarray(outs.died_track_id)  # (F, T)
    if frames is None:
        frames = [f for f in range(died.shape[0]) if (died[f] >= 0).any()]
        frames = frames[:max_auto_frames]

    written = []
    for f in frames:
        state = _state_at(pre_states, f)
        dbg = frame_debug(ctx, state, kps[f], valid[f],
                          app=None if app is None else app[f])
        base = out_dir / f"frame_{f:05d}"
        npz_path = base.with_suffix(".npz")
        arrays = {
            "x_bin": dbg["x_bin"], "elem_valid": dbg["elem_valid"],
            "d23": dbg["d23"], "rep": dbg["rep"], "member": dbg["member"],
            "group_size": dbg["group_size"],
        }
        if dbg["x"] is not None:
            arrays["x"] = dbg["x"]
            arrays["margin"] = np.abs(dbg["x"] - 0.5)
        for ci, cl in enumerate(dbg["clusters"]):
            arrays[f"cluster{ci}_sim"] = cl["sim"]
            arrays[f"cluster{ci}_x"] = cl["x"]
            arrays[f"cluster{ci}_views"] = cl["views"]
        np.savez_compressed(npz_path, **arrays)
        written.append(npz_path)

        # cost-matrix csv (monolithic rigs get the full matrix; clustered
        # rigs one csv per cluster over [T | Vc*P])
        if cfg.assoc_clusters == 1:
            _write_csv(base.parent / f"{base.name}_sim.csv",
                       dbg["clusters"][0]["sim"], T, V, P)
            if dbg["x"] is not None:
                _write_csv(base.parent / f"{base.name}_x.csv", dbg["x"],
                           T, V, P)
        else:
            for ci, cl in enumerate(dbg["clusters"]):
                _write_csv(base.parent / f"{base.name}_sim_c{ci}.csv",
                           cl["sim"], T, len(cl["views"]), P)

        summary = {
            "frame": int(f),
            "any_alive": dbg["any_alive"],
            "als_iters": dbg["n_iters"],
            "died_track_ids": [int(x) for x in died[f][died[f] >= 0]],
            "tracks": dbg["tracks"],
            "det_groups": dbg["det_groups"],
        }
        with open(base.parent / f"{base.name}_summary.json", "w") as fh:
            json.dump(summary, fh, indent=2)

        if images is not None:
            _dump_death_strips(ctx, dbg, died[f], kps[f], images[f], base)
    return written


def _dump_death_strips(ctx, dbg, died_f, kps_f, imgs_f, base: Path) -> None:
    """Crop strips of each dying track's nearest detections per view (the
    reference's unmatched-crops debug dump, ref:src/motion_capture.py:
    901-921)."""
    from multiview_motion_capture_tpu.utils.viz import draw_crop_strip

    cfg = ctx.cfg
    V, P = cfg.n_views, cfg.max_people
    kps_f = np.asarray(kps_f)
    d23 = dbg["d23"]
    for t in np.nonzero(died_f >= 0)[0]:
        imgs, kp_list, labels = [], [], []
        for v in range(V):
            dv = d23[t, v]
            if not np.isfinite(dv).any():
                continue
            p = int(np.nanargmin(np.where(np.isfinite(dv), dv, np.nan)))
            imgs.append(np.asarray(imgs_f[v]))
            kp_list.append(kps_f[v, p])
            labels.append(f"v{v} {dv[p]:.0f}px")
        strip = draw_crop_strip(imgs, kp_list, labels=labels)
        if strip is not None:
            import cv2

            cv2.imwrite(
                str(base.parent / f"{base.name}_death_t{int(died_f[t])}.png"),
                strip[..., ::-1],
            )
