"""Root-cause study: why does the TPU tracker fragment Shelf into ~36
tracklets where the f64 oracle produces ~23 (VERDICT r2 next #4)?

Both implement the same semantics (exact X_bin equality on decisive frames,
tests/test_reference_direct.py), so the excess deaths must come from frames
where the association is *bistable* — ALS entries sitting near the 0.5
binarization edge, where the implementations' legitimate numeric freedoms
(f32 vs f64, fixed padded N + fixed rank/init vs per-frame N and rank)
pick different basins.

This script instruments every tracker death on the 300-frame Shelf run:

  1. scan the sequence, emitting the PRE-step state of every frame,
  2. align tracker death events with oracle death events,
  3. for each death the oracle does NOT share, re-run that frame's
     similarity + ALS from the saved state and measure
       - the dying track's support (matched views at the 0.5 cut),
       - its decision margin: the largest X entry in its row against
         detections (how far below 0.5 the best near-match sits),
       - whether an f64, oracle-shaped ALS on the SAME similarity matrix
         keeps the track alive (isolates fp/rank/init bistability from
         genuine geometric separation).

Run: python scripts/fragmentation_study.py   (CPU, ~5 min incl. oracle)

NOTE: the per-frame replay plumbing this script hand-rolled (pre-state scan,
similarity + ALS re-run, margins) is now a first-class tool —
`multiview_motion_capture_tpu.debug.dump_association_debug` / the CLI's
`run --debug_dump DIR`.  New studies should start there.
"""
from __future__ import annotations

import json
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.ingest import (
    filter_bad_poses,
    load_openpose_dir,
)
from multiview_motion_capture_tpu.ops import association as assoc
from multiview_motion_capture_tpu.tracker import (
    TrackerContext,
    TrackerState,
    _spatial_time_similarity,
    assemble_tracklets,
    make_step,
)

N_FRAMES = 300
ORACLE_CACHE = Path("/tmp/oracle_shelf_300.pkl")


def load_shelf(cfg):
    shelf = Path("/root/reference/data/shelf")
    batch = load_openpose_dir(shelf / "kps_opn", cfg, max_frames=N_FRAMES)
    batch = filter_bad_poses(batch, cfg)
    cams = CameraBank.from_json_dir(shelf / "calibs")
    return batch, cams


def run_tracker_with_states(ctx, kps, valid):
    step = make_step(ctx)

    @jax.jit
    def scan_with_states(kps, valid):
        def body(s, fr):
            s2, out = step(s, fr)
            return s2, (s, out)

        s0 = TrackerState.zeros(ctx.cfg)
        return jax.lax.scan(body, s0, (kps, valid))

    _, (pre_states, outs) = scan_with_states(jnp.asarray(kps), jnp.asarray(valid))
    return jax.device_get(pre_states), jax.device_get(outs)


def oracle_tracklets(batch, cams):
    if ORACLE_CACHE.exists():
        with open(ORACLE_CACHE, "rb") as f:
            return pickle.load(f)
    from tests.oracle_pipeline import run_oracle

    t0 = time.time()
    tlets = run_oracle(batch.kps, batch.valid, cams, N_FRAMES, use_ik=True)
    print(f"oracle run: {time.time() - t0:.0f}s, {len(tlets)} tracklets",
          file=sys.stderr)
    events = [(t.frames[0], t.frames[-1], len(t.frames)) for t in tlets]
    with open(ORACLE_CACHE, "wb") as f:
        pickle.dump(events, f)
    return events


def als_f64_oracle_shaped(sim, cfg):
    """The oracle's f64 ALS on the tracker's padded similarity matrix (same
    W, oracle numerics + group-zeroing): isolates numeric bistability."""
    from tests.oracle_pipeline import match_als_np

    T, V, P = cfg.max_tracks, cfg.n_views, cfg.max_people
    offsets = np.cumsum([0, T] + [P] * V)
    return match_als_np(np.asarray(sim, dtype=np.float64), offsets,
                        stable_iters=cfg.als_stable_iters or 10)


def main():
    # the parity-study config: rescue pinned OFF — this script diagnoses the
    # STRICT reference-lifecycle deaths (rescue, default-on since r3, would
    # erase exactly the deaths being root-caused here)
    cfg = PipelineConfig(max_frames=N_FRAMES, track_rescue_px=0.0)
    batch, cams = load_shelf(cfg)
    kps, valid = batch.kps[:N_FRAMES], batch.valid[:N_FRAMES]

    ctx = TrackerContext.build(cams, cfg, use_ik=True)
    pre_states, outs = run_tracker_with_states(ctx, kps, valid)
    tlets = assemble_tracklets(outs)
    print(f"tracker: {len(tlets)} tracklets", file=sys.stderr)

    # tracker death events: (frame, slot)
    died = np.asarray(outs.died_track_id)  # (F, T)
    deaths = [(f, t) for f in range(N_FRAMES) for t in range(died.shape[1])
              if died[f, t] >= 0]
    o_events = oracle_tracklets(batch, cams)
    o_death_frames = sorted(e[1] + 1 for e in o_events)
    print(f"oracle: {len(o_events)} tracklets; "
          f"death frames {o_death_frames}", file=sys.stderr)

    # align: a tracker death at frame f is "shared" if the oracle also ends
    # a tracklet within +-2 frames (fragment boundaries wobble by 1-2)
    o_used = [False] * len(o_death_frames)
    shared, excess = [], []
    for f, t in deaths:
        hit = None
        for i, of in enumerate(o_death_frames):
            if not o_used[i] and abs(of - f) <= 2:
                hit = i
                break
        if hit is not None:
            o_used[hit] = True
            shared.append((f, t))
        else:
            excess.append((f, t))
    print(f"tracker deaths: {len(deaths)} (shared {len(shared)}, "
          f"excess {len(excess)})", file=sys.stderr)

    # diagnose each excess death at its frame: state BEFORE the step
    diag = []
    import dataclasses as _dc
    for f, slot in excess:
        # rebuild by keyword from TrackerState's OWN fields so future field
        # additions cannot silently break the study (advisor r3)
        state = TrackerState(**{
            fld.name: jnp.asarray(np.asarray(getattr(pre_states, fld.name))[f])
            for fld in _dc.fields(TrackerState)
        })
        # note: predict() runs before similarity in the step; replicate
        tsu = state.time_since_update + (state.active > 0).astype(jnp.int32)
        state = state.replace(time_since_update=tsu)
        sim, ev, _ = _spatial_time_similarity(ctx, state, jnp.asarray(kps[f]),
                                              jnp.asarray(valid[f]))
        res = assoc.match_als(
            sim, ctx.diag_mask, ctx.init_A, alpha=cfg.als_alpha,
            beta=cfg.als_beta, mu0=cfg.als_mu, tol=cfg.als_tol,
            max_iter=cfg.als_max_iter, stable_iters=cfg.als_stable_iters,
        )
        X = np.asarray(res.x)
        xb = np.asarray(res.x_bin)
        T = cfg.max_tracks
        dv = np.asarray(ev)[T:]
        row = X[slot, T:]
        rowb = xb[slot, T:] & dv
        support = int(rowb.sum())
        # margin: the best sub-threshold detection entry (how close the
        # track came to keeping a second view)
        sub = row[dv & ~rowb]
        margin = float(0.5 - sub.max()) if sub.size else float("inf")
        # f64 oracle-shaped ALS on the same W
        xb64 = als_f64_oracle_shaped(sim, cfg)
        row64 = xb64[slot, T:] & dv
        support64 = int(row64.sum())
        diag.append({
            "frame": int(f), "slot": int(slot),
            "support_f32": support, "margin_to_05": round(margin, 4),
            "support_f64_oracle_shape": support64,
            "f64_keeps_alive": bool(support64 >= 2),
        })

    n_flip = sum(d["f64_keeps_alive"] for d in diag)
    n_near = sum(d["margin_to_05"] < 0.1 for d in diag)
    print(json.dumps({
        "tracker_tracklets": len(tlets),
        "oracle_tracklets": len(o_events),
        "tracker_deaths": len(deaths),
        "excess_deaths": len(excess),
        "excess_f64_would_keep": n_flip,
        "excess_margin_lt_0.1": n_near,
        "detail": diag,
    }, indent=2))


if __name__ == "__main__":
    main()
