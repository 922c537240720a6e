"""End-to-end tracker tests on synthetic sequences (identity-labelled)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.tracker import (
    MvTracker,
    TrackerContext,
    TrackerState,
    assemble_tracklets,
    make_step,
    run_offline,
)


CFG = PipelineConfig(n_views=4, max_people=6, max_tracks=8, max_frames=None)


@pytest.fixture(scope="module")
def seq():
    return synthetic_sequence(n_frames=8, n_people=3, n_views=4, cfg=CFG, seed=1,
                              drop_prob=0.0)


def _track_to_person(tlet, seq):
    """Map a tracklet to the ground-truth person via its 3D hip position."""
    errs = []
    for i, f in enumerate(tlet.frame_idxs):
        hip = 0.5 * (tlet.poses_3d[i, 11 if tlet.poses_3d.shape[1] == 17 else 1] +
                     tlet.poses_3d[i, 12 if tlet.poses_3d.shape[1] == 17 else 4])
        d = np.linalg.norm(seq.gt_3d[f, :, 11:13, :].mean(axis=1) - hip, axis=-1)
        errs.append(np.argmin(d))
    vals, counts = np.unique(errs, return_counts=True)
    return int(vals[np.argmax(counts)])


def test_offline_triangulation_tracking(seq):
    ctx = TrackerContext.build(seq.cameras, CFG, use_ik=False)
    state, out = run_offline(ctx, jnp.asarray(seq.batch.kps), jnp.asarray(seq.batch.valid))
    tlets = assemble_tracklets(jax.device_get(out))
    # 3 people, tracked across all 8 frames (allowing first-frame bootstrap)
    assert len(tlets) == 3
    for t in tlets:
        assert len(t) >= 7
    # triangulated COCO joints close to ground truth
    for t in tlets:
        pid = _track_to_person(t, seq)
        err = []
        for i, f in enumerate(t.frame_idxs):
            err.append(np.linalg.norm(t.poses_3d[i, :17] - seq.gt_3d[f, pid], axis=-1).mean())
        assert np.mean(err) < 0.03, np.mean(err)


def test_offline_ik_tracking(seq):
    ctx = TrackerContext.build(seq.cameras, CFG, use_ik=True)
    state, out = run_offline(ctx, jnp.asarray(seq.batch.kps), jnp.asarray(seq.batch.valid))
    tlets = assemble_tracklets(jax.device_get(out))
    assert len(tlets) == 3
    skel_sel = [1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 13, 14, 15, 16, 17]  # B18 w/o root/spine/neck
    coco_sel = [11, 13, 15, 12, 14, 16, 5, 7, 9, 6, 8, 10, 0, 3, 4]
    for t in tlets:
        pid = _track_to_person(t, seq)
        errs = []
        for i, f in enumerate(t.frame_idxs):
            errs.append(
                np.linalg.norm(
                    t.poses_3d[i, skel_sel] - seq.gt_3d[f, pid][coco_sel], axis=-1
                ).mean()
            )
        # IK fits an 18-joint stick skeleton to noisy 2D: a few cm is expected
        assert np.mean(errs) < 0.06, np.mean(errs)


def test_streaming_matches_offline(seq):
    ctx = TrackerContext.build(seq.cameras, CFG, use_ik=False)
    _, out = run_offline(ctx, jnp.asarray(seq.batch.kps), jnp.asarray(seq.batch.valid))
    offline = assemble_tracklets(jax.device_get(out))

    tracker = MvTracker(seq.cameras, CFG, use_ik=False)
    for f in range(seq.batch.n_frames):
        tracker.update(f, seq.batch.kps[f], seq.batch.valid[f])
    streaming = tracker.tracklets()

    assert len(offline) == len(streaming)
    for a, b in zip(offline, streaming):
        assert a.frame_idxs == b.frame_idxs
        np.testing.assert_allclose(a.poses_3d, b.poses_3d, atol=1e-5)


def test_microbatched_streaming_matches_per_frame(seq):
    """update_batch (k frames per dispatch) == k sequential update calls,
    including across micro-batch boundaries and an uneven tail."""
    ref = MvTracker(seq.cameras, CFG, use_ik=False)
    for f in range(seq.batch.n_frames):
        ref.update(f, seq.batch.kps[f], seq.batch.valid[f])

    mb = MvTracker(seq.cameras, CFG, use_ik=False)
    k = 3  # 8 frames -> chunks of 3, 3, 2 (uneven tail)
    for s in range(0, seq.batch.n_frames, k):
        e = min(seq.batch.n_frames, s + k)
        mb.update_batch(list(range(s, e)), seq.batch.kps[s:e], seq.batch.valid[s:e])

    a, b = ref.tracklets(), mb.tracklets()
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-5)


def test_microbatched_padded_tail_matches_per_frame(seq):
    """update_batch with pad_to=k: the uneven tail is padded with inert
    frames (ONE compiled chunk shape serves every chunk) and must produce
    exactly the per-frame results — pad frames must not age/kill tracks."""
    ref = MvTracker(seq.cameras, CFG, use_ik=False)
    for f in range(seq.batch.n_frames):
        ref.update(f, seq.batch.kps[f], seq.batch.valid[f])

    mb = MvTracker(seq.cameras, CFG, use_ik=False)
    k = 3  # 8 frames -> chunks of 3, 3, 2; the 2-tail is padded to 3
    for s in range(0, seq.batch.n_frames, k):
        e = min(seq.batch.n_frames, s + k)
        mb.update_batch(list(range(s, e)), seq.batch.kps[s:e],
                        seq.batch.valid[s:e], pad_to=k)

    a, b = ref.tracklets(), mb.tracklets()
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-5)


def test_update_batch_rejects_oversized_chunk(seq):
    mb = MvTracker(seq.cameras, CFG, use_ik=False)
    with pytest.raises(ValueError, match="exceeds pad_to"):
        mb.update_batch([0, 1, 2], seq.batch.kps[:3], seq.batch.valid[:3],
                        pad_to=2)


def test_tentative_track_dies_after_one_miss():
    """max_age=0 + Tentative -> Dead on the first miss
    (ref:src/motion_capture.py:387-391)."""
    cfg = PipelineConfig(n_views=4, max_people=4, max_tracks=4, max_frames=None)
    seq = synthetic_sequence(n_frames=6, n_people=1, n_views=4, cfg=cfg, seed=3,
                             drop_prob=0.0)
    kps = seq.batch.kps.copy()
    valid = seq.batch.valid.copy()
    valid[2:] = False  # person disappears after frame 1
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=False)
    _, out = run_offline(ctx, jnp.asarray(kps), jnp.asarray(valid))
    out = jax.device_get(out)
    tlets = assemble_tracklets(out)
    assert len(tlets) == 1
    assert tlets[0].frame_idxs == [0, 1]
    # slot freed after death
    assert (np.asarray(out.active)[3] == 0).all()
    died = np.asarray(out.died_track_id)
    assert (died[2] >= 0).any()


def test_track_rescue_bridges_similarity_dropout():
    """Track rescue (cfg.track_rescue_px, r3 deviation): when a subject's
    detections drift ~25 px for a couple of frames (decisively outside the
    similarity sigmoid's range — association can never bind them), the
    strict reference lifecycle kills the track and respawns a fragment; the
    rescue pass adopts the detections' group and the track survives."""
    import dataclasses

    cfg_strict = PipelineConfig(n_views=4, max_people=4, max_tracks=6,
                                max_frames=None, track_rescue_px=0.0,
                                track_rescue_single_px=None)
    seq = synthetic_sequence(n_frames=10, n_people=1, n_views=4,
                             cfg=cfg_strict, seed=5, drop_prob=0.0)
    kps = seq.batch.kps.copy()
    # frames 5-6: every view's detection shifts 25 px — same subject, but
    # sim = sigmoid(-5*(25-15)/30) ~ 0.16, far below the 0.5 binarization
    kps[5:7, ..., :2] += 25.0
    valid = seq.batch.valid

    ctx = TrackerContext.build(seq.cameras, cfg_strict, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(kps), jnp.asarray(valid))
    strict = assemble_tracklets(jax.device_get(out))
    assert len(strict) >= 2, [t.frame_idxs for t in strict]  # fragmented

    cfg_rescue = dataclasses.replace(cfg_strict, track_rescue_px=40.0,
                                     track_rescue_single_px=25.0)
    ctx = TrackerContext.build(seq.cameras, cfg_rescue, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(kps), jnp.asarray(valid))
    rescued = assemble_tracklets(jax.device_get(out))
    assert len(rescued) == 1, [t.frame_idxs for t in rescued]
    assert len(rescued[0]) == 10


def test_fast_preset_consistency(shelf_data_dir):
    """`PipelineConfig.fast()` (als_stable_iters=6 early-exit preset,
    docs/PERF.md) vs the parity SHELF_BENCH config on real Shelf frames: same long
    tracks, bounded reprojection delta (VERDICT r2 next #6).  The preset is
    allowed small structural wobble (a fragment boundary may move) but must
    not change who is tracked or how well."""
    import dataclasses

    from multiview_motion_capture_tpu.cameras import CameraBank
    from multiview_motion_capture_tpu.config import SHELF_BENCH, PipelineConfig
    from multiview_motion_capture_tpu.data.ingest import (
        filter_bad_poses,
        load_openpose_dir,
    )
    from multiview_motion_capture_tpu.eval import (
        reprojection_metrics,
        run_consistency_mpjpe,
    )

    N = 150
    cfg_parity = dataclasses.replace(SHELF_BENCH, max_frames=N)
    cfg_fast = PipelineConfig.fast(max_frames=N)
    assert cfg_fast.als_stable_iters == 6
    batch = load_openpose_dir(shelf_data_dir / "kps_opn", cfg_parity, max_frames=N)
    batch = filter_bad_poses(batch, cfg_parity)
    cams = CameraBank.from_json_dir(shelf_data_dir / "calibs")

    results = {}
    for name, cfg in (("parity", cfg_parity), ("fast", cfg_fast)):
        ctx = TrackerContext.build(cams, cfg, use_ik=True)
        _, out = run_offline(ctx, jnp.asarray(batch.kps[:N]),
                             jnp.asarray(batch.valid[:N]))
        tlets = assemble_tracklets(jax.device_get(out))
        # quality compared on substantial tracks: 1-frame ghost fragments
        # have unbounded reprojection error and would make the mean a coin
        # flip on which ghosts each schedule happens to spawn
        solid = [t for t in tlets if len(t) >= 5]
        results[name] = (tlets, reprojection_metrics(solid, batch, cams))

    (tp, mp), (tf, mf) = results["parity"], results["fast"]
    # same number of long tracks (>= 30 frames); a fragment boundary may
    # move by up to ~10 frames (with ik_cold_stages=1 the fast preset holds
    # the third Shelf track 77 vs 68 frames — a boundary bridge, not an
    # identity change; quality is pinned by the reproj/MPJPE gates below)
    long_p = sorted((len(t) for t in tp if len(t) >= 30), reverse=True)
    long_f = sorted((len(t) for t in tf if len(t) >= 30), reverse=True)
    assert len(long_p) == len(long_f), (long_p, long_f)
    for a, b in zip(long_p, long_f):
        assert abs(a - b) <= max(10, 0.1 * a), (long_p, long_f)
    # fragment-count wobble bounded (all fragments, ghosts included)
    assert abs(len(tp) - len(tf)) <= 3, (len(tp), len(tf))
    # reprojection quality preserved
    assert abs(mp.median_reproj_px - mf.median_reproj_px) < 0.3
    assert abs(mp.mean_reproj_px - mf.mean_reproj_px) < 0.8
    # matched 3D poses agree to a few cm — compared on the solid tracks for
    # the same reason as the reprojection metrics: a 2-3-frame ghost fragment
    # present in only one run has no true counterpart and best-matches a
    # DIFFERENT person's track (measured 0.5-0.7 m), which is a statement
    # about the ghost, not about backend consistency
    solid_p = [t for t in tp if len(t) >= 5]
    solid_f = [t for t in tf if len(t) >= 5]
    d = run_consistency_mpjpe(solid_p, solid_f)
    assert d < 0.05, d


def test_crowded_preset_fields():
    """`PipelineConfig.crowded()` is the identity-first preset: rescue off
    (the measured 10x10 identity hazard, docs/PERF.md r3 rescue/motion
    grid) and the tight center-NMS window (packed crowds put 21-24% of GT
    center pairs under 3 heatmap px, docs/PERF.md r5 crowd study);
    everything else at default; overrides pass through."""
    import dataclasses

    from multiview_motion_capture_tpu.config import PipelineConfig

    cfg = PipelineConfig.crowded()
    assert cfg.track_rescue_px == 0.0
    assert cfg.detect_nms_window == 3
    base = PipelineConfig()
    for f in dataclasses.fields(PipelineConfig):
        if f.name not in ("track_rescue_px", "detect_nms_window"):
            assert getattr(cfg, f.name) == getattr(base, f.name), f.name
    assert PipelineConfig.crowded(n_views=10).n_views == 10


def test_wide_preset_fields():
    """`PipelineConfig.wide(n)` packages the r4 TPU-measured wide-rig IK
    levers (docs/PERF.md r4 sweep: 64-cam full IK 126.7 -> 170.7 fps,
    quality-neutral on the crowd): merged cold schedule, warm budget 3,
    16-view IK cap, hierarchical clusters from 48 cameras up."""
    from multiview_motion_capture_tpu.config import PipelineConfig

    cfg = PipelineConfig.wide(64)
    assert cfg.n_views == 64
    assert cfg.ik_cold_stages == 1
    assert cfg.ik_warm_iters == 3
    assert cfg.ik_max_views == 16
    assert cfg.assoc_clusters == 2
    assert cfg.ik_solver == "gj"
    # below the fused-ALS N=384 ceiling: stay monolithic
    assert PipelineConfig.wide(20).assoc_clusters == 1
    # overrides pass through
    assert PipelineConfig.wide(64, ik_warm_iters=5).ik_warm_iters == 5


def test_scan_cache_identity_guard(seq):
    """Regression (VERDICT r1 weak #3): the per-context scan cache must never
    serve a scan compiled for a *different* context that happens to share the
    id() key (stale-address aliasing after GC, or eviction races)."""
    from multiview_motion_capture_tpu import tracker as trk

    ctx_a = TrackerContext.build(seq.cameras, CFG, use_ik=False)
    fn_a = trk._scan_fn(ctx_a)
    assert trk._scan_fn(ctx_a) is fn_a  # same live context -> cached

    # simulate an address collision: a fresh context whose id() slot holds an
    # entry built for ctx_a
    ctx_b = TrackerContext.build(seq.cameras, CFG, use_ik=False)
    trk._SCAN_CACHE[id(ctx_b)] = (ctx_a, fn_a)
    fn_b = trk._scan_fn(ctx_b)
    assert fn_b is not fn_a, "cache served a scan compiled for a dead context"
    # and the poisoned entry was replaced with the correct one
    assert trk._SCAN_CACHE[id(ctx_b)][0] is ctx_b


def test_ik_view_subset_matches_full_solve():
    """cfg.ik_max_views: capping each track's LM solve at its k best views
    must keep the same track structure and near-identical poses when the
    retained views still constrain the pose well (8-view ring, k=4)."""
    cfg_full = PipelineConfig(n_views=8, max_people=4, max_tracks=8,
                              max_frames=None, als_max_iter=100,
                              ik_warm_stages=1, ik_solver="gj")
    cfg_sub = PipelineConfig(n_views=8, max_people=4, max_tracks=8,
                             max_frames=None, als_max_iter=100,
                             ik_warm_stages=1, ik_solver="gj",
                             ik_max_views=4)
    s = synthetic_sequence(n_frames=10, n_people=2, n_views=8,
                           cfg=cfg_full, seed=3, drop_prob=0.0)
    outs = {}
    for name, cfg in (("full", cfg_full), ("sub", cfg_sub)):
        ctx = TrackerContext.build(s.cameras, cfg, use_ik=True)
        _, out = run_offline(ctx, jnp.asarray(s.batch.kps),
                             jnp.asarray(s.batch.valid))
        outs[name] = assemble_tracklets(jax.device_get(out))
    assert len(outs["sub"]) == len(outs["full"])
    for a, b in zip(outs["full"], outs["sub"]):
        assert a.frame_idxs == b.frame_idxs
        # same person, nearly the same pose: 4 well-placed ring cameras
        # constrain the solve as well as 8
        d = np.linalg.norm(a.poses_3d - b.poses_3d, axis=-1)
        assert np.median(d) < 0.02, np.median(d)


def test_motion_gain_velocity_state():
    """cfg.motion_gain: the tracked EMA velocity must approximate the true
    per-frame displacement of a constantly-moving person, and stay zero when
    the feature is off."""
    from multiview_motion_capture_tpu.tracker import TrackerState, make_step

    cfg = PipelineConfig(n_views=4, max_people=3, max_tracks=4,
                         max_frames=None, motion_gain=1.0,
                         motion_vel_beta=1.0, als_max_iter=100)
    s = synthetic_sequence(n_frames=10, n_people=1, n_views=4, cfg=cfg,
                           seed=5, drop_prob=0.0, noise_px=0.1)
    ctx = TrackerContext.build(s.cameras, cfg, use_ik=False)
    state, _ = run_offline(ctx, jnp.asarray(s.batch.kps),
                           jnp.asarray(s.batch.valid))
    state = jax.device_get(state)
    slot = int(np.argmax(state.active))
    assert state.active[slot] > 0
    gt_vel = s.gt_3d[-1, 0] - s.gt_3d[-2, 0]          # (17, 3) true delta
    est_hip = state.root_vel[slot]
    # the root is the hip midpoint: compare against the GT hip-center delta
    gt_hip = 0.5 * (gt_vel[11] + gt_vel[12])
    assert np.linalg.norm(est_hip - gt_hip) < 0.01, (est_hip, gt_hip)

    cfg0 = PipelineConfig(n_views=4, max_people=3, max_tracks=4,
                          max_frames=None, als_max_iter=100)
    ctx0 = TrackerContext.build(s.cameras, cfg0, use_ik=False)
    state0, _ = run_offline(ctx0, jnp.asarray(s.batch.kps),
                            jnp.asarray(s.batch.valid))
    assert not np.any(np.asarray(jax.device_get(state0).root_vel))
