"""Hindsight crossing resolution (crossings.resolve_crossings).

Unit-level: constructed two-track crossing scenes with a known identity
swap — the pass must fix exactly the swapped case and leave the correct
case alone, on each evidence channel independently.  The e2e crowd gate
(10x10 synthetic through the real tracker) lives in test_reid.py /
scripts/identity_study.py.
"""
from __future__ import annotations

import numpy as np
import pytest

from multiview_motion_capture_tpu.crossings import (
    CrossingConfig,
    resolve_crossings,
)
from multiview_motion_capture_tpu.pose_def import (
    BASIC_18_PARENTS,
    basic18_side_bone_maps,
)
from multiview_motion_capture_tpu.tracker import Tracklet

F = 100
T_CROSS = 50
D = 8


def _person_paths():
    """Two people walking through each other along x."""
    t = np.arange(F, dtype=np.float64)
    pa = np.stack([0.05 * (t - T_CROSS), np.zeros(F), np.ones(F)], axis=1)
    pb = np.stack([-0.05 * (t - T_CROSS), 0.02 * np.ones(F), np.ones(F)], axis=1)
    return pa, pb


def _ident_app(seed):
    rng = np.random.RandomState(seed)
    v = rng.randn(D)
    return v / np.linalg.norm(v)


def _skel_poses(roots, sides):
    """Poses whose fitted bone prior reproduces `sides` exactly: each joint
    hangs off its BASIC_18 parent at the side length along a fixed random
    direction."""
    parents = np.asarray(BASIC_18_PARENTS)
    _, side_to_full = basic18_side_bone_maps()
    rng = np.random.RandomState(3)
    dirs = rng.randn(18, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    L = len(roots)
    poses = np.zeros((L, 18, 3))
    poses[:, 0] = roots
    pending = list(range(1, 18))
    while pending:
        j = pending.pop(0)
        p = int(parents[j])
        if p != 0 and p in pending:
            pending.append(j)
            continue
        poses[:, j] = poses[:, p] + sides[:, side_to_full[j], None] * dirs[j]
    return poses


def _make_tracklet(tid, roots, app_rows=None, sides=None):
    L = len(roots)
    if sides is not None:
        poses = _skel_poses(np.asarray(roots, np.float64), np.asarray(sides))
    else:
        poses = np.zeros((L, 18, 3))
        poses[:, :, :] = roots[:, None, :]
    return Tracklet(
        track_id=tid,
        frame_idxs=list(range(L)),
        roots=np.asarray(roots, np.float64),
        eulers=np.zeros((L, 18, 3)),
        side_lens=(np.asarray(sides) if sides is not None
                   else np.zeros((L, 11))),
        poses_3d=poses,
        poses_score=np.ones((L, 18)),
        matched_pose=np.zeros((L, 5), np.int32),
        app=app_rows,
    )


def _crossed_tracklets(swap: bool, app=True, sides=False):
    """Tracker output for a crossing: `swap=True` = the per-frame parse got
    the crossing wrong (each track follows the OTHER person after T_CROSS).
    Identity evidence (appearance and/or bones) always follows the PERSON."""
    pa, pb = _person_paths()
    ia, ib = _ident_app(0), _ident_app(1)
    rng = np.random.RandomState(7)

    def noisy(ident, n):
        a = ident[None, :] + 0.05 * rng.randn(n, D)
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    sa = np.tile(np.linspace(0.30, 0.40, 11), (F, 1))
    sb = np.tile(np.linspace(0.20, 0.28, 11), (F, 1))

    cut = T_CROSS
    if swap:
        r0 = np.concatenate([pa[:cut], pb[cut:]])
        r1 = np.concatenate([pb[:cut], pa[cut:]])
        a0 = np.concatenate([noisy(ia, cut), noisy(ib, F - cut)])
        a1 = np.concatenate([noisy(ib, cut), noisy(ia, F - cut)])
        s0 = np.concatenate([sa[:cut], sb[cut:]])
        s1 = np.concatenate([sb[:cut], sa[cut:]])
    else:
        r0, r1 = pa, pb
        a0, a1 = noisy(ia, F), noisy(ib, F)
        s0, s1 = sa, sb
    return [
        _make_tracklet(0, r0, a0 if app else None, s0 if sides else None),
        _make_tracklet(1, r1, a1 if app else None, s1 if sides else None),
    ]


def _identity_consistent(t):
    """Max |mean app of first half vs second half| cosine — 1.0 = one person."""
    a = np.asarray(t.app)
    h = len(a) // 2
    m1 = a[:h].mean(axis=0)
    m2 = a[h:].mean(axis=0)
    return float(np.dot(m1, m2) / (np.linalg.norm(m1) * np.linalg.norm(m2)))


def test_swapped_crossing_is_fixed_by_appearance():
    # the appearance repair path is CUT at the identity break -> the
    # appearance-aware reid merge reassembles pure pieces (the measured
    # architecture, docs/PERF.md r5); every output fragment must be
    # identity-pure
    tl = _crossed_tracklets(swap=True)
    before = min(_identity_consistent(t) for t in tl)
    assert before < 0.5  # the swap is real in the input
    out, log = resolve_crossings(tl, return_log=True)
    cuts = [e for e in log if "cut_track" in e]
    assert len(cuts) == 2  # both tracks carry a break at T_CROSS
    assert all(abs(e["t_cut"] - T_CROSS) <= 2 for e in cuts)
    after = min(_identity_consistent(t) for t in out)
    assert after > 0.95
    # and the merge pass re-joins them into two identity-pure tracks
    from multiview_motion_capture_tpu.reid import merge_tracklets

    merged = merge_tracklets(out)
    assert len(merged) == 2
    assert min(_identity_consistent(t) for t in merged) > 0.95


def test_oscillating_track_is_cut_at_every_run():
    # the measured crowd failure mode: a track alternates between two
    # people's detections in multi-frame runs; 2-means label transitions
    # must cut every run boundary (windowed change-points blend them away)
    from multiview_motion_capture_tpu.crossings import cut_identity_breaks

    pa, pb = _person_paths()
    ia, ib = _ident_app(0), _ident_app(1)
    rng = np.random.RandomState(11)

    def noisy(ident, n):
        a = ident[None, :] + 0.05 * rng.randn(n, D)
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    # 5 runs of 20 frames, alternating identity
    runs = [(ia, pa), (ib, pb), (ia, pa), (ib, pb), (ia, pa)]
    roots = np.concatenate([p[i * 20:(i + 1) * 20] for i, (_, p) in
                            enumerate(runs)])
    app = np.concatenate([noisy(ident, 20) for ident, _ in runs])
    t = _make_tracklet(0, roots, app)
    out, log = cut_identity_breaks([t], return_log=True)
    assert len(out) == 5  # one fragment per run
    assert all(_identity_consistent(f) > 0.95 for f in out)
    cut_frames = sorted(e["t_cut"] for e in log)
    assert all(abs(c - e) <= 2 for c, e in zip(cut_frames, [19, 39, 59, 79]))


def test_correct_crossing_is_left_alone():
    tl = _crossed_tracklets(swap=False)
    out, log = resolve_crossings(tl, return_log=True)
    assert not any(e.get("swap") for e in log)
    # events were detected (the people DO cross) but decided straight
    assert len(log) >= 1
    for a, b in zip(tl, out):
        assert np.allclose(a.roots, b.roots)


def test_swapped_crossing_is_fixed_by_bones_without_appearance():
    tl = _crossed_tracklets(swap=True, app=False, sides=True)
    out, log = resolve_crossings(tl, return_log=True)
    swaps = [e for e in log if e.get("swap")]
    assert len(swaps) == 1 and "bone" in swaps[0]["channels"]
    # tails exchanged: track 0's side lengths are person A's throughout
    for t in out:
        s = np.asarray(t.side_lens)
        assert np.allclose(s[0], s[-1], atol=1e-6)


def test_no_event_when_tracks_never_close():
    pa, pb = _person_paths()
    pb = pb + np.array([0.0, 5.0, 0.0])  # parallel, far apart
    tl = [_make_tracklet(0, pa, None, None), _make_tracklet(1, pb, None, None)]
    out, log = resolve_crossings(tl, return_log=True)
    assert log == []


def test_no_swap_without_any_evidence_channel():
    # no appearance, no bones (side_lens zero): geometry alone must stand
    tl = _crossed_tracklets(swap=True, app=False, sides=False)
    out, log = resolve_crossings(tl, return_log=True)
    assert not any(e.get("swap") for e in log)


def test_frames_and_poses_conserved():
    tl = _crossed_tracklets(swap=True)
    out = resolve_crossings(tl)
    all_in = sorted((f, tuple(np.round(r, 6)))
                    for t in tl for f, r in zip(t.frame_idxs, t.roots))
    all_out = sorted((f, tuple(np.round(r, 6)))
                     for t in out for f, r in zip(t.frame_idxs, t.roots))
    assert all_in == all_out  # rows moved between tracks, never modified


def test_short_evidence_window_declines():
    tl = _crossed_tracklets(swap=True)
    cfg = CrossingConfig(min_side_frames=60)  # longer than either side
    out, log = resolve_crossings(tl, cfg, return_log=True)
    assert all(e.get("reason") == "insufficient_evidence_rows" for e in log)
