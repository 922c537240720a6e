"""Tracklet re-identification merge pass (reid.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from multiview_motion_capture_tpu.ops.fk import Skeleton, forward_kinematics
from multiview_motion_capture_tpu.reid import ReidConfig, match_fragments, merge_tracklets
from multiview_motion_capture_tpu.tracker import Tracklet


SKEL = Skeleton.default()


def _make_fragment(track_id, frames, root_fn, side_scale=1.0, seed=0):
    """A tracklet fragment whose poses are real FK output: identity evidence
    (side bone lengths) is consistent within the fragment."""
    rng = np.random.RandomState(seed)
    frames = list(frames)
    L = len(frames)
    side = np.asarray(SKEL.side_bone_lens) * side_scale
    roots = np.stack([root_fn(f) for f in frames]).astype(np.float32)
    eulers = 0.05 * rng.standard_normal((L, 18, 3)).astype(np.float32)
    joints = jax.vmap(lambda r, e: forward_kinematics(
        SKEL, r, e, jnp.asarray(side, dtype=jnp.float32)))(
        jnp.asarray(roots), jnp.asarray(eulers))
    return Tracklet(
        track_id=track_id,
        frame_idxs=frames,
        roots=roots,
        eulers=eulers,
        side_lens=np.tile(side.astype(np.float32), (L, 1)),
        poses_3d=np.asarray(joints),
        poses_score=np.ones((L, 18), dtype=np.float32),
        matched_pose=np.zeros((L, 5), dtype=np.int32),
    )


def _walk(start, vel):
    return lambda f: np.asarray(start) + f * np.asarray(vel)


def test_merges_same_person_fragments():
    """Two fragments of one walking person, split by a 10-frame hole, merge;
    a different person (different bone lengths, elsewhere) stays separate."""
    a1 = _make_fragment(0, range(0, 30), _walk([0, 0, 1.0], [0.01, 0, 0]), seed=1)
    a2 = _make_fragment(3, range(40, 70), _walk([0, 0, 1.0], [0.01, 0, 0]), seed=2)
    b = _make_fragment(1, range(35, 80), _walk([3.0, 3.0, 1.0], [0, 0.01, 0]),
                       side_scale=1.3, seed=3)
    merged = merge_tracklets([a1, b, a2])
    assert len(merged) == 2
    ids = sorted(t.track_id for t in merged)
    assert ids == [0, 1]
    big = next(t for t in merged if t.track_id == 0)
    assert big.frame_idxs == list(range(0, 30)) + list(range(40, 70))
    assert len(big.poses_3d) == 60
    # merge only relabels/concatenates: per-frame data is bit-identical
    np.testing.assert_array_equal(big.poses_3d[:30], a1.poses_3d)
    np.testing.assert_array_equal(big.poses_3d[30:], a2.poses_3d)


def test_chains_merge_transitively():
    frags = [
        _make_fragment(i, range(40 * i, 40 * i + 30),
                       _walk([0, 0, 1.0], [0.008, 0, 0]), seed=i)
        for i in range(3)
    ]
    merged = merge_tracklets(frags)
    assert len(merged) == 1
    assert len(merged[0]) == 90


def test_gates_reject_wrong_matches():
    # same trajectory, very different bone lengths -> bone gate rejects
    a = _make_fragment(0, range(0, 30), _walk([0, 0, 1.0], [0.01, 0, 0]), seed=1)
    b = _make_fragment(1, range(40, 70), _walk([0, 0, 1.0], [0.01, 0, 0]),
                       side_scale=1.6, seed=2)
    assert match_fragments([a, b], ReidConfig(bone_sigma_floor_m=0.005)) == []

    # same person stats, but the gap exceeds the window -> no merge
    c = _make_fragment(2, range(200, 230), _walk([2.0, 0, 1.0], [0.01, 0, 0]), seed=1)
    assert match_fragments([a, c]) == []

    # temporal overlap is never a continuation
    d = _make_fragment(3, range(20, 50), _walk([0.2, 0, 1.0], [0.01, 0, 0]), seed=1)
    assert match_fragments([a, d]) == []


def test_triangulation_mode_merges_on_trajectory_alone():
    """Triangulation-mode tracklets (use_ik=False) carry all-zero side_lens
    and COCO-ordered points: the bone gate must be SKIPPED, not fed garbage
    statistics that reject every merge (regression)."""
    import dataclasses
    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
    from multiview_motion_capture_tpu import pipeline

    cfg = PipelineConfig(n_views=4, max_people=6, max_tracks=8, max_frames=None)
    seq = synthetic_sequence(n_frames=14, n_people=2, n_views=4, cfg=cfg,
                             drop_prob=0.0, seed=6, min_person_distance=1.5)
    seq.batch.valid[7] = False
    res = pipeline.run(seq.batch, seq.cameras, cfg, use_ik=False)
    assert len(res.tracklets) == 4
    assert not np.any(res.tracklets[0].side_lens)  # tri mode: no bone data
    merged = merge_tracklets(res.tracklets)
    assert len(merged) == 2
    for t in merged:
        assert t.frame_idxs[0] < 7 < t.frame_idxs[-1]


def test_trajectory_extrapolation_bridges_moving_person():
    """A fast mover: endpoints are far apart, but constant-velocity
    extrapolation across the gap lands on the new fragment's start."""
    vel = [0.05, 0.0, 0.0]  # 5 cm/frame
    a = _make_fragment(0, range(0, 30), _walk([0, 0, 1.0], vel), seed=4)
    b = _make_fragment(1, range(55, 85), _walk([0, 0, 1.0], vel), seed=5)
    gap_travel = np.linalg.norm(np.asarray(vel)) * (55 - 29)
    assert gap_travel > 0.6  # endpoint distance alone would be gated out
    merged = merge_tracklets([a, b])
    assert len(merged) == 1


def test_bone_evidence_beats_trajectory_only():
    """The bone-length discriminator resolving what trajectory cannot
    (VERDICT r3 next #3): a fragment end with TWO spawn candidates — the
    true continuation (same skeleton, a bit farther from the extrapolated
    position) and an imposter (different skeleton, closer).  Trajectory
    alone picks the imposter; the bone evidence flips the assignment."""
    A = _make_fragment(0, range(0, 30), _walk([0, 0, 1.0], [0.01, 0, 0]),
                       seed=1)
    end = np.asarray([0.29, 0, 1.0])  # A's extrapolated root at frame 40
    true_cont = _make_fragment(1, range(40, 70),
                               _walk(end + [0.0, 0.25, 0], [0.01, 0, 0]),
                               side_scale=1.0, seed=2)
    imposter = _make_fragment(2, range(40, 70),
                              _walk(end + [0.0, 0.10, 0], [0.01, 0, 0]),
                              side_scale=1.15, seed=3)

    from multiview_motion_capture_tpu.reid import match_fragments

    tlets = [A, true_cont, imposter]
    pairs = match_fragments(tlets)  # default: bone evidence active
    assert (0, 1) in pairs, pairs

    traj_only = ReidConfig(min_frames_for_prior=10**9)
    pairs_nb = match_fragments(tlets, traj_only)
    assert (0, 2) in pairs_nb, pairs_nb  # trajectory alone is fooled


def test_varied_skeletons_carry_bone_signal_end_to_end():
    """Anthropometric variation in the generator flows through detection
    noise, association, triangulation and the LM solve into per-track bone
    lengths that rank people by their ground-truth scale."""
    import jax.numpy as jnp

    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
    from multiview_motion_capture_tpu.tracker import (
        TrackerContext, assemble_tracklets, run_offline,
    )

    cfg = PipelineConfig(n_views=5, max_people=4, max_tracks=6,
                         als_max_iter=100, ik_warm_stages=1, ik_solver="gj",
                         max_frames=None)
    seq = synthetic_sequence(n_frames=25, n_people=3, n_views=5, cfg=cfg,
                             seed=0, drop_prob=0.0, noise_px=1.0,
                             person_scale_std=0.1, bone_jitter_std=0.04)
    scales = seq.gt_person_scale
    assert np.ptp(scales) > 0.08, scales  # the draw actually spreads
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(seq.batch.kps),
                         jnp.asarray(seq.batch.valid))
    tlets = [t for t in assemble_tracklets(jax.device_get(out))
             if len(t) >= 10]
    assert len(tlets) == 3

    # match each tracklet to its GT person by root-trajectory distance
    def person_of(t):
        roots = np.asarray(t.roots)  # (L, 3)
        gt_roots = 0.5 * (seq.gt_3d[t.frame_idxs, :, 11]
                          + seq.gt_3d[t.frame_idxs, :, 12])  # (L, N, 3)
        d = np.linalg.norm(gt_roots - roots[:, None], axis=-1).mean(axis=0)
        return int(np.argmin(d))

    solved = {person_of(t): float(np.asarray(t.side_lens).sum(axis=1).mean())
              for t in tlets}
    assert len(solved) == 3  # one tracklet per person
    order_solved = sorted(solved, key=solved.get)
    order_gt = list(np.argsort(scales))
    assert order_solved == order_gt, (solved, scales)
