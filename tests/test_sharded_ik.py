"""Track-sharded LM decomposition (parallel.sharded_solvers.sharded_lm_solve):
the T independent per-slot IK solves of ONE rig mapped over mesh devices —
the second half of the one-rig solver decomposition (VERDICT r3 next #4).

Parity contract mirrors the cluster-sharded ALS path: tracklet structure
(frames, matches) identical to the single-device tracker; poses to f32
tolerance (shard_map changes XLA's fusion of the LM internals — last-ulp
drift across ~100 f32 iterations)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.ops import ik as ik_ops
from multiview_motion_capture_tpu.parallel.sharded_solvers import (
    make_track_mesh,
    sharded_lm_solve,
)
from multiview_motion_capture_tpu.tracker import (
    TrackerContext,
    assemble_tracklets,
    run_offline,
)


def _cfg(**kw):
    kw.setdefault("n_views", 4)
    kw.setdefault("max_tracks", 8)
    return PipelineConfig(max_people=4, max_frames=None,
                          als_backend="xla", **kw)


def _run(ctx, seq):
    _, out = run_offline(ctx, jnp.asarray(seq.batch.kps),
                         jnp.asarray(seq.batch.valid))
    return assemble_tracklets(jax.device_get(out))


@pytest.mark.parametrize("solver", ["chol", "gj"])
def test_tracker_ik_mesh_matches_single_device(solver):
    cfg = _cfg(ik_solver=solver)
    seq = synthetic_sequence(n_frames=5, n_people=3, n_views=4, cfg=cfg,
                             seed=21, drop_prob=0.0, min_person_distance=1.2)
    plain = _run(TrackerContext.build(seq.cameras, cfg, use_ik=True), seq)
    mesh = make_track_mesh(4)
    sharded = _run(TrackerContext.build(seq.cameras, cfg, use_ik=True,
                                        ik_mesh=mesh), seq)
    assert len(plain) == len(sharded) == 3
    for x, y in zip(plain, sharded):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_array_equal(x.matched_pose, y.matched_pose)
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-3)


def test_ik_mesh_with_wide_rig_view_cap():
    # ik_max_views makes P per-slot (T, k, 3, 4) — the sharded path must
    # shard those rows with their slots
    cfg = _cfg(n_views=8, ik_max_views=4, ik_solver="gj")
    seq = synthetic_sequence(n_frames=4, n_people=2, n_views=8, cfg=cfg,
                             seed=5, drop_prob=0.0, min_person_distance=1.2)
    plain = _run(TrackerContext.build(seq.cameras, cfg, use_ik=True), seq)
    sharded = _run(TrackerContext.build(seq.cameras, cfg, use_ik=True,
                                        ik_mesh=make_track_mesh(2)), seq)
    assert len(plain) == len(sharded) == 2
    for x, y in zip(plain, sharded):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-3)


def test_sharded_lm_solve_direct_matches_batched():
    # unit-level: the sharded solve on a standalone (T, ...) batch equals
    # the single-device solve_two_stage slot-for-slot
    cfg = _cfg()
    seq = synthetic_sequence(n_frames=1, n_people=3, n_views=4, cfg=cfg,
                             seed=3, drop_prob=0.0)
    skel = ik_ops.Skeleton.default()
    T, V = 8, 4
    kps = jnp.asarray(seq.batch.kps[0])  # (V, P, 17, 3)
    obs = jnp.zeros((T, V, 17, 3)).at[:3].set(
        jnp.transpose(kps[:, :3], (1, 0, 2, 3)))
    w = jnp.zeros((T, V)).at[:3].set(1.0)
    init = ik_ops.IkParams(
        root=jnp.zeros((T, 3)),
        euler=jnp.zeros((T, 18, 3)),
        side_lens=jnp.broadcast_to(skel.side_bone_lens, (T, 11)),
    )
    kw = dict(n_iters=8, stages=2, solver="gj", interpret=True)
    P = jnp.asarray(seq.cameras.P, jnp.float32)
    ref_p, ref_j = ik_ops.solve_two_stage(init, skel, obs, w, P, **kw)
    got_p, got_j = sharded_lm_solve(init, skel, obs, w, P,
                                    make_track_mesh(4), **kw)
    np.testing.assert_allclose(np.asarray(ref_j), np.asarray(got_j),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ref_p.root),
                               np.asarray(got_p.root), atol=1e-4)


def test_ik_mesh_divisibility_and_use_ik_validation():
    cfg = _cfg(max_tracks=6)
    seq = synthetic_sequence(n_frames=1, n_people=2, n_views=4, cfg=cfg,
                             seed=1)
    with pytest.raises(ValueError, match="not divisible"):
        TrackerContext.build(seq.cameras, cfg, use_ik=True,
                             ik_mesh=make_track_mesh(4))
    with pytest.raises(ValueError, match="use_ik"):
        TrackerContext.build(seq.cameras, _cfg(), use_ik=False,
                             ik_mesh=make_track_mesh(4))
