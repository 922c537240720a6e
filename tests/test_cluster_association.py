"""Hierarchical (camera-clustered) association — the N > 384 scaling path
(VERDICT r2 next #5).  Parity anchor: on separable scenes the clustered
tracker must reproduce the monolithic-ALS tracker exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.eval import mpjpe_vs_ground_truth
from multiview_motion_capture_tpu.tracker import (
    TrackerContext,
    assemble_tracklets,
    run_offline,
)


def _cfg(n_views, clusters, **kw):
    return PipelineConfig(n_views=n_views, max_people=6, max_tracks=8,
                          max_frames=None, als_backend="xla",
                          assoc_clusters=clusters, **kw)


def test_clustered_matches_monolithic_8cam():
    cfg_m = _cfg(8, 1)
    cfg_c = _cfg(8, 2)
    seq = synthetic_sequence(n_frames=6, n_people=3, n_views=8, cfg=cfg_m,
                             seed=11, drop_prob=0.0, min_person_distance=1.2)
    kps = jnp.asarray(seq.batch.kps)
    valid = jnp.asarray(seq.batch.valid)

    ctx_m = TrackerContext.build(seq.cameras, cfg_m, use_ik=False)
    _, out_m = run_offline(ctx_m, kps, valid)
    a = assemble_tracklets(jax.device_get(out_m))

    ctx_c = TrackerContext.build(seq.cameras, cfg_c, use_ik=False)
    _, out_c = run_offline(ctx_c, kps, valid)
    b = assemble_tracklets(jax.device_get(out_c))

    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-4)


def test_clustered_no_duplicate_spawns():
    """A new person visible to every cluster must spawn ONE track (the
    centroid merge), not one per cluster."""
    cfg = _cfg(12, 3)
    seq = synthetic_sequence(n_frames=5, n_people=4, n_views=12, cfg=cfg,
                             seed=3, drop_prob=0.0, min_person_distance=1.0)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=False)
    _, out = run_offline(ctx, jnp.asarray(seq.batch.kps),
                         jnp.asarray(seq.batch.valid))
    tlets = assemble_tracklets(jax.device_get(out))
    assert len(tlets) == 4, [t.frame_idxs for t in tlets]
    for t in tlets:
        assert len(t) == 5
    mp = mpjpe_vs_ground_truth(tlets, seq.gt_3d)
    assert mp < 0.03, mp


def test_clustered_with_ik_and_tracklet_bridging():
    """Once tracked, identity merges across clusters THROUGH the tracklet
    rows (no centroid dependence): full-IK run stays consistent."""
    cfg = _cfg(8, 2)
    seq = synthetic_sequence(n_frames=8, n_people=2, n_views=8, cfg=cfg,
                             seed=21, drop_prob=0.05, min_person_distance=1.5)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(seq.batch.kps),
                         jnp.asarray(seq.batch.valid))
    tlets = assemble_tracklets(jax.device_get(out))
    long = [t for t in tlets if len(t) >= 6]
    assert len(long) == 2, [len(t) for t in tlets]


def test_clustered_pallas_batched_matches_xla():
    """The batched multi-cluster Pallas kernel (one program for all C
    cluster solves) must reproduce the XLA per-cluster path through the
    full tracker."""
    cfg_x = _cfg(8, 2)
    cfg_p = PipelineConfig(n_views=8, max_people=6, max_tracks=8,
                           max_frames=None, als_backend="pallas",
                           assoc_clusters=2)
    seq = synthetic_sequence(n_frames=6, n_people=3, n_views=8, cfg=cfg_x,
                             seed=11, drop_prob=0.0, min_person_distance=1.2)
    kps = jnp.asarray(seq.batch.kps)
    valid = jnp.asarray(seq.batch.valid)
    outs = []
    for cfg in (cfg_x, cfg_p):
        ctx = TrackerContext.build(seq.cameras, cfg, use_ik=False)
        if cfg.als_backend == "pallas":
            assert ctx.cluster_pallas_ctx is not None
        _, out = run_offline(ctx, kps, valid)
        outs.append(assemble_tracklets(jax.device_get(out)))
    a, b = outs
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-4)


def test_clustered_non_divisible_matches_monolithic():
    """n_views % C != 0 (r5): clusters take interleaved sizes 4/3/3 and the
    short ones pad with a dead duplicate view — the result must still match
    the monolithic tracker exactly on a separable scene."""
    cfg_m = _cfg(10, 1)
    cfg_c = _cfg(10, 3)
    seq = synthetic_sequence(n_frames=6, n_people=3, n_views=10, cfg=cfg_m,
                             seed=11, drop_prob=0.0, min_person_distance=1.2)
    kps = jnp.asarray(seq.batch.kps)
    valid = jnp.asarray(seq.batch.valid)

    ctx_m = TrackerContext.build(seq.cameras, cfg_m, use_ik=False)
    _, out_m = run_offline(ctx_m, kps, valid)
    a = assemble_tracklets(jax.device_get(out_m))

    ctx_c = TrackerContext.build(seq.cameras, cfg_c, use_ik=False)
    _, out_c = run_offline(ctx_c, kps, valid)
    b = assemble_tracklets(jax.device_get(out_c))

    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-4)


def test_cluster_count_exceeding_views_rejected():
    with pytest.raises(ValueError, match="exceeds"):
        from multiview_motion_capture_tpu.cameras import synthetic_camera_ring

        TrackerContext.build(synthetic_camera_ring(2), _cfg(2, 3))


def test_cluster_sharded_als_equals_sequential():
    """Clusters -> devices (VERDICT r3 next #4): the cluster-sharded ALS
    tracker on the virtual CPU mesh reproduces the sequential clustered
    tracker EXACTLY — full IK output, 16 cams, 4 clusters over 4 devices."""
    from multiview_motion_capture_tpu.parallel.sharded_solvers import (
        make_cluster_mesh,
    )

    cfg = _cfg(16, 4, ik_solver="gj", ik_warm_stages=1)
    seq = synthetic_sequence(n_frames=6, n_people=4, n_views=16, cfg=cfg,
                             seed=5, drop_prob=0.0, min_person_distance=1.0)
    kps = jnp.asarray(seq.batch.kps)
    valid = jnp.asarray(seq.batch.valid)

    ctx_seq = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    _, out_seq = run_offline(ctx_seq, kps, valid)
    a = assemble_tracklets(jax.device_get(out_seq))

    mesh = make_cluster_mesh(4)
    ctx_sh = TrackerContext.build(seq.cameras, cfg, use_ik=True,
                                  cluster_mesh=mesh)
    _, out_sh = run_offline(ctx_sh, kps, valid)
    b = assemble_tracklets(jax.device_get(out_sh))

    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        assert x.track_id == y.track_id
        assert x.frame_idxs == y.frame_idxs
        # association decisions are BIT-equal across the mesh; poses only to
        # fp tolerance — the shard_map in the program changes XLA's fusion
        # of the downstream LM solve, and ~100 f32 iterations amplify the
        # last-ulp differences to ~1e-4 m (matches still identical)
        np.testing.assert_array_equal(x.matched_pose, y.matched_pose)
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-3)


def test_cluster_mesh_validation():
    from multiview_motion_capture_tpu.parallel.sharded_solvers import (
        make_cluster_mesh,
    )

    mesh = make_cluster_mesh(3)
    with pytest.raises(ValueError, match="not divisible"):
        TrackerContext.build(
            synthetic_sequence(n_frames=1, n_views=8, cfg=_cfg(8, 2)).cameras,
            _cfg(8, 2), cluster_mesh=mesh)
    with pytest.raises(ValueError, match="assoc_clusters > 1"):
        TrackerContext.build(
            synthetic_sequence(n_frames=1, n_views=8, cfg=_cfg(8, 1)).cameras,
            _cfg(8, 1), cluster_mesh=make_cluster_mesh(2))
