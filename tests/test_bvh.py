import numpy as np

from multiview_motion_capture_tpu.utils import bvh
from multiview_motion_capture_tpu.ops.fk import (
    REF_SIDE_BONE_LENS,
    REF_BONE_DIRS,
    SIDE_TO_FULL,
)
from multiview_motion_capture_tpu.pose_def import BASIC_18_PARENTS


def test_bvh_round_trip(tmp_path):
    rng = np.random.RandomState(0)
    F = 5
    roots = rng.uniform(-1, 1, (F, 3))
    eulers = rng.uniform(-0.8, 0.8, (F, 18, 3))
    side = np.asarray(REF_SIDE_BONE_LENS)

    path = tmp_path / "track.bvh"
    bvh.write_bvh(path, roots, eulers, side, frame_time=0.04)
    data = bvh.read_bvh(path)

    assert data.names[0] == "Mid_Hip"
    assert len(data.names) == 18
    np.testing.assert_array_equal(data.parents[1:], np.asarray(BASIC_18_PARENTS)[1:])
    assert data.frame_time == 0.04
    np.testing.assert_allclose(data.roots / 100.0, roots, atol=1e-3)
    np.testing.assert_allclose(data.eulers, eulers, atol=1e-4)
    # offsets match the skeleton rest pose (cm)
    expect = REF_BONE_DIRS * side[np.asarray(SIDE_TO_FULL)][:, None] * 100.0
    np.testing.assert_allclose(data.offsets[1:], expect[1:], atol=1e-4)


def test_bvh_static_header(tmp_path):
    path = tmp_path / "t.bvh"
    bvh.write_bvh(path, np.zeros((1, 3)), np.zeros((1, 18, 3)), np.asarray(REF_SIDE_BONE_LENS))
    text = path.read_text()
    assert text.startswith("HIERARCHY\nROOT Mid_Hip")
    assert "CHANNELS 6 Xposition Yposition Zposition Xrotation Yrotation Zrotation" in text
    assert text.count("End Site") == 6  # ankles, wrists, ears are the leaves
    assert "MOTION" in text


def test_bvh_export_replays_tracked_motion(tmp_path):
    """Exported BVH, re-read and FK-replayed, reproduces the tracked joint
    positions (up to the writer's static-skeleton bone-length averaging)."""
    import jax
    import jax.numpy as jnp
    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
    from multiview_motion_capture_tpu.ops.fk_generic import animate_bvh
    from multiview_motion_capture_tpu.tracker import (
        TrackerContext, assemble_tracklets, run_offline,
    )

    cfg = PipelineConfig(n_views=4, max_people=4, max_tracks=6, max_frames=None)
    seq = synthetic_sequence(n_frames=6, n_people=1, n_views=4, cfg=cfg,
                             drop_prob=0.0, seed=13)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(seq.batch.kps), jnp.asarray(seq.batch.valid))
    t = assemble_tracklets(jax.device_get(out))[0]

    path = tmp_path / "track.bvh"
    bvh.export_tracklet_bvh(path, t)
    data = bvh.read_bvh(path)
    pos = np.asarray(animate_bvh(data)) / 100.0  # cm -> m
    err = np.linalg.norm(pos - t.poses_3d, axis=-1)
    assert err.mean() < 0.02, err.mean()  # bone lengths averaged over frames
