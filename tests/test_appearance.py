"""Appearance evidence in association (VERDICT r3 next #2): config-gated
per-detection embeddings + per-track EMA, biasing the 2D-3D similarity
block at crossing instants."""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import (
    synthetic_appearance,
    synthetic_sequence,
)
from multiview_motion_capture_tpu.tracker import (
    TrackerContext,
    assemble_tracklets,
    run_offline,
)


def _base(n_views=4, **kw):
    return PipelineConfig(n_views=n_views, max_people=4, max_tracks=6,
                          als_max_iter=100, max_frames=None, **kw)


def test_zero_embeddings_reproduce_baseline_exactly():
    """appearance_dim > 0 with all-zero embeddings must be bit-identical to
    the appearance-off tracker (the penalty is zero wherever either side
    has no embedding) — the off-by-default parity contract."""
    cfg0 = _base()
    cfgA = _base(appearance_dim=8)
    seq = synthetic_sequence(n_frames=8, n_people=2, n_views=4, cfg=cfg0,
                             seed=3, drop_prob=0.1)
    k, v = jnp.asarray(seq.batch.kps), jnp.asarray(seq.batch.valid)
    ctx0 = TrackerContext.build(seq.cameras, cfg0, use_ik=True)
    _, o0 = run_offline(ctx0, k, v)
    ctxA = TrackerContext.build(seq.cameras, cfgA, use_ik=True)
    _, oA = run_offline(ctxA, k, v, app=jnp.zeros((8, 4, 4, 8)))
    a = assemble_tracklets(jax.device_get(o0))
    b = assemble_tracklets(jax.device_get(oA))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.frame_idxs == y.frame_idxs
        np.testing.assert_array_equal(x.matched_pose, y.matched_pose)
        np.testing.assert_array_equal(x.poses_3d, y.poses_3d)


def test_appearance_requires_app_input():
    import pytest

    cfg = _base(appearance_dim=8)
    seq = synthetic_sequence(n_frames=3, n_people=2, n_views=4, cfg=cfg,
                             seed=3)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=False)
    with pytest.raises(ValueError, match="appearance"):
        run_offline(ctx, jnp.asarray(seq.batch.kps),
                    jnp.asarray(seq.batch.valid))


def test_ema_state_is_unit_norm_and_resets_on_spawn():
    cfg = _base(appearance_dim=8)
    seq = synthetic_sequence(n_frames=8, n_people=2, n_views=4, cfg=cfg,
                             seed=3, drop_prob=0.1)
    app = synthetic_appearance(seq, dim=8, noise=0.2)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    st, _ = run_offline(ctx, jnp.asarray(seq.batch.kps),
                        jnp.asarray(seq.batch.valid), app=jnp.asarray(app))
    norms = np.linalg.norm(np.asarray(st.app_ema), axis=1)
    act = np.asarray(st.active)
    assert np.allclose(norms[act > 0], 1.0, atol=1e-4)
    assert np.allclose(norms[act == 0], 0.0, atol=1e-6)


def test_streaming_matches_offline_with_appearance():
    from multiview_motion_capture_tpu.tracker import MvTracker

    cfg = _base(appearance_dim=8)
    seq = synthetic_sequence(n_frames=6, n_people=2, n_views=4, cfg=cfg,
                             seed=3, drop_prob=0.0)
    app = synthetic_appearance(seq, dim=8, noise=0.2)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(seq.batch.kps),
                         jnp.asarray(seq.batch.valid), app=jnp.asarray(app))
    off = assemble_tracklets(jax.device_get(out))

    trk = MvTracker(seq.cameras, cfg, use_ik=True)
    for f in range(6):
        trk.update(f, seq.batch.kps[f], seq.batch.valid[f], app=app[f])
    on = trk.tracklets()
    assert len(off) == len(on)
    for x, y in zip(off, on):
        assert x.frame_idxs == y.frame_idxs
        # structure identical; poses to fp tolerance — the whole-sequence
        # scan and the per-frame jit compile to different XLA programs, and
        # the appearance term shifts their fusion enough that the LM f32
        # drift lands ~3e-5 (measured; matches/frames still identical)
        np.testing.assert_allclose(x.poses_3d, y.poses_3d, atol=1e-3)


def test_detect_to_track_with_appearance_e2e():
    """The production appearance path end-to-end: bottom-up detector emits
    keypoint-color-layout embeddings in the same forward, the tracker
    consumes them (CLI `detect --appearance`)."""
    from pathlib import Path

    import pytest

    ckpt = (Path(__file__).resolve().parents[1]
            / "multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz")
    if not ckpt.exists():
        pytest.skip("shipped checkpoint not built yet")

    from examples.e2e_fullframe import scaled_cameras
    from multiview_motion_capture_tpu import pipeline
    from multiview_motion_capture_tpu.data.detect import (
        frames_to_frame_batch,
        make_bottom_up_detector,
    )
    from multiview_motion_capture_tpu.data.detect_train import render_sequence
    from multiview_motion_capture_tpu.data.render import RenderConfig
    from multiview_motion_capture_tpu.models.checkpoint import load_posenet
    import dataclasses

    mcfg, params = load_posenet(ckpt)
    cfg = PipelineConfig(n_views=4, max_people=4, max_tracks=6,
                         max_frames=None)
    seq = synthetic_sequence(n_frames=6, n_people=2, n_views=4, cfg=cfg,
                             noise_px=0.0, drop_prob=0.0, seed=123,
                             min_person_distance=1.5)
    tints = np.array([[1.35, 0.65, 0.65], [0.65, 0.65, 1.35]], np.float32)
    images = render_sequence(seq, RenderConfig(hw=(192, 256)),
                             world_scale=0.25, seed=9, person_tints=tints)
    detect = make_bottom_up_detector(mcfg, max_people=cfg.max_people,
                                     center_min_score=0.2,
                                     return_appearance=True)
    batch, app = frames_to_frame_batch(detect, params, images, cfg,
                                       collect_appearance=True)
    assert app.shape == (6, 4, cfg.max_people, mcfg.n_kps * 3)
    # valid detections carry unit embeddings
    norms = np.linalg.norm(app, axis=-1)
    assert np.allclose(norms[batch.valid], 1.0, atol=1e-4)
    assert np.allclose(norms[~batch.valid], 0.0, atol=1e-6)

    cfg_app = dataclasses.replace(cfg, appearance_dim=app.shape[-1])
    cams_small = scaled_cameras(seq.cameras, 0.25)
    res = pipeline.run(batch, cams_small, cfg_app, use_ik=False, app=app)
    long = [t for t in res.tracklets if len(t) >= 4]
    assert len(long) == 2, [len(t) for t in res.tracklets]


def test_appearance_improves_crowd_identity():
    """Appearance evidence must beat geometry-only identity after re-ID on
    a crowded scene (8 people, 6 views, occlusion): measured 0.703 -> 0.846
    post-re-ID IDF1 at these seeds (deterministic on CPU; the full 10x10
    study lives in docs/PERF.md)."""
    from multiview_motion_capture_tpu.eval import identity_metrics
    from multiview_motion_capture_tpu.reid import merge_tracklets

    def run(app_dim):
        cfg = PipelineConfig(n_views=6, max_people=8, max_tracks=12,
                             max_frames=None, als_max_iter=100,
                             ik_warm_stages=1, ik_solver="gj",
                             track_rescue_px=0.0, appearance_dim=app_dim)
        seq = synthetic_sequence(n_frames=120, n_people=8, n_views=6,
                                 cfg=cfg, seed=0, noise_px=1.0, drop_prob=0.1)
        app = None
        if app_dim:
            app = jnp.asarray(synthetic_appearance(seq, dim=app_dim,
                                                   noise=0.25))
        ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
        _, out = run_offline(ctx, jnp.asarray(seq.batch.kps),
                             jnp.asarray(seq.batch.valid), app=app)
        tlets = assemble_tracklets(jax.device_get(out))
        return identity_metrics(merge_tracklets(tlets), seq.gt_slot_person)

    geo = run(0)
    app = run(16)
    assert app.idf1 > geo.idf1 + 0.05, (geo.idf1, app.idf1)
