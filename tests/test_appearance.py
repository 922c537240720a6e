"""Appearance evidence in association (VERDICT r3 next #2): config-gated
per-detection embeddings + per-track EMA, biasing the 2D-3D similarity
block at crossing instants."""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def test_spatial_path_appearance_semantics():
    """The spatial-only matrix (first frame / total-loss re-acquisition,
    roadmap r4 #4) carries the same appearance penalty: cross-person
    similarity entries drop, same-person entries and the z-statistics are
    untouched (stats are computed over the geometric distances only, so
    identical embeddings everywhere reproduce the geometric matrix
    bit-exactly)."""
    from multiview_motion_capture_tpu.tracker import _spatial_similarity

    cfg = _base(appearance_dim=8)
    seq = synthetic_sequence(n_frames=2, n_people=2, n_views=4, cfg=cfg,
                             seed=3, drop_prob=0.0)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=False)
    kps = jnp.asarray(seq.batch.kps[0])          # (V, P, K, 3)
    valid = jnp.asarray(seq.batch.valid[0])      # (V, P)
    app = jnp.asarray(synthetic_appearance(seq, dim=8, noise=0.0)[0])

    sim_geo, ev = _spatial_similarity(ctx, kps, valid)

    # identical embedding on every detection -> cos == 1 -> zero penalty,
    # and because the z-stats ignore the penalty the matrix is bit-equal
    one = jnp.where(valid[..., None], app[0, 0] / jnp.linalg.norm(app[0, 0]),
                    0.0)
    sim_same = _spatial_similarity(ctx, kps, valid, app=one)[0]
    np.testing.assert_array_equal(np.asarray(sim_geo), np.asarray(sim_same))

    # distinct per-person embeddings -> cross-person entries strictly drop,
    # same-person entries stay (noise=0 embeddings are exact per person)
    sim_app = _spatial_similarity(ctx, kps, valid, app=app)[0]
    T, P = cfg.max_tracks, cfg.max_people
    person = np.asarray(seq.gt_slot_person[0])   # (V, P) person id per slot
    vflat = np.asarray(valid).reshape(-1)
    pid = person.reshape(-1)
    g = np.asarray(sim_geo)[T:, T:]
    a = np.asarray(sim_app)[T:, T:]
    n = g.shape[0]
    ij_valid = np.outer(vflat, vflat) & ~np.eye(n, dtype=bool)
    same_person = (pid[:, None] == pid[None, :]) & ij_valid
    cross = ij_valid & ~same_person
    # same-person penalty is gain * (1 - cos) with cos numerically ~1 but
    # not bit-exactly 1 (norm/dot rounding), so allow float-noise slack
    np.testing.assert_allclose(a[same_person], g[same_person],
                               rtol=0, atol=5e-7)
    assert np.all(a[cross] <= g[cross])          # penalty only ever hurts
    assert np.max(g[cross] - a[cross]) > 0.05    # and it actually bites


def test_auto_gain_calibration():
    """Online gain auto-calibration (cfg.appearance_auto_target_px,
    roadmap r4 #3): the state's cosine stats converge to the embedding
    source's actual same/cross cosines, the effective gain lands at
    target / gap whatever the source's absolute scale, and a signal-free
    source self-disables (gain -> 0) instead of injecting noise."""
    from multiview_motion_capture_tpu.tracker import _appearance_gain

    def final_state(shared_frac, noise):
        cfg = _base(appearance_dim=8, appearance_auto_target_px=8.0)
        seq = synthetic_sequence(n_frames=30, n_people=3, n_views=4,
                                 cfg=cfg, seed=5, drop_prob=0.05)
        app = synthetic_appearance(seq, dim=8, noise=noise,
                                   shared_frac=shared_frac)
        ctx = TrackerContext.build(seq.cameras, cfg, use_ik=False)
        st, _ = run_offline(ctx, jnp.asarray(seq.batch.kps),
                            jnp.asarray(seq.batch.valid),
                            app=jnp.asarray(app))
        return cfg, st

    # oracle-grade identities: at dim=8 / noise=0.25 the actual statistics
    # are cos_same ~ 1/sqrt(1 + 0.25^2 * 8) ~ 0.8 and cos_diff ~ 1/sqrt(8)
    # order (random unit vectors in 8-dim are not orthogonal) — the
    # CONTRACT is that the stats track those truths and the gain lands at
    # target / gap, not any particular absolute cosine
    cfg, st = final_state(0.0, 0.25)
    cs, cd, w, vs = np.asarray(st.app_stats)
    assert w > 0.5, st.app_stats
    assert cs > 0.6 and cs - cd > 0.3, (cs, cd)
    g = float(_appearance_gain(cfg, st))

    def expected(cfg, stats):
        cs, cd, w, vs = np.asarray(stats)
        # the r5 two-constraint rule: discrimination target AND noise cap
        # (gain * std(matched cos) <= appearance_auto_noise_px)
        return min(8.0 / (cs - cd),
                   cfg.appearance_auto_noise_px / max(np.sqrt(vs), 1e-6))

    assert g == pytest.approx(expected(cfg, st.app_stats), rel=1e-3), (
        g, np.asarray(st.app_stats))

    # extractor-grade shared structure (cos_diff ~0.8): the gap shrinks,
    # the auto gain grows to keep the true-vs-false swap worth target px —
    # up to the noise cap
    cfg2, st2 = final_state(0.83, 0.15)
    g2 = float(_appearance_gain(cfg2, st2))
    assert g2 == pytest.approx(expected(cfg2, st2.app_stats), rel=1e-3)
    assert g2 > 1.5 * g, (g, g2)

    # signal-free source (identical embedding for everyone): gap ~ 0
    cfg3, st3 = final_state(1.0, 0.0)
    g3 = float(_appearance_gain(cfg3, st3))
    assert g3 == 0.0, (g3, np.asarray(st3.app_stats))


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


# ---------------------------------------------------------------------------
# metric-learned appearance head (models.appearance_net, r4)
# ---------------------------------------------------------------------------


def test_appearance_head_forward_zero_rows_and_roundtrip(tmp_path):
    """apply_head: unit output rows, zero input rows (empty detection
    slots) stay exactly zero (the tracker's no-evidence sentinel), and the
    self-describing checkpoint round-trips bit-exact."""
    from multiview_motion_capture_tpu.models.appearance_net import (
        AppearanceHeadConfig,
        apply_head,
        init_head,
    )
    from multiview_motion_capture_tpu.models.checkpoint import (
        load_appearance_head,
        save_appearance_head,
    )

    cfg = AppearanceHeadConfig(in_dim=51, hidden=(16, 8), out_dim=4)
    params = init_head(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(0).rand(3, 5, 51).astype(np.float32)
    x[1, 2] = 0.0
    x[2] = 0.0
    z = np.asarray(apply_head(cfg, params, jnp.asarray(x)))
    assert z.shape == (3, 5, 4)
    norms = np.linalg.norm(z, axis=-1)
    live = np.linalg.norm(x, axis=-1) > 0
    assert np.allclose(norms[live], 1.0, atol=1e-5)
    assert np.all(z[~live] == 0.0)

    p = tmp_path / "head.npz"
    save_appearance_head(p, cfg, params)
    cfg2, params2 = load_appearance_head(p)
    assert cfg2 == cfg
    z2 = np.asarray(apply_head(cfg2, params2, jnp.asarray(x)))
    assert np.array_equal(z, z2)


def test_appearance_head_training_widens_gap():
    """Supervised NT-Xent on a toy problem: identities live in 3 of 12
    descriptor dims, the rest is nuisance noise.  The raw cosine barely
    separates; a few training steps of the head must widen the held-out
    same-vs-different gap."""
    import optax

    from multiview_motion_capture_tpu.models.appearance_net import (
        AppearanceHeadConfig,
        apply_head,
        cosine_gap,
        init_head,
        make_train_step,
    )

    rng = np.random.RandomState(0)

    def make(n_per, n_ids, seed):
        r = np.random.RandomState(seed)
        sig = r.rand(n_ids, 3).astype(np.float32)
        x, y = [], []
        for i in range(n_ids):
            d = np.concatenate(
                [np.tile(sig[i], (n_per, 1))
                 + 0.05 * r.randn(n_per, 3).astype(np.float32),
                 r.rand(n_per, 9).astype(np.float32)], axis=1)
            x.append(d)
            y.extend([i] * n_per)
        x = np.concatenate(x)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        return jnp.asarray(x), jnp.asarray(np.asarray(y, np.int32))

    xt, yt = make(16, 6, 1)
    xv, yv = make(16, 6, 2)
    cfg = AppearanceHeadConfig(in_dim=12, hidden=(32,), out_dim=8)
    params = init_head(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = make_train_step(cfg, tx)
    s0, d0 = cosine_gap(apply_head(cfg, params, xv), yv)
    for _ in range(150):
        params, opt, loss = step(params, opt, xt, yt)
    s1, d1 = cosine_gap(apply_head(cfg, params, xv), yv)
    raw_gap = float(s0 - d0)
    trained_gap = float(s1 - d1)
    assert trained_gap > raw_gap + 0.15, (raw_gap, trained_gap)


def test_shipped_appearance_head_gate():
    """The SHIPPED head checkpoint must widen the held-out descriptor gap
    (fresh scenes/tints/styles never seen in training) by a wide margin —
    the r4 measurement is 0.045 raw -> 0.741 trained
    (scripts/train_appearance.py, docs/PERF.md)."""
    from pathlib import Path

    ckpt = (Path(__file__).resolve().parents[1]
            / "multiview_motion_capture_tpu/models/checkpoints"
            / "appearance_head.npz")
    if not ckpt.exists():
        pytest.skip("shipped appearance head not built yet")

    from multiview_motion_capture_tpu.data.appearance_train import (
        descriptor_batch,
    )
    from multiview_motion_capture_tpu.models.appearance_net import (
        apply_head,
        cosine_gap,
    )
    from multiview_motion_capture_tpu.models.checkpoint import (
        load_appearance_head,
    )

    cfg, params = load_appearance_head(ckpt)
    # seed far from both the training draw (0..) and the trainer's own
    # val draw (100003)
    embs, labels = descriptor_batch(seed=777_001, n_scenes=2, n_frames=4)
    e, l = jnp.asarray(embs), jnp.asarray(labels)
    rs, rd = cosine_gap(e, l)
    ts, td = cosine_gap(apply_head(cfg, params, e), l)
    raw_gap, trained_gap = float(rs - rd), float(ts - td)
    assert trained_gap > 0.35, (raw_gap, trained_gap)
    assert trained_gap > raw_gap + 0.2, (raw_gap, trained_gap)


def test_detector_emits_head_embeddings():
    """make_bottom_up_detector(appearance_head=...) emits out_dim unit
    embeddings from the same forward (zero rows for empty slots)."""
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    pn = root / "multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz"
    ah = root / "multiview_motion_capture_tpu/models/checkpoints/appearance_head.npz"
    if not pn.exists() or not ah.exists():
        pytest.skip("shipped checkpoints not built yet")

    from multiview_motion_capture_tpu.data.detect import (
        frames_to_frame_batch,
        make_bottom_up_detector,
    )
    from multiview_motion_capture_tpu.data.detect_train import render_sequence
    from multiview_motion_capture_tpu.data.render import RenderConfig
    from multiview_motion_capture_tpu.models.checkpoint import (
        load_appearance_head,
        load_posenet,
    )

    mcfg, params = load_posenet(pn)
    head = load_appearance_head(ah)
    cfg = PipelineConfig(n_views=4, max_people=4, max_tracks=6,
                         max_frames=None)
    seq = synthetic_sequence(n_frames=2, n_people=2, n_views=4, cfg=cfg,
                             noise_px=0.0, drop_prob=0.0, seed=123,
                             min_person_distance=1.5)
    tints = np.array([[1.35, 0.65, 0.65], [0.65, 0.65, 1.35]], np.float32)
    images = render_sequence(seq, RenderConfig(hw=(192, 256)),
                             world_scale=0.25, seed=9, person_tints=tints)
    detect = make_bottom_up_detector(mcfg, max_people=cfg.max_people,
                                     center_min_score=0.2,
                                     return_appearance=True,
                                     appearance_head=head)
    batch, app = frames_to_frame_batch(detect, params, images, cfg,
                                       collect_appearance=True)
    assert app.shape == (2, 4, cfg.max_people, head[0].out_dim)
    norms = np.linalg.norm(app, axis=-1)
    assert np.allclose(norms[batch.valid], 1.0, atol=1e-4)
    assert np.allclose(norms[~batch.valid], 0.0, atol=1e-6)
