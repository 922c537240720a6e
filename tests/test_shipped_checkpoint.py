"""Quality gates for the SHIPPED detector checkpoint (VERDICT r2 next #1a):
the committed weights must deliver OpenPose-like quality on held-out
domain-randomized synthetic scenes — recall >= 0.9 @ 12 px, matched mean
error <= 3 px, and end-to-end detect->track MPJPE <= 3 cm.  Inference only
(training happens in scripts/train_posenet.py on the TPU)."""
from pathlib import Path

import numpy as np
import pytest

CKPT = (Path(__file__).resolve().parents[1]
        / "multiview_motion_capture_tpu/models/checkpoints/posenet_synth.npz")

pytestmark = pytest.mark.skipif(
    not CKPT.exists(), reason="shipped checkpoint not built yet"
)


@pytest.fixture(scope="module")
def detector():
    from multiview_motion_capture_tpu.data.detect import make_bottom_up_detector
    from multiview_motion_capture_tpu.models.checkpoint import load_posenet

    mcfg, params = load_posenet(CKPT)
    assert mcfg.predict_offsets and mcfg.predict_center
    detect = make_bottom_up_detector(mcfg, max_people=6, center_min_score=0.2)
    return mcfg, params, detect


def test_heldout_detection_quality(detector):
    """Held-out seeds (never trained on): recall >= 0.9 @ 12 px and matched
    mean error <= 3 px — an order of magnitude above the r2 demo gates
    (recall 0.4 @ 12 px, err < 9 px)."""
    import jax.numpy as jnp

    from multiview_motion_capture_tpu.data.detect_train import (
        evaluate_detections,
        generate_samples,
    )
    from multiview_motion_capture_tpu.data.render import RenderConfig

    mcfg, params, detect = detector
    ss = generate_samples([2000, 2001, 2002], RenderConfig(hw=(192, 256)),
                          n_frames=4, n_views=4, n_people_range=(2, 4))
    kps_all, val_all = [], []
    for s in range(0, ss.images.shape[0], 16):
        kps, _, valid = detect(params, jnp.asarray(ss.images[s:s + 16]))
        kps_all.append(np.asarray(kps))
        val_all.append(np.asarray(valid))
    q = evaluate_detections(np.concatenate(kps_all), np.concatenate(val_all),
                            np.nan_to_num(ss.kps_px[..., :2]), ss.present,
                            match_px=12.0)
    assert q["recall"] >= 0.9, q
    assert q["mean_err_px"] <= 3.0, q
    assert q["precision"] >= 0.8, q


def test_e2e_detect_track_mpjpe(detector):
    """Raw rendered frames -> bottom-up detection -> association -> tracking:
    every person tracked, 3D MPJPE vs ground truth <= 3 cm."""
    import jax.numpy as jnp

    from examples.e2e_fullframe import scaled_cameras
    from multiview_motion_capture_tpu import pipeline
    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.detect import (
        frames_to_frame_batch,
        make_bottom_up_detector,
    )
    from multiview_motion_capture_tpu.data.detect_train import render_sequence
    from multiview_motion_capture_tpu.data.render import RenderConfig
    from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
    from multiview_motion_capture_tpu.eval import mpjpe_vs_ground_truth

    mcfg, params, _ = detector
    cfg = PipelineConfig(n_views=4, max_people=4, max_tracks=6,
                         max_frames=None)
    seq = synthetic_sequence(n_frames=8, n_people=2, n_views=4, cfg=cfg,
                             noise_px=0.0, drop_prob=0.0, seed=123,
                             min_person_distance=1.5)
    images = render_sequence(seq, RenderConfig(hw=(192, 256)),
                             world_scale=0.25, seed=9)
    cams_small = scaled_cameras(seq.cameras, 0.25)
    detect = make_bottom_up_detector(mcfg, max_people=cfg.max_people,
                                     center_min_score=0.2)
    batch = frames_to_frame_batch(detect, params, images, cfg)
    res = pipeline.run(batch, cams_small, cfg, use_ik=False)
    long = [t for t in res.tracklets if len(t) >= 6]
    assert len(long) == 2, [len(t) for t in res.tracklets]
    mpjpe = mpjpe_vs_ground_truth(long, seq.gt_3d)
    assert mpjpe <= 0.03, mpjpe


def test_style_heldout_detection_quality(detector):
    """Held-out render STYLES, not just seeds (VERDICT r3 next #5): the
    shipped checkpoint must hold its recall on render configurations
    outside the training distribution.  Gates set from
    scripts/detector_style_holdout.py (docs/PERF.md r4): every style
    >= 0.92 recall @ 12 px; the weakest (dark + noisy: heavy sensor noise
    spawns spurious center peaks) bottoms at 0.77 precision, all others
    >= 0.93."""
    import jax.numpy as jnp

    from multiview_motion_capture_tpu.data.detect_train import (
        evaluate_detections,
        generate_samples,
    )
    from multiview_motion_capture_tpu.data.render import RenderConfig

    mcfg, params, detect = detector
    styles = {
        "dark_noisy": RenderConfig(hw=(192, 256),
                                   brightness_range=(0.45, 0.65),
                                   noise_std=0.06),
        "cluttered": RenderConfig(hw=(192, 256), bg_blobs=12,
                                  distractor_segments=10),
        "heavy_palette_jitter": RenderConfig(hw=(192, 256),
                                             appearance_jitter=0.7),
    }
    for name, rcfg in styles.items():
        ss = generate_samples([3000, 3001], rcfg, n_frames=4, n_views=4,
                              n_people_range=(2, 4))
        kps_all, val_all = [], []
        for s in range(0, ss.images.shape[0], 16):
            kps, _, valid = detect(params, jnp.asarray(ss.images[s:s + 16]))
            kps_all.append(np.asarray(kps))
            val_all.append(np.asarray(valid))
        q = evaluate_detections(
            np.concatenate(kps_all), np.concatenate(val_all),
            np.nan_to_num(ss.kps_px[..., :2]), ss.present, match_px=12.0)
        assert q["recall"] >= 0.9, (name, q)
        assert q["precision"] >= 0.7, (name, q)
        assert q["mean_err_px"] <= 3.0, (name, q)
