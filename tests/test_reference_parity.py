"""End-to-end parity: the TPU-native tracker vs the scipy/numpy oracle
pipeline (tests/oracle_pipeline.py — a fresh loop-based implementation of
the reference semantics, per SURVEY.md §4's guidance that the shipped golden
pickle cannot be used for world-frame parity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.data.ingest import (
    filter_bad_poses,
    load_openpose_dir,
)
from multiview_motion_capture_tpu.tracker import (
    TrackerContext,
    assemble_tracklets,
    run_offline,
)
from tests.oracle_pipeline import run_oracle

N_FRAMES = 25


@pytest.fixture(scope="module")
def shelf(shelf_data_dir):
    # strict reference lifecycle: these tests compare against the oracle,
    # which implements the reference's raw max_age=0 semantics (the track
    # rescue deviation is tested separately in test_tracker)
    cfg = PipelineConfig(max_frames=N_FRAMES, max_people=6, max_tracks=8,
                         track_rescue_px=0.0, track_rescue_single_px=None)
    batch = load_openpose_dir(shelf_data_dir / "kps_opn", cfg, max_frames=N_FRAMES)
    batch = filter_bad_poses(batch, cfg)
    cams = CameraBank.from_json_dir(shelf_data_dir / "calibs")
    return cfg, batch, cams


def _match_and_mpjpe(ours, oracle, joint_sel=None):
    """Match tracklets by frame overlap; return per-pair MPJPE list."""
    errs = []
    for ot in oracle:
        omap = {f: i for i, f in enumerate(ot.frames)}
        best = None
        for t in ours:
            common = [(omap[f], i) for i, f in enumerate(t.frame_idxs) if f in omap]
            if len(common) < max(2, len(ot.frames) // 2):
                continue
            oi, ti = zip(*common)
            a = np.stack([ot.poses[i] for i in oi])
            b = t.poses_3d[list(ti)]
            if a.shape[1] != b.shape[1]:
                continue
            d = float(np.linalg.norm(a - b, axis=-1).mean())
            if best is None or d < best:
                best = d
        if best is not None and len(ot.frames) >= 5:
            errs.append(best)
    return errs


def test_triangulation_tracking_parity(shelf):
    cfg, batch, cams = shelf
    ctx = TrackerContext.build(cams, cfg, use_ik=False)
    _, out = run_offline(ctx, jnp.asarray(batch.kps[:N_FRAMES]),
                         jnp.asarray(batch.valid[:N_FRAMES]))
    ours = assemble_tracklets(jax.device_get(out))
    oracle = run_oracle(batch.kps, batch.valid, cams, N_FRAMES, use_ik=False)

    long_ours = [t for t in ours if len(t) >= 5]
    long_oracle = [t for t in oracle if len(t.frames) >= 5]
    assert len(long_ours) == len(long_oracle) == 2

    # coverage agreement on the long tracks
    for a, b in zip(sorted(long_ours, key=lambda t: -len(t)),
                    sorted(long_oracle, key=lambda t: -len(t.frames))):
        assert abs(len(a) - len(b.frames)) <= 2

    # oracle poses are (18, 4) COCO+spine for tri mode -> compare xyz
    errs = []
    for ot in long_oracle:
        ot.poses = [p[:, :3] if p.shape[1] == 4 else p for p in ot.poses]
    errs = _match_and_mpjpe(long_ours, long_oracle)
    assert errs, "no matched tracklet pairs"
    # triangulation is near-deterministic: ours (normalized f32 DLT) vs
    # oracle (pixel f64 SVD) should agree to a few mm
    assert max(errs) < 0.02, errs


def test_ik_tracking_parity(shelf):
    cfg, batch, cams = shelf
    ctx = TrackerContext.build(cams, cfg, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(batch.kps[:N_FRAMES]),
                         jnp.asarray(batch.valid[:N_FRAMES]))
    ours = assemble_tracklets(jax.device_get(out))
    oracle = run_oracle(batch.kps, batch.valid, cams, N_FRAMES, use_ik=True)

    long_ours = [t for t in ours if len(t) >= 5]
    long_oracle = [t for t in oracle if len(t.frames) >= 5]
    assert len(long_ours) == len(long_oracle) == 2

    errs = _match_and_mpjpe(long_ours, long_oracle)
    assert errs, "no matched tracklet pairs"
    # different optimizers (batched LM vs scipy TRF) on the same residuals:
    # 3D MPJPE parity within a few centimeters
    assert max(errs) < 0.05, errs


def test_frame_131_window(shelf_data_dir):
    """Regression for the reference's documented frame-131 failure
    (ref:README.md:55-56, debug hook ref:src/motion_capture.py:880-881: one
    subject lost at frame 131). The rebuild must hold all 3 Shelf subjects
    continuously through the window — both the TPU tracker and the oracle do
    (full study: docs/PARITY.md)."""
    lo, hi = 100, 151
    cfg = PipelineConfig(max_frames=hi)
    batch = load_openpose_dir(shelf_data_dir / "kps_opn", cfg, max_frames=hi)
    batch = filter_bad_poses(batch, cfg)
    kps = batch.kps[lo:hi]
    valid = batch.valid[lo:hi]
    cams = CameraBank.from_json_dir(shelf_data_dir / "calibs")

    ctx = TrackerContext.build(cams, cfg, use_ik=True)
    _, out = run_offline(ctx, jnp.asarray(kps), jnp.asarray(valid))
    ours = assemble_tracklets(jax.device_get(out), list(range(lo, hi)))

    active = np.zeros(hi, dtype=int)
    for t in ours:
        for f in t.frame_idxs:
            active[f] += 1
    # all 3 subjects held through the failure window (tracks may fragment,
    # but never drop a subject around 131)
    window = active[125:141]
    assert (window >= 3).all(), f"active tracks in 125..140: {window.tolist()}"
    # specifically: no subject lost AT frame 131
    assert active[131] >= 3 and active[130] >= 3 and active[132] >= 3
