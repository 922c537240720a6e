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
    cfg = PipelineConfig(max_frames=N_FRAMES, max_people=6, max_tracks=8)
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
