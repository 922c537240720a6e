"""Association debug dump (the reference's xlsx/crop debug surface,
ref:src/motion_capture.py:885-921, as a first-class switch)."""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
from multiview_motion_capture_tpu.tracker import TrackerContext


def _scene(cfg, n_views, n_frames=10):
    return synthetic_sequence(n_frames=n_frames, n_people=2, n_views=n_views,
                              cfg=cfg, seed=3, drop_prob=0.15)


def test_dump_association_debug(tmp_path):
    from multiview_motion_capture_tpu.debug import dump_association_debug

    cfg = PipelineConfig(n_views=4, max_people=4, max_tracks=6,
                         als_max_iter=100)
    seq = _scene(cfg, 4)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    kps, valid = seq.batch.kps, seq.batch.valid
    out = tmp_path / "dbg"
    paths = dump_association_debug(ctx, kps, valid, out, frames=[0, 4])
    assert len(paths) == 2

    d = np.load(paths[1])
    N = cfg.n_matrix
    assert d["x_bin"].shape == (N, N)
    assert d["x"].shape == (N, N)
    assert np.all(np.isfinite(d["x"]))
    assert d["d23"].shape == (cfg.max_tracks, 4, cfg.max_people)
    # margins are |X - 0.5|
    assert np.allclose(d["margin"], np.abs(d["x"] - 0.5))
    # the sim csv has the labeled header grid
    csv = (out / "frame_00004_sim.csv").read_text().splitlines()
    assert csv[0].split(",")[1] == "trk0"
    assert len(csv) == N + 1

    summary = json.loads((out / "frame_00004_summary.json").read_text())
    assert summary["frame"] == 4
    assert summary["any_alive"] is True
    # frame 4: both people tracked -> two live track entries with matches
    leaders = [t for t in summary["tracks"] if t["is_group_leader"]]
    assert len(leaders) == 2
    for t in leaders:
        assert t["group_size"] >= 3  # track + >= 2 views
        assert t["nearest_det_px"] is not None and t["nearest_det_px"] < 20
        assert t["margin_to_05"] is not None


def test_dump_auto_selects_death_frames(tmp_path):
    from multiview_motion_capture_tpu.debug import dump_association_debug

    cfg = PipelineConfig(n_views=4, max_people=4, max_tracks=6,
                         als_max_iter=100, track_rescue_px=0.0)
    seq = _scene(cfg, 4, n_frames=12)
    kps, valid = seq.batch.kps.copy(), seq.batch.valid.copy()
    valid[8] = False  # everyone vanishes -> deaths at frame 8
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    out = tmp_path / "dbg"
    paths = dump_association_debug(ctx, kps, valid, out, frames=None)
    assert paths, "no death frames auto-selected"
    names = [p.name for p in paths]
    assert "frame_00008.npz" in names
    summary = json.loads((out / "frame_00008_summary.json").read_text())
    assert summary["died_track_ids"], summary


def test_dump_clustered_rig(tmp_path):
    from multiview_motion_capture_tpu.debug import dump_association_debug

    cfg = PipelineConfig(n_views=8, max_people=4, max_tracks=6,
                         als_max_iter=100, assoc_clusters=2)
    seq = _scene(cfg, 8)
    ctx = TrackerContext.build(seq.cameras, cfg, use_ik=True)
    out = tmp_path / "dbg"
    paths = dump_association_debug(ctx, seq.batch.kps, seq.batch.valid, out,
                                   frames=[3])
    d = np.load(paths[0])
    assert "cluster0_sim" in d and "cluster1_sim" in d
    nc = cfg.max_tracks + 4 * cfg.max_people
    assert d["cluster0_sim"].shape == (nc, nc)
    # interleaved clustering: cluster 0 owns views 0, 2, 4, 6
    assert list(d["cluster0_views"]) == [0, 2, 4, 6]
    assert (out / "frame_00003_sim_c1.csv").exists()
