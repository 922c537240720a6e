"""Crowd-density preset safety (VERDICT r3 next #6): a dense run under the
DEFAULT config (rescue on) must visibly warn and recommend crowded()."""
import sys
import warnings
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multiview_motion_capture_tpu import pipeline
from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence


def _run(cfg, n_people, n_frames=20):
    seq = synthetic_sequence(n_frames=n_frames, n_people=n_people,
                             n_views=cfg.n_views, cfg=cfg, seed=0,
                             drop_prob=0.0)
    return pipeline.run(seq.batch, seq.cameras, cfg, use_ik=False)


_BASE = dict(n_views=5, max_people=10, max_tracks=16, als_max_iter=100,
             max_frames=None)


def test_dense_default_config_warns():
    cfg = PipelineConfig(**_BASE)
    with pytest.warns(UserWarning, match="crowded"):
        res = _run(cfg, n_people=8)
    assert res.mean_concurrent_tracks >= cfg.density_warn_tracks


def test_sparse_default_config_is_silent():
    cfg = PipelineConfig(**_BASE)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        res = _run(cfg, n_people=3)
    assert 0 < res.mean_concurrent_tracks < cfg.density_warn_tracks


def test_crowded_preset_is_silent_when_dense():
    cfg = PipelineConfig.crowded(**_BASE)
    assert cfg.track_rescue_px == 0.0
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        res = _run(cfg, n_people=8)
    assert res.mean_concurrent_tracks >= cfg.density_warn_tracks


def test_warning_can_be_disabled():
    cfg = PipelineConfig(**{**_BASE, "density_warn_tracks": 0.0})
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _run(cfg, n_people=8)
