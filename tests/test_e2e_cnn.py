"""Config-5 end-to-end: CNN detections (no OpenPose) through the tracker."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_cnn_to_tracklets_end_to_end():
    from examples.e2e_synthetic import main

    # cache=True: train-once disk fixture (utils/testcache) — retrains only
    # when pose_net.py / the example change (VERDICT r4 next #9 suite time)
    det_err_px, n_long, mpjpe = main(steps=150, n_frames=8, n_people=2,
                                     n_views=4, seed=0, cache=True)
    assert det_err_px < 12.0, det_err_px
    assert n_long == 2
    assert mpjpe < 0.08, mpjpe
