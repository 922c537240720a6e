import numpy as np

from multiview_motion_capture_tpu import pose_def as pd


def test_format_sizes():
    assert pd.kps_count(pd.KpsFormat.COCO) == 17
    assert pd.kps_count(pd.KpsFormat.OPENPOSE_25) == 25
    assert pd.kps_count(pd.KpsFormat.BASIC_18) == 18
    assert pd.kps_count(pd.KpsFormat.COCO_SPINE) == 18


def test_openpose_to_coco_roundtrip_names():
    conv = pd.OPENPOSE25_TO_COCO
    op = pd.kps_order(pd.KpsFormat.OPENPOSE_25)
    coco = pd.kps_order(pd.KpsFormat.COCO)
    for dst_i, src_i in enumerate(conv):
        assert op[src_i] == coco[dst_i]


def test_openpose_to_coco_matches_reference_table():
    # The reference's conversion (ref:src/pose_def.py:262-270) maps joints by
    # name; spot-check the known BODY_25 layout.
    conv = pd.OPENPOSE25_TO_COCO
    # COCO row 0 = Nose = BODY_25 row 0; COCO 5 (L_Shoulder) = BODY_25 5;
    # COCO 12 (R_Hip) = BODY_25 9; COCO 16 (R_Ankle) = BODY_25 11.
    assert conv[0] == 0
    assert conv[5] == 5
    assert conv[12] == 9
    assert conv[16] == 11


def test_basic18_topological_parents():
    parents = pd.BASIC_18_PARENTS
    assert parents[0] == 0
    assert np.all(parents[1:] < np.arange(1, 18))
    # depth of wrist chain: mid_hip->spine->neck->shoulder->elbow->wrist
    order = pd.kps_order(pd.KpsFormat.BASIC_18)
    idx = {t: i for i, t in enumerate(order)}
    j = idx[pd.KpsType.L_Wrist]
    depth = 0
    while j != 0:
        j = int(parents[j])
        depth += 1
    assert depth == 5


def test_side_bone_maps():
    side_idx, side_to_full = pd.basic18_side_bone_maps()
    assert len(side_idx) == 11
    assert side_to_full.shape == (18,)
    # left/right mirror joints share a side entry
    order = pd.kps_order(pd.KpsFormat.BASIC_18)
    idx = {t: i for i, t in enumerate(order)}
    for l, r in [(pd.KpsType.L_Knee, pd.KpsType.R_Knee),
                 (pd.KpsType.L_Elbow, pd.KpsType.R_Elbow),
                 (pd.KpsType.L_Ear, pd.KpsType.R_Ear)]:
        assert side_to_full[idx[l]] == side_to_full[idx[r]]


def test_ik_common_mapping():
    # 16 joints shared between BASIC_18 and COCO+Spine: all but Mid_Hip, Neck
    assert len(pd.IK_SKEL_KPS_IDX) == 16
    order = pd.kps_order(pd.KpsFormat.BASIC_18)
    obs_order = pd.kps_order(pd.KpsFormat.COCO_SPINE)
    for s_i, o_i in zip(pd.IK_SKEL_KPS_IDX, pd.IK_OBS_KPS_IDX):
        assert order[s_i] == obs_order[o_i]
    missing = {order[i] for i in range(18)} - {order[i] for i in pd.IK_SKEL_KPS_IDX}
    assert missing == {pd.KpsType.Mid_Hip, pd.KpsType.Neck}
