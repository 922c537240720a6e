"""Direct parity tests against the *actual* reference code.

Unlike tests/oracle_pipeline.py (a from-scratch re-implementation of the
reference semantics), these tests import the reference modules themselves
from /root/reference/src and compare the repo's TPU kernels against them on
the same inputs — including real Shelf data.  Two shims are needed
(VERDICT.md round-1, "Next round" #2):

- `pulp` is stubbed (mv_association.py:12 imports it but `match_als` never
  touches it), and
- `matplotlib.use` is patched around the import of inverse_kinematics.py,
  whose module level pins the Qt5Agg backend (inverse_kinematics.py:19).

Covered:  get_fundamental_matrix, calc_epipolar_error, geometry_affinity's
distance matrix, triangulate_point_groups_from_multiple_views_linear,
match_als groupings on real Shelf affinities, foward_kinematics, and one
full PoseSolver.solve() vs solve_two_stage on a real Shelf frame.
"""
from __future__ import annotations

import json
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from multiview_motion_capture_tpu import PipelineConfig, pipeline
from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.data import load_openpose_dir
from multiview_motion_capture_tpu.ops import association as assoc_ops
from multiview_motion_capture_tpu.ops import fk as fk_ops
from multiview_motion_capture_tpu.ops import geometry as geo_ops
from multiview_motion_capture_tpu.ops import ik as ik_ops
from multiview_motion_capture_tpu.ops.triangulate import triangulate_points

REF_SRC = Path("/root/reference/src")


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with the two shims."""
    if not REF_SRC.exists():
        pytest.skip("reference source not available")
    if str(REF_SRC) not in sys.path:
        sys.path.append(str(REF_SRC))
    if "pulp" not in sys.modules:
        stub = types.ModuleType("pulp")
        for name in ("LpMaximize", "LpProblem", "LpStatus", "lpSum", "LpVariable"):
            setattr(stub, name, object())
        sys.modules["pulp"] = stub
    import matplotlib

    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None
    try:
        import common as ref_common
        import inverse_kinematics as ref_ik
        import mv_association as ref_assoc
        import mv_math_util as ref_math
        import pose_def as ref_pose_def
    finally:
        matplotlib.use = orig_use
    return SimpleNamespace(
        common=ref_common, ik=ref_ik, assoc=ref_assoc, math=ref_math,
        pose_def=ref_pose_def,
    )


@pytest.fixture(scope="module")
def shelf(ref, shelf_data_dir):
    """Real Shelf data, loaded once: repo batch/cams + reference Calib list."""
    cfg = PipelineConfig(max_frames=301)
    batch = load_openpose_dir(shelf_data_dir / "kps_opn", cfg)
    cams = CameraBank.from_json_dir(shelf_data_dir / "calibs")
    K64, Rt64, P64, calibs = [], [], [], []
    for p in sorted((shelf_data_dir / "calibs").glob("*.json"), key=lambda q: q.stem):
        d = json.loads(p.read_text())
        K = np.asarray(d["K"], dtype=np.float64).reshape(3, 3)
        Rt = np.asarray(d["RT"], dtype=np.float64).reshape(3, 4)
        P = K @ Rt
        K64.append(K)
        Rt64.append(Rt)
        P64.append(P)
        calibs.append(
            ref.common.Calib(
                K=K, Rt=Rt, P=P,
                Kr_inv=Rt[:, :3].T @ np.linalg.inv(K),
                img_wh_size=tuple(d["imgSize"]),
            )
        )
    return SimpleNamespace(
        batch=batch, cams=cams, cfg=cfg,
        K64=np.stack(K64), Rt64=np.stack(Rt64), P64=np.stack(P64),
        calibs=calibs,
    )


def _frame_points_and_groups(shelf, f: int):
    """Concatenate the frame's valid COCO keypoints the way the reference's
    match_spatial does (ref:src/motion_capture.py:597-614): per-view blocks,
    cumulative dimGroup offsets."""
    pts, sizes = [], []
    for v in range(shelf.batch.n_views):
        n = int(shelf.batch.valid[f, v].sum())
        pts.append(np.asarray(shelf.batch.kps[f, v, :n], dtype=np.float64))
        sizes.append(n)
    dim_group = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
    return np.concatenate(pts, axis=0), tuple(sizes), dim_group


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def test_fundamental_matrix_direct(ref, shelf):
    """fundamental_from_projections == get_fundamental_matrix (up to scale;
    ref:src/mv_math_util.py:57-77)."""
    for a, b in [(0, 1), (1, 3), (4, 2)]:
        F_ref = ref.math.get_fundamental_matrix(shelf.P64[a], shelf.P64[b])
        F_repo = np.asarray(
            geo_ops.fundamental_from_projections(
                jnp.asarray(shelf.P64[a]), jnp.asarray(shelf.P64[b])
            )
        )
        F_ref /= np.linalg.norm(F_ref)
        F_repo = F_repo / np.linalg.norm(F_repo)
        if np.sign(F_ref.flat[np.argmax(np.abs(F_ref))]) != np.sign(
            F_repo.flat[np.argmax(np.abs(F_ref))]
        ):
            F_repo = -F_repo
        np.testing.assert_allclose(F_repo, F_ref, atol=2e-5)


def test_epipolar_error_direct(ref, shelf):
    """masked_symmetric_epipolar_error == calc_epipolar_error
    (ref:src/mv_math_util.py:80-115), including the no-valid-pair NaN case."""
    rng = np.random.RandomState(3)
    a, b = 0, 2
    F_ab = np.asarray(
        geo_ops.fundamental_from_projections(
            jnp.asarray(shelf.P64[a]), jnp.asarray(shelf.P64[b])
        ),
        dtype=np.float64,
    )
    for trial in range(4):
        k1 = rng.uniform(0, 1000, size=(17, 2))
        k2 = rng.uniform(0, 1000, size=(17, 2))
        if trial == 3:  # all pairs below the score gate -> NaN
            s1 = np.full(17, 0.01)
            s2 = np.full(17, 0.01)
        else:
            s1 = rng.uniform(0, 1, size=17)
            s2 = rng.uniform(0, 1, size=17)
        e_ref = ref.math.calc_epipolar_error(
            shelf.calibs[a], k1.astype(np.float32), s1,
            shelf.calibs[b], k2.astype(np.float32), s2,
        )
        kps_a = np.concatenate([k1, s1[:, None]], axis=1)
        kps_b = np.concatenate([k2, s2[:, None]], axis=1)
        e_repo = float(
            geo_ops.masked_symmetric_epipolar_error(
                jnp.asarray(kps_a, dtype=jnp.float32),
                jnp.asarray(kps_b, dtype=jnp.float32),
                jnp.asarray(F_ab, dtype=jnp.float32),
                0.05,
            )
        )
        if np.isnan(e_ref):
            assert np.isnan(e_repo)
        else:
            assert abs(e_repo - float(e_ref)) < 5e-3 * max(1.0, abs(e_ref))


def test_spatial_distance_direct(ref, shelf):
    """projected_distance_all_pairs reproduces geometry_affinity's distance
    matrix (ref:src/mv_math_util.py:288-351) on a real Shelf frame."""
    f = 10
    points_set, sizes, dim_group = _frame_points_and_groups(shelf, f)
    Fs_ref = ref.math.calc_pairwise_f_mats(shelf.calibs)
    dst_ref, _ = ref.math.geometry_affinity(
        points_set[:, :, :2].copy(), Fs_ref, dim_group
    )

    # repo: padded (V, P, V, P) tensor on the same fundamental mats
    V, Pmax = shelf.batch.kps.shape[1], shelf.batch.kps.shape[2]
    d_repo = np.asarray(
        geo_ops.projected_distance_all_pairs(
            jnp.asarray(shelf.batch.kps[f]), jnp.asarray(Fs_ref, dtype=jnp.float32)
        )
    )
    # gather the valid entries into the reference's concatenated layout
    idx = [(v, p) for v in range(V) for p in range(sizes[v])]
    got = np.array([[d_repo[va, pa, vb, pb] for (vb, pb) in idx] for (va, pa) in idx])
    want = dst_ref.astype(np.float64).copy()
    # only cross-view blocks are defined by the distance kernel; the 50-fill
    # and zero diagonal are assembly-level constants
    for i, (va, _) in enumerate(idx):
        for j, (vb, _) in enumerate(idx):
            if va == vb:
                continue
            assert abs(got[i, j] - want[i, j]) < 5e-3, (i, j, got[i, j], want[i, j])


def test_triangulation_direct(ref, shelf):
    """triangulate_points == triangulate_point_groups_from_multiple_views_linear
    (ref:src/mv_math_util.py:152-212), linear part and score outputs."""
    rng = np.random.RandomState(7)
    pts3d = rng.uniform(-1, 1, size=(17, 3)) + np.array([0.0, 0.0, 1.0])
    V = 5
    obs = []
    for v in range(V):
        homo = np.concatenate([pts3d, np.ones((17, 1))], axis=1) @ shelf.P64[v].T
        uv = homo[:, :2] / homo[:, 2:3] + rng.normal(0, 1.0, size=(17, 2))
        score = rng.uniform(0.2, 1.0, size=(17, 1))
        obs.append(np.concatenate([uv, score], axis=1))
    # push a couple of keypoints below min_score to exercise the gating and
    # the <2-views fallback
    obs[0][3, 2] = 0.001
    obs[1][3, 2] = 0.001
    obs[2][3, 2] = 0.001
    obs[3][3, 2] = 0.001
    obs[4][3, 2] = 0.001  # kp 3: no view qualifies -> all-views fallback
    obs[0][7, 2] = 0.001
    obs[1][7, 2] = 0.001  # kp 7: 3 views qualify

    ref_out = ref.math.triangulate_point_groups_from_multiple_views_linear(
        [shelf.P64[v] for v in range(V)], obs, 0.01, post_optimize=False
    )
    K_inv = np.linalg.inv(shelf.K64)
    repo_out = np.asarray(
        triangulate_points(
            jnp.asarray(shelf.P64, dtype=jnp.float32),
            jnp.asarray(K_inv, dtype=jnp.float32),
            jnp.asarray(np.stack(obs), dtype=jnp.float32),
            jnp.ones(V, dtype=bool),
            0.01,
            refine_iters=0,
        )
    )
    np.testing.assert_allclose(repo_out[:, :3], ref_out[:, :3], atol=2e-3)
    np.testing.assert_allclose(repo_out[:, 3], ref_out[:, 3], atol=1e-5)

    # with the reference's scipy polish vs the repo's 2 GN steps (different
    # optimizers, same objective) both must stay close to the true points
    ref_opt = ref.math.triangulate_point_groups_from_multiple_views_linear(
        [shelf.P64[v] for v in range(V)], obs, 0.01, post_optimize=True
    )
    repo_opt = np.asarray(
        triangulate_points(
            jnp.asarray(shelf.P64, dtype=jnp.float32),
            jnp.asarray(K_inv, dtype=jnp.float32),
            jnp.asarray(np.stack(obs), dtype=jnp.float32),
            jnp.ones(V, dtype=bool),
            0.01,
            refine_iters=2,
        )
    )
    assert np.abs(repo_opt[:, :3] - ref_opt[:, :3]).max() < 5e-3


# ---------------------------------------------------------------------------
# association
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("frame", [0, 60, 131, 200, 280])
def test_match_als_direct(ref, shelf, frame):
    """repo match_als binarized output == reference match_als's X_bin
    (ref:src/mv_association.py:222-318) on real Shelf affinity matrices.

    x_bin equality is the strongest possible comparison: everything
    downstream (grouping) is a deterministic function of it.  Note the
    reference's `transform_closure` (:99-121) is NOT a transitive closure —
    the k-loop rereads `x_bin`, so only k = N-1 survives — and its
    vis-marking can emit overlapping groups (observed on Shelf frame 131:
    element 5 in two groups); the repo's true closure + one-pose-per-view
    parse resolves the same x_bin deterministically instead."""
    points_set, sizes, dim_group = _frame_points_and_groups(shelf, frame)
    Fs_ref = ref.math.calc_pairwise_f_mats(shelf.calibs)
    _, W = ref.math.geometry_affinity(points_set[:, :, :2].copy(), Fs_ref, dim_group)

    _, xbin_ref = ref.assoc.match_als(W.copy(), dim_group)

    n = W.shape[0]
    rank = min(n, int(max(sizes)) * 2)
    res = assoc_ops.match_als(
        jnp.asarray(W, dtype=jnp.float32),
        jnp.asarray(assoc_ops.block_diag_mask(sizes)),
        jnp.asarray(assoc_ops.default_init_factor(n, rank)),
    )
    np.testing.assert_array_equal(
        np.asarray(res.x_bin), np.asarray(xbin_ref, dtype=bool),
        err_msg=f"frame {frame}: binarized match matrices diverge",
    )


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------


def test_fk_direct(ref):
    """forward_kinematics == reference foward_kinematics
    (ref:src/inverse_kinematics.py:176-199) on random parameters."""
    ref_skel = ref.ik.load_skeleton()
    skel = fk_ops.Skeleton.default()
    rng = np.random.RandomState(11)
    for _ in range(5):
        root = rng.uniform(-2, 2, size=3)
        euler = rng.uniform(-0.8, 0.8, size=(18, 3))
        side = np.asarray(ref_skel.ref_side_bone_lens) * rng.uniform(0.7, 1.3, size=11)
        want, _ = ref.ik.foward_kinematics(
            ref_skel, ref.ik.PoseShapeParam(root, euler, side)
        )
        got = np.asarray(
            fk_ops.forward_kinematics(
                skel,
                jnp.asarray(root, dtype=jnp.float32),
                jnp.asarray(euler, dtype=jnp.float32),
                jnp.asarray(side, dtype=jnp.float32),
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_pose_solver_direct(ref, shelf):
    """Full cold PoseSolver.solve() (ref:src/inverse_kinematics.py:351-433)
    vs solve_two_stage on a real Shelf frame: similar joints AND similar
    reprojection quality."""
    # find a real matched group via the repo pipeline (triangulation mode)
    cfg = PipelineConfig(max_frames=2)
    res = pipeline.run(shelf.batch[:2], shelf.cams, cfg, use_ik=False)
    tlet = res.tracklets[0]
    matched = np.asarray(tlet.matched_pose[0])
    views = [v for v in range(len(matched)) if matched[v] >= 0]
    assert len(views) >= 2

    obs_list = [
        np.asarray(shelf.batch.kps[tlet.frame_idxs[0], v, matched[v]], dtype=np.float64)
        for v in views
    ]
    projs = [shelf.P64[v] for v in views]

    ref_skel = ref.ik.load_skeleton()
    param_ref, pose_ref = ref.ik.PoseSolver(
        ref_skel, None, [o.copy() for o in obs_list], projs,
        ref.pose_def.KpsFormat.COCO,
    ).solve()
    joints_ref = np.asarray(pose_ref.keypoints, dtype=np.float64)

    # repo: all V views, weight 0 for unmatched (same least-squares objective)
    V = shelf.batch.n_views
    obs_all = np.zeros((1, V, 17, 3), dtype=np.float32)
    w = np.zeros((1, V), dtype=np.float32)
    for v, o in zip(views, obs_list):
        obs_all[0, v] = o
        w[0, v] = 1.0

    skel = fk_ops.Skeleton.default()
    obs18 = ik_ops.add_mid_spine(jnp.asarray(obs_all[0]))
    tri = triangulate_points(
        shelf.cams.P, jnp.asarray(np.linalg.inv(shelf.K64), dtype=jnp.float32),
        obs18, jnp.asarray(w[0] > 0), 0.01, refine_iters=2,
    )
    from multiview_motion_capture_tpu.pose_def import KpsType, kps_index, KpsFormat

    coco_idx = kps_index(KpsFormat.COCO)
    lhip, rhip = coco_idx[KpsType.L_Hip], coco_idx[KpsType.R_Hip]
    root0 = 0.5 * (tri[lhip, :3] + tri[rhip, :3])
    init = ik_ops.IkParams(
        root=root0[None],
        euler=jnp.zeros((1, 18, 3), dtype=jnp.float32),
        side_lens=jnp.asarray(np.asarray(ref_skel.ref_side_bone_lens),
                              dtype=jnp.float32)[None],
    )
    _, joints_repo = ik_ops.solve_two_stage(
        init, skel, jnp.asarray(obs_all), jnp.asarray(w), shelf.cams.P,
        n_iters=50,
    )
    joints_repo = np.asarray(joints_repo[0], dtype=np.float64)

    mpjpe = np.linalg.norm(joints_repo - joints_ref, axis=-1).mean()
    assert mpjpe < 0.05, f"MPJPE vs reference solver: {mpjpe * 100:.2f} cm"

    # reprojection quality must match the reference solver's within 2 px
    def mean_reproj(joints):
        skel_idx, obs_idx = ref.pose_def.get_common_kps_idxs_1(
            ref.pose_def.get_kps_index(ref.pose_def.KpsFormat.BASIC_18),
            ref.pose_def.get_kps_index(ref.pose_def.KpsFormat.COCO),
        )
        errs = []
        for v, o in zip(views, obs_list):
            homo = np.concatenate(
                [joints[skel_idx], np.ones((len(skel_idx), 1))], axis=1
            ) @ shelf.P64[v].T
            uv = homo[:, :2] / homo[:, 2:3]
            m = o[obs_idx, 2] > 0.1
            if m.any():
                errs.append(np.linalg.norm(uv[m] - o[obs_idx][m, :2], axis=1))
        return float(np.concatenate(errs).mean())

    r_ref = mean_reproj(joints_ref)
    r_repo = mean_reproj(joints_repo)
    assert r_repo < r_ref + 2.0, f"repo {r_repo:.2f}px vs ref {r_ref:.2f}px"
