import numpy as np
import jax.numpy as jnp

from multiview_motion_capture_tpu.cameras import synthetic_camera_ring
from multiview_motion_capture_tpu.ops import fk as FK
from multiview_motion_capture_tpu.ops import ik as IK


def _np_euler_to_quat_matrix(e):
    """Float64 oracle: R = Rx(ex) Ry(ey) Rz(ez) via explicit axis matrices."""

    def rx(a):
        return np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])

    return rx(e[0]) @ ry(e[1]) @ rz(e[2])


def _np_fk(root, euler, side_lens):
    """Reference-semantics FK oracle (ref:src/inverse_kinematics.py:176-199)."""
    parents = np.asarray(FK.Skeleton.default().parents)
    dirs = np.asarray(FK.REF_BONE_DIRS)
    full = np.asarray(side_lens)[np.asarray(FK.SIDE_TO_FULL)]
    offsets = dirs * full[:, None]
    n = len(parents)
    g = [np.eye(4) for _ in range(n)]
    for j in range(n):
        l = np.eye(4)
        l[:3, :3] = _np_euler_to_quat_matrix(euler[j])
        l[:3, 3] = root if j == 0 else offsets[j]
        if j == 0:
            g[j] = l
        else:
            g[j] = g[parents[j]] @ l
    return np.stack([t[:3, 3] for t in g])


def test_euler_to_matrix_against_oracle():
    rng = np.random.RandomState(0)
    e = rng.uniform(-np.pi, np.pi, size=(10, 3))
    R = np.asarray(FK.euler_to_matrix(jnp.asarray(e, dtype=jnp.float32)))
    for i in range(10):
        np.testing.assert_allclose(R[i], _np_euler_to_quat_matrix(e[i]), atol=1e-5)


def test_fk_rest_pose_matches_offsets():
    skel = FK.Skeleton.default()
    root = jnp.zeros(3)
    euler = jnp.zeros((18, 3))
    joints = np.asarray(FK.forward_kinematics(skel, root, euler, skel.side_bone_lens))
    oracle = _np_fk(np.zeros(3), np.zeros((18, 3)), np.asarray(FK.REF_SIDE_BONE_LENS))
    np.testing.assert_allclose(joints, oracle, atol=1e-6)
    # rest pose = cumulative sums of reference offsets
    parents = np.asarray(skel.parents)
    expect = np.zeros((18, 3))
    for j in range(1, 18):
        expect[j] = expect[parents[j]] + FK.REF_OFFSETS[j]
    np.testing.assert_allclose(joints, expect, atol=1e-6)


def test_fk_random_pose_matches_oracle():
    rng = np.random.RandomState(1)
    skel = FK.Skeleton.default()
    root = rng.uniform(-1, 1, 3)
    euler = rng.uniform(-0.7, 0.7, size=(18, 3))
    side = np.asarray(FK.REF_SIDE_BONE_LENS) * rng.uniform(0.8, 1.2, size=11)
    joints = np.asarray(
        FK.forward_kinematics(
            skel, jnp.asarray(root, dtype=jnp.float32),
            jnp.asarray(euler, dtype=jnp.float32), jnp.asarray(side, dtype=jnp.float32)
        )
    )
    np.testing.assert_allclose(joints, _np_fk(root, euler, side), atol=1e-4)


def test_fk_batched():
    skel = FK.Skeleton.default()
    rng = np.random.RandomState(2)
    roots = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)), dtype=jnp.float32)
    eulers = jnp.asarray(rng.uniform(-0.5, 0.5, size=(4, 18, 3)), dtype=jnp.float32)
    sides = jnp.broadcast_to(skel.side_bone_lens, (4, 11))
    out = FK.forward_kinematics(skel, roots, eulers, sides)
    assert out.shape == (4, 18, 3)
    single = FK.forward_kinematics(skel, roots[2], eulers[2], sides[2])
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(single), atol=1e-6)


def test_add_mid_spine():
    rng = np.random.RandomState(3)
    obs = rng.uniform(0, 1, size=(2, 17, 3)).astype(np.float32)
    out = np.asarray(IK.add_mid_spine(jnp.asarray(obs)))
    assert out.shape == (2, 18, 3)
    for b in range(2):
        mid_sh = 0.5 * (obs[b, 5, :2] + obs[b, 6, :2])
        mid_hip = 0.5 * (obs[b, 11, :2] + obs[b, 12, :2])
        np.testing.assert_allclose(out[b, 17, :2], 0.5 * (mid_sh + mid_hip), rtol=1e-5)
        np.testing.assert_allclose(
            out[b, 17, 2], obs[b, 5, 2] * obs[b, 6, 2] * obs[b, 11, 2] * obs[b, 12, 2],
            rtol=1e-5,
        )


def test_ik_recovers_projected_pose():
    """Full two-stage IK on synthetic observations: FK a ground-truth pose,
    project into 4 cameras, solve from a perturbed init, and check the
    reconstructed joints."""
    cams = synthetic_camera_ring(4)
    skel = FK.Skeleton.default()
    rng = np.random.RandomState(4)

    gt_root = np.array([0.2, -0.1, 0.95])
    gt_euler = np.zeros((18, 3))
    gt_euler[0] = [np.pi / 2, 0.0, 0.0]  # stand the skeleton up-ish in world
    gt_euler[9] = [0.4, 0.2, -0.3]
    gt_euler[12] = [-0.3, 0.1, 0.2]
    gt_side = np.asarray(FK.REF_SIDE_BONE_LENS)

    gt_joints = np.asarray(
        FK.forward_kinematics(skel, jnp.asarray(gt_root, dtype=jnp.float32),
                              jnp.asarray(gt_euler, dtype=jnp.float32),
                              jnp.asarray(gt_side, dtype=jnp.float32))
    )

    # observations: project the 16 observable joints into COCO+spine layout
    P = np.asarray(cams.P, dtype=np.float64)
    V = 4
    obs = np.zeros((V, 17, 3), dtype=np.float32)
    skel_sel = np.asarray(IK._SKEL_SEL)
    obs_sel = np.asarray(IK._OBS_SEL)
    for v in range(V):
        homo = np.concatenate([gt_joints, np.ones((18, 1))], axis=1)
        uvw = homo @ P[v].T
        uv = uvw[:, :2] / uvw[:, 2:3]
        for s_i, o_i in zip(skel_sel, obs_sel):
            if o_i < 17:  # spine row is synthesized by the solver
                obs[v, o_i, :2] = uv[s_i]
                obs[v, o_i, 2] = 1.0
    # eyes (COCO rows 1, 2) unobserved by the skeleton: zero score
    init = IK.IkParams(
        root=jnp.asarray(gt_root + rng.normal(0, 0.1, 3), dtype=jnp.float32)[None],
        euler=jnp.asarray(gt_euler + rng.normal(0, 0.1, (18, 3)), dtype=jnp.float32)[None],
        side_lens=jnp.asarray(gt_side, dtype=jnp.float32)[None],
    )
    params, joints = IK.solve_two_stage(
        init, skel, jnp.asarray(obs)[None], jnp.ones((1, V)), cams.P, n_iters=50
    )
    joints = np.asarray(joints[0])
    err = np.linalg.norm(joints[skel_sel] - gt_joints[skel_sel], axis=-1)
    assert err.max() < 0.02  # < 2 cm on observable joints


def test_ik_view_mask_ignores_bad_camera():
    cams = synthetic_camera_ring(4)
    skel = FK.Skeleton.default()
    gt_root = np.array([0.0, 0.0, 0.95])
    gt_euler = np.zeros((18, 3))
    gt_euler[0] = [np.pi / 2, 0.0, 0.0]
    gt_side = np.asarray(FK.REF_SIDE_BONE_LENS)
    gt_joints = np.asarray(
        FK.forward_kinematics(skel, jnp.asarray(gt_root, dtype=jnp.float32),
                              jnp.asarray(gt_euler, dtype=jnp.float32),
                              jnp.asarray(gt_side, dtype=jnp.float32))
    )
    P = np.asarray(cams.P, dtype=np.float64)
    obs = np.zeros((4, 17, 3), dtype=np.float32)
    for v in range(4):
        homo = np.concatenate([gt_joints, np.ones((18, 1))], axis=1)
        uvw = homo @ P[v].T
        uv = uvw[:, :2] / uvw[:, 2:3]
        for s_i, o_i in zip(np.asarray(IK._SKEL_SEL), np.asarray(IK._OBS_SEL)):
            if o_i < 17:
                obs[v, o_i, :2] = uv[s_i]
                obs[v, o_i, 2] = 1.0
    obs[3, :, :2] += 300.0  # corrupt view 3, then mask it out
    view_w = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    init = IK.IkParams(
        root=jnp.asarray(gt_root + 0.05, dtype=jnp.float32)[None],
        euler=jnp.asarray(gt_euler, dtype=jnp.float32)[None],
        side_lens=jnp.asarray(gt_side, dtype=jnp.float32)[None],
    )
    _, joints = IK.solve_two_stage(init, skel, jnp.asarray(obs)[None], view_w, cams.P, n_iters=20)
    err = np.linalg.norm(np.asarray(joints[0])[np.asarray(IK._SKEL_SEL)]
                         - gt_joints[np.asarray(IK._SKEL_SEL)], axis=-1)
    assert err.max() < 0.02


def test_analytic_jacobian_matches_jacfwd():
    """The closed-form FK/projection jacobian must equal forward-mode AD."""
    import jax
    from multiview_motion_capture_tpu.ops.ik import (
        _residual, _residual_and_jacobian, IkParams,
    )
    from multiview_motion_capture_tpu.ops.fk import Skeleton, REF_SIDE_BONE_LENS

    cams = synthetic_camera_ring(4)
    skel = Skeleton.default()
    rng = np.random.RandomState(7)
    x = np.concatenate([
        rng.uniform(-1, 1, 3),
        rng.uniform(-0.6, 0.6, 54),
        np.asarray(REF_SIDE_BONE_LENS) * rng.uniform(0.9, 1.1, 11),
    ]).astype(np.float32)
    obs = rng.uniform(0, 1, (4, 18, 3)).astype(np.float32)
    obs[..., :2] *= 400
    vw = jnp.asarray([1.0, 1.0, 0.0, 1.0])

    x = jnp.asarray(x)
    r_ref = _residual(x, skel, jnp.asarray(obs), vw, cams.P, 1e-5)
    J_ref = jax.jacfwd(lambda xx: _residual(xx, skel, jnp.asarray(obs), vw, cams.P, 1e-5))(x)
    r, J = _residual_and_jacobian(x, skel, jnp.asarray(obs), vw, cams.P, 1e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-3)
    scale = np.abs(np.asarray(J_ref)).max()
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                               atol=2e-3 * scale)


def test_gj_solver_matches_cholesky_path():
    """solve_two_stage(solver='gj') == solver='chol' on the same problem."""
    cams = synthetic_camera_ring(4)
    skel = FK.Skeleton.default()
    rng = np.random.RandomState(5)
    T, V = 4, 4
    gt_root = np.array([0.0, 0.0, 0.95])
    gt_euler = np.zeros((18, 3)); gt_euler[0] = [np.pi / 2, 0, 0]
    gt_side = np.asarray(FK.REF_SIDE_BONE_LENS)
    gt_joints = np.asarray(FK.forward_kinematics(
        skel, jnp.asarray(gt_root, dtype=jnp.float32),
        jnp.asarray(gt_euler, dtype=jnp.float32),
        jnp.asarray(gt_side, dtype=jnp.float32)))
    P = np.asarray(cams.P, dtype=np.float64)
    obs = np.zeros((T, V, 17, 3), dtype=np.float32)
    for v in range(V):
        homo = np.concatenate([gt_joints, np.ones((18, 1))], 1)
        uv = (homo @ P[v].T); uv = uv[:, :2] / uv[:, 2:3]
        for s_i, o_i in zip(np.asarray(IK._SKEL_SEL), np.asarray(IK._OBS_SEL)):
            if o_i < 17:
                obs[:, v, o_i, :2] = uv[s_i]
                obs[:, v, o_i, 2] = 1.0
    init = IK.IkParams(
        root=jnp.asarray(np.tile(gt_root + 0.08, (T, 1)), dtype=jnp.float32),
        euler=jnp.asarray(np.tile(gt_euler[None], (T, 1, 1)) +
                          rng.normal(0, 0.05, (T, 18, 3)), dtype=jnp.float32),
        side_lens=jnp.asarray(np.tile(gt_side, (T, 1)), dtype=jnp.float32),
    )
    vw = jnp.ones((T, V))
    _, j_chol = IK.solve_two_stage(init, skel, jnp.asarray(obs), vw, cams.P,
                                   n_iters=15, solver="chol")
    _, j_gj = IK.solve_two_stage(init, skel, jnp.asarray(obs), vw, cams.P,
                                 n_iters=15, solver="gj", interpret=True)
    sel = np.asarray(IK._SKEL_SEL)
    for t in range(T):
        err_c = np.linalg.norm(np.asarray(j_chol[t])[sel] - gt_joints[sel], axis=-1).max()
        err_g = np.linalg.norm(np.asarray(j_gj[t])[sel] - gt_joints[sel], axis=-1).max()
        assert err_c < 0.02 and err_g < 0.02, (t, err_c, err_g)


def test_per_track_projection_matrices_match_shared():
    """solve_two_stage with P broadcast to (T, V, 3, 4) must equal the
    shared-(V, 3, 4) solve bit-for-bit on both solver paths (the per-track-P
    plumbing behind cfg.ik_max_views)."""
    cams = synthetic_camera_ring(4)
    skel = FK.Skeleton.default()
    rng = np.random.RandomState(11)
    T, V = 3, 4
    gt_root = np.array([0.0, 0.0, 0.95])
    gt_euler = np.zeros((18, 3)); gt_euler[0] = [np.pi / 2, 0, 0]
    gt_side = np.asarray(FK.REF_SIDE_BONE_LENS)
    gt_joints = np.asarray(FK.forward_kinematics(
        skel, jnp.asarray(gt_root, dtype=jnp.float32),
        jnp.asarray(gt_euler, dtype=jnp.float32),
        jnp.asarray(gt_side, dtype=jnp.float32)))
    P = np.asarray(cams.P, dtype=np.float64)
    obs = np.zeros((T, V, 17, 3), dtype=np.float32)
    for v in range(V):
        homo = np.concatenate([gt_joints, np.ones((18, 1))], 1)
        uv = homo @ P[v].T; uv = uv[:, :2] / uv[:, 2:3]
        for s_i, o_i in zip(np.asarray(IK._SKEL_SEL), np.asarray(IK._OBS_SEL)):
            if o_i < 17:
                obs[:, v, o_i, :2] = uv[s_i]
                obs[:, v, o_i, 2] = 1.0
    init = IK.IkParams(
        root=jnp.asarray(np.tile(gt_root + 0.06, (T, 1)), dtype=jnp.float32),
        euler=jnp.asarray(np.tile(gt_euler[None], (T, 1, 1)) +
                          rng.normal(0, 0.05, (T, 18, 3)), dtype=jnp.float32),
        side_lens=jnp.asarray(np.tile(gt_side, (T, 1)), dtype=jnp.float32),
    )
    vw = jnp.ones((T, V))
    P_shared = cams.P
    P_per = jnp.broadcast_to(cams.P[None], (T,) + cams.P.shape)
    for solver in ("chol", "gj"):
        _, j_a = IK.solve_two_stage(init, skel, jnp.asarray(obs), vw, P_shared,
                                    n_iters=10, solver=solver, interpret=True)
        _, j_b = IK.solve_two_stage(init, skel, jnp.asarray(obs), vw, P_per,
                                    n_iters=10, solver=solver, interpret=True)
        np.testing.assert_array_equal(np.asarray(j_a), np.asarray(j_b))


def test_gj_fused_solver_matches_gj():
    """solver='gj_fused' (one-program JtJ/g assembly + GJ, J read once)
    must reproduce solver='gj' — the fused kernel computes the identical
    normal equations in-kernel (bit-exact in interpret mode at the linear-
    solve level; whole-solve outputs agree to fp tolerance)."""
    cams = synthetic_camera_ring(4)
    skel = FK.Skeleton.default()
    rng = np.random.RandomState(6)
    T, V = 4, 4
    gt_root = np.array([0.0, 0.0, 0.95])
    gt_euler = np.zeros((18, 3)); gt_euler[0] = [np.pi / 2, 0, 0]
    gt_side = np.asarray(FK.REF_SIDE_BONE_LENS)
    gt_joints = np.asarray(FK.forward_kinematics(
        skel, jnp.asarray(gt_root, dtype=jnp.float32),
        jnp.asarray(gt_euler, dtype=jnp.float32),
        jnp.asarray(gt_side, dtype=jnp.float32)))
    P = np.asarray(cams.P, dtype=np.float64)
    obs = np.zeros((T, V, 17, 3), dtype=np.float32)
    for v in range(V):
        homo = np.concatenate([gt_joints, np.ones((18, 1))], 1)
        uv = (homo @ P[v].T); uv = uv[:, :2] / uv[:, 2:3]
        for s_i, o_i in zip(np.asarray(IK._SKEL_SEL), np.asarray(IK._OBS_SEL)):
            if o_i < 17:
                obs[:, v, o_i, :2] = uv[s_i]
                obs[:, v, o_i, 2] = 1.0
    init = IK.IkParams(
        root=jnp.asarray(np.tile(gt_root + 0.08, (T, 1)), dtype=jnp.float32),
        euler=jnp.asarray(np.tile(gt_euler[None], (T, 1, 1)) +
                          rng.normal(0, 0.05, (T, 18, 3)), dtype=jnp.float32),
        side_lens=jnp.asarray(np.tile(gt_side, (T, 1)), dtype=jnp.float32),
    )
    vw = jnp.ones((T, V))
    p_gj, j_gj = IK.solve_two_stage(init, skel, jnp.asarray(obs), vw, cams.P,
                                    n_iters=15, solver="gj", interpret=True)
    p_f, j_f = IK.solve_two_stage(init, skel, jnp.asarray(obs), vw, cams.P,
                                  n_iters=15, solver="gj_fused",
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(j_f), np.asarray(j_gj), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_f.side_lens),
                               np.asarray(p_gj.side_lens), atol=1e-4)
    sel = np.asarray(IK._SKEL_SEL)
    for t in range(T):
        err = np.linalg.norm(np.asarray(j_f[t])[sel] - gt_joints[sel],
                             axis=-1).max()
        assert err < 0.02, (t, err)
