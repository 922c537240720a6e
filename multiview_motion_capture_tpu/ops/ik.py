"""Batched Levenberg-Marquardt inverse kinematics on reprojection residuals.

Re-designs ref:src/inverse_kinematics.py:202-433:

- the two-stage solve (pose-only, then pose+bone-lengths;
  ref:inverse_kinematics.py:402-407) runs as fixed-iteration LM loops with
  `jax.jacfwd` jacobians instead of scipy TRF `least_squares`,
- one solver instance handles *all* tracklets at once via vmap — the
  reference solves people serially,
- unobserved cameras are masked with zero residual weight instead of
  building per-tracklet python lists,
- the synthetic mid-spine observation (ref:inverse_kinematics.py:339-348,
  370-378) is appended in closed form,
- the residual is the score-weighted per-coordinate reprojection difference
  (ref:inverse_kinematics.py:219-236) with the same 1e-5 projective divide
  guard.

Parameter packing: x = [root(3) | euler(18*3) | side_bone_lens(11)] = 68.
Stage 1 freezes the bone lengths by zeroing their update (the reference
simply excludes them from the parameter vector).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.utils.precision import high_precision

from multiview_motion_capture_tpu.ops.fk import (
    ANC_MASK,
    ANC_SELF_MASK,
    N_JOINTS,
    N_SIDE_BONES,
    SIDE_ONE_HOT,
    Skeleton,
    euler_axis_matrices,
    forward_kinematics,
    forward_kinematics_full,
    mm3,
    mv3,
)
from multiview_motion_capture_tpu.pose_def import BASIC_18_PARENTS
from multiview_motion_capture_tpu.pose_def import (
    IK_OBS_KPS_IDX,
    IK_SKEL_KPS_IDX,
    kps_index,
    KpsFormat,
    KpsType,
)

Array = jnp.ndarray

N_PARAMS = 3 + N_JOINTS * 3 + N_SIDE_BONES  # 68

_COCO_IDX = kps_index(KpsFormat.COCO)
_LSH, _RSH = _COCO_IDX[KpsType.L_Shoulder], _COCO_IDX[KpsType.R_Shoulder]
_LHIP, _RHIP = _COCO_IDX[KpsType.L_Hip], _COCO_IDX[KpsType.R_Hip]

_SKEL_SEL = jnp.asarray(IK_SKEL_KPS_IDX)  # (16,) joints observable in COCO+spine
_OBS_SEL = jnp.asarray(IK_OBS_KPS_IDX)    # (16,) rows in the COCO+spine observation


class IkParams(NamedTuple):
    root: Array       # (..., 3)
    euler: Array      # (..., 18, 3)
    side_lens: Array  # (..., 11)

    def pack(self) -> Array:
        return jnp.concatenate(
            [self.root, self.euler.reshape(self.euler.shape[:-2] + (N_JOINTS * 3,)),
             self.side_lens],
            axis=-1,
        )

    @classmethod
    def unpack(cls, x: Array) -> "IkParams":
        root = x[..., :3]
        euler = x[..., 3:3 + N_JOINTS * 3].reshape(x.shape[:-1] + (N_JOINTS, 3))
        side = x[..., 3 + N_JOINTS * 3:]
        return cls(root=root, euler=euler, side_lens=side)


def add_mid_spine(obs: Array) -> Array:
    """Append the synthetic mid-spine keypoint to COCO-17 observations
    (ref:src/inverse_kinematics.py:339-348): position = midpoint of shoulder
    and hip centers, score = product of the four contributing scores.

    obs: (..., 17, 3) -> (..., 18, 3)."""
    mid_sh = 0.5 * (obs[..., _LSH, :2] + obs[..., _RSH, :2])
    mid_hip = 0.5 * (obs[..., _LHIP, :2] + obs[..., _RHIP, :2])
    spine_xy = 0.5 * (mid_sh + mid_hip)
    score = (
        obs[..., _LSH, 2] * obs[..., _RSH, 2] * obs[..., _LHIP, 2] * obs[..., _RHIP, 2]
    )
    spine = jnp.concatenate([spine_xy, score[..., None]], axis=-1)
    return jnp.concatenate([obs, spine[..., None, :]], axis=-2)


def geometric_init(tri18: Array, skel: Skeleton, min_score: float = 0.05) -> Array:
    """Closed-form joint-angle initialization from a triangulated pose.

    The reference cold-starts its 50-iteration solve from *zero* angles
    (ref:src/inverse_kinematics.py:389-397); starting instead from rotations
    that already align each rest bone direction with the triangulated bone
    drops the LM iteration count several-fold while converging to the same
    least-squares optimum (quality-gated in bench/parity runs).

    tri18: (18, 4) triangulated COCO+spine points (x, y, z, score).
    Returns (18, 3) euler angles (the FK convention R = Rx @ Ry @ Rz).
    """
    from multiview_motion_capture_tpu.ops import quaternions as Q

    dtype = tri18.dtype
    # scatter observed points into skeleton-joint order
    pos = jnp.zeros((N_JOINTS, 3), dtype=dtype)
    pos = pos.at[_SKEL_SEL].set(tri18[_OBS_SEL, :3])
    sc = jnp.zeros((N_JOINTS,), dtype=dtype)
    sc = sc.at[_SKEL_SEL].set(tri18[_OBS_SEL, 3])
    pos = pos.at[0].set(0.5 * (pos[1] + pos[4]))          # Mid_Hip
    sc = sc.at[0].set(jnp.minimum(sc[1], sc[4]))
    pos = pos.at[8].set(0.5 * (pos[9] + pos[12]))         # Neck
    sc = sc.at[8].set(jnp.minimum(sc[9], sc[12]))

    def unit(v):
        return v / (jnp.linalg.norm(v) + 1e-9)

    def frame_quat(d_primary, rest_primary, d_secondary, rest_secondary, ok):
        """Rotation mapping rest_primary -> d_primary and (projected)
        rest_secondary -> d_secondary, as a quaternion; identity if not ok."""
        e1 = unit(d_primary)
        r1 = unit(rest_primary)
        e2 = unit(d_secondary - jnp.dot(d_secondary, e1) * e1)
        r2 = unit(rest_secondary - jnp.dot(rest_secondary, r1) * r1)
        # columns: R @ [r1 r2 r1xr2] = [e1 e2 e1xe2]
        Rsrc = jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=1)
        Rdst = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=1)
        R = Rdst @ Rsrc.T
        q = Q.normalize(Q.from_matrix(R))
        return jnp.where(ok, q, jnp.asarray([1.0, 0, 0, 0], dtype=dtype))

    parents = np.asarray(BASIC_18_PARENTS)
    rest = skel.bone_dirs  # (18, 3) unit rest directions (row 0 zero)

    # root: spine (rest +z) and left-hip (rest +x) directions
    ok_root = (sc[0] > min_score) & (sc[7] > min_score) & (sc[1] > min_score)
    g_q0 = frame_quat(pos[7] - pos[0], rest[7], pos[1] - pos[0], rest[1], ok_root)

    g_q = [None] * N_JOINTS
    g_q[0] = g_q0
    local_q = [None] * N_JOINTS
    local_q[0] = g_q0

    # one (first) observed child bone orients each internal joint; the LM
    # polish owns the remaining twist DOF
    child_of = {j: [] for j in range(N_JOINTS)}
    for c in range(1, N_JOINTS):
        child_of[int(parents[c])].append(c)

    ident = jnp.asarray([1.0, 0, 0, 0], dtype=dtype)
    for j in range(1, N_JOINTS):
        p = int(parents[j])
        kids = child_of[j]
        if not kids:
            local_q[j] = ident
            g_q[j] = g_q[p]
            continue
        c = kids[0]
        d_obs = pos[c] - pos[j]
        ok = (sc[j] > min_score) & (sc[c] > min_score) & (
            jnp.linalg.norm(d_obs) > 1e-6
        )
        d_rest_world = Q.qrot(g_q[p], rest[c])
        align = Q.between(d_rest_world, jnp.where(ok, unit(d_obs), d_rest_world))
        gq = Q.normalize(Q.qmul(align, g_q[p]))
        g_q[j] = jnp.where(ok, gq, g_q[p])
        local_q[j] = Q.normalize(Q.qmul(Q.conjugate(g_q[p]), g_q[j]))

    locals_q = jnp.stack(local_q)  # (18, 4)
    return Q.to_euler(locals_q).astype(dtype)


def _residual(
    x: Array, skel: Skeleton, obs: Array, view_w: Array, P: Array, eps: float
) -> Array:
    """Score-weighted reprojection residual.

    x: (68,); obs: (V, 18, 3) COCO+spine observations; view_w: (V,) weights
    (0 for unobserved cameras); P: (V, 3, 4).
    Returns (V*16*2,).
    """
    p = IkParams.unpack(x)
    joints = forward_kinematics(skel, p.root, p.euler, p.side_lens)  # (18, 3)
    sel = joints[_SKEL_SEL]  # (16, 3)
    homo = jnp.concatenate([sel, jnp.ones_like(sel[:, :1])], axis=-1)  # (16, 4)
    proj = jnp.einsum("vab,kb->vka", P, homo)  # (V, 16, 3)
    uv = proj[..., :2] / (eps + proj[..., 2:3])
    tgt = obs[:, _OBS_SEL, :]  # (V, 16, 3)
    diff = (uv - tgt[..., :2]) * tgt[..., 2:3] * view_w[:, None, None]
    return diff.reshape(-1)


def _residual_and_jacobian(
    x: Array, skel: Skeleton, obs: Array, view_w: Array, P: Array, eps: float
):
    """Residual AND its analytic jacobian in one pass.

    The FK jacobian has closed form (standard kinematic chain rule):
      d pos_k / d root      = I,
      d pos_k / d angle_ja  = [j proper ancestor of k] *
                              g_R[parent(j)] @ dR_j/da @ g_R[j]^T (pos_k - t_j),
      d pos_k / d side_s    = sum_b [b ancestor-or-self of k][side(b)=s] *
                              g_R[parent(b)] @ dir_b,
    followed by the pinhole projection jacobian.  A handful of einsums over
    (18, 18, 3) tensors replaces 68 forward-mode tangent passes — fewer,
    larger ops, which is exactly what the TPU wants.

    Returns (r (V*16*2,), J (V*16*2, 68)).
    """
    p = IkParams.unpack(x)
    joints, g_R, (Rx, Ry, Rz), offsets = forward_kinematics_full(
        skel, p.root, p.euler, p.side_lens
    )
    parents = np.asarray(BASIC_18_PARENTS)
    eye3 = jnp.eye(3, dtype=x.dtype)
    # parent frames (root's parent frame = identity)
    g_Rp = g_R[parents]
    g_Rp = g_Rp.at[0].set(eye3)

    # local-rotation derivative matrices per angle
    _, _, _, dRx, dRy, dRz = euler_axis_matrices(p.euler)
    dR = jnp.stack(
        [
            mm3(mm3(dRx, Ry), Rz),
            mm3(mm3(Rx, dRy), Rz),
            mm3(mm3(Rx, Ry), dRz),
        ],
        axis=1,
    )  # (18, 3angles, 3, 3)
    D = mm3(g_Rp[:, None], dR)  # (18, 3, 3, 3)

    # u[j, k] = g_R[j]^T (pos_k - t_j)
    diff = joints[None, :, :] - joints[:, None, :]  # t_j == joints[j]
    u = mv3(jnp.swapaxes(g_R, -1, -2)[:, None], diff)  # (18, 18, 3)

    anc = jnp.asarray(ANC_MASK, dtype=x.dtype)
    # d_angle[k, j, n, a] = sum_x D[j, n, a, x] u[j, k, x] * anc[j, k]
    d_angle = jnp.einsum("jnax,jkx,jk->kjna", D, u, anc)  # (k, j, angle, 3)
    d_angle = d_angle.reshape(N_JOINTS, N_JOINTS * 3, 3)  # (k, 54, xyz)

    C = mv3(g_Rp, skel.bone_dirs)  # (18, 3)
    d_side = jnp.einsum(
        "bk,bs,ba->ksa", jnp.asarray(ANC_SELF_MASK, dtype=x.dtype),
        jnp.asarray(SIDE_ONE_HOT, dtype=x.dtype), C,
    )  # (k, 11, xyz)

    d_root = jnp.broadcast_to(eye3[None], (N_JOINTS, 3, 3))  # (k, 3params, xyz)
    dX = jnp.concatenate([d_root, d_angle, d_side], axis=1)  # (18, 68, 3)
    dX_sel = dX[_SKEL_SEL]  # (16, 68, 3)

    # projection + residual
    sel = joints[_SKEL_SEL]
    homo = jnp.concatenate([sel, jnp.ones_like(sel[:, :1])], axis=-1)
    proj = jnp.einsum("vab,kb->vka", P, homo)  # (V, 16, 3)
    wq = eps + proj[..., 2:3]
    uv = proj[..., :2] / wq
    tgt = obs[:, _OBS_SEL, :]
    score = tgt[..., 2:3] * view_w[:, None, None]  # (V, 16, 1)
    r = ((uv - tgt[..., :2]) * score).reshape(-1)

    # duv/dX = (P[:2,:3] - uv x P[2,:3]) / w   (V, 16, 2, 3)
    duv = (P[:, None, :2, :3] - uv[..., None] * P[:, None, None, 2, :3]) / wq[..., None]
    J = jnp.einsum("vkix,kpx->vkip", duv, dX_sel) * score[..., None]
    return r, J.reshape(-1, N_PARAMS)


def _lm_solve(
    x0: Array,
    skel: Skeleton,
    obs: Array,
    view_w: Array,
    P: Array,
    free_mask: Array,
    n_iters: int,
    eps: float,
    lam0: float,
    lam_up: float,
    lam_down: float,
    ftol: float = 2e-6,
    xtol: float = 1e-6,
) -> Array:
    """Levenberg-Marquardt over the packed parameter vector, restricted to
    `free_mask` parameters (stage 1 freezes bone lengths).

    Runs as a `lax.while_loop` capped at `n_iters` (the reference's
    `max_nfev`) with a scipy-style early exit on relative cost decrease /
    step size — TRF typically stops well before its eval budget too.
    f32 roundoff puts a ~1e-7 floor on achievable relative cost decrease,
    so the default tolerances sit just above it; wide-rig configs can
    loosen them (cfg.ik_ftol/ik_xtol) to trade tail iterations for
    throughput."""

    def resid(x):
        return _residual(x, skel, obs, view_w, P, eps)

    n = x0.shape[0]
    eye = jnp.eye(n, dtype=x0.dtype)
    frozen_diag = jnp.diag(1.0 - free_mask)

    def cond(state):
        x, r, lam, it, done = state
        return jnp.logical_and(it < n_iters, jnp.logical_not(done))

    def body(state):
        x, r, lam, it, _ = state
        _, J = _residual_and_jacobian(x, skel, obs, view_w, P, eps)
        J = J * free_mask[None, :]
        JtJ = J.T @ J
        g = J.T @ r
        # frozen params get a unit diagonal so the damped system stays SPD.
        # Leaf-joint rotations never move an observed joint, so JtJ has
        # exactly-zero columns: a trace-proportional ridge keeps the f32
        # Cholesky finite even when lam has annealed to its floor.
        ridge = 1e-6 * (jnp.trace(JtJ) / n) + 1e-6
        A = JtJ + (lam + ridge) * eye + frozen_diag
        L = jax.lax.linalg.cholesky(A)
        y = jax.lax.linalg.triangular_solve(L, g[:, None], left_side=True, lower=True)
        dx = -jax.lax.linalg.triangular_solve(
            L, y, left_side=True, lower=True, transpose_a=True
        )[:, 0] * free_mask
        x_new = x + dx
        r_new = resid(x_new)
        c_old = jnp.dot(r, r)
        c_new = jnp.dot(r_new, r_new)
        better = jnp.logical_and(c_new < c_old, jnp.isfinite(c_new))
        x = jnp.where(better, x_new, x)
        r = jnp.where(better, r_new, r)
        lam = jnp.where(better, jnp.maximum(lam * lam_down, 1e-6),
                        jnp.minimum(lam * lam_up, 1e6))
        small_gain = (c_old - c_new) <= ftol * (c_old + 1e-20)
        small_step = jnp.max(jnp.abs(dx)) <= xtol * (1.0 + jnp.max(jnp.abs(x)))
        done = jnp.logical_and(better, jnp.logical_or(small_gain, small_step))
        return x, r, lam, it + 1, done

    # no observations -> zero residual -> no step can ever be "better";
    # start done so a vmapped batch isn't held at the full budget by empty
    # slots (the batch-wide while runs until every lane finishes)
    no_obs = jnp.sum(view_w) == 0
    state0 = (x0, resid(x0), jnp.asarray(lam0, x0.dtype),
              jnp.asarray(0, jnp.int32), no_obs)
    x, r, lam, it, _ = jax.lax.while_loop(cond, body, state0)
    return x


def _lm_solve_batched(
    x0: Array,        # (T, 68)
    skel: Skeleton,
    obs: Array,       # (T, V, 18, 3)
    view_w: Array,    # (T, V)
    P: Array,
    free_mask: Array,
    n_iters: int,
    eps: float,
    lam0: float,
    lam_up: float,
    lam_down: float,
    interpret: bool = False,
    ftol: float = 2e-6,
    xtol: float = 1e-6,
    return_iters: bool = False,
    fused: bool = False,
) -> Array:
    """Batched LM over all T slots at once, solving every slot's damped
    normal equations in ONE fused Pallas Gauss-Jordan kernel
    (ops/solve_pallas.py) instead of T vmapped Cholesky factorizations.
    Per-slot convergence freezes that slot; the loop runs while any slot is
    active (same semantics as the vmapped per-slot while).

    `return_iters=True` additionally returns the iteration count the
    batched while executed (= the slowest active slot's count — what the
    device actually pays; the convergence-stats instrumentation of
    scripts/ik_iteration_study.py).

    `fused=True` routes each iteration's normal-equation ASSEMBLY + solve
    through the one-program `fused_normal_solve` kernel (JtJ/g/ridge/GJ
    with J read once) instead of two XLA einsums + `batched_spd_solve` —
    the r4 wide-rig lever (docs/ROADMAP.md post-r4 #2)."""
    from multiview_motion_capture_tpu.ops.solve_pallas import (
        batched_spd_solve,
        fused_normal_solve,
    )
    T, n = x0.shape
    eye = jnp.eye(n, dtype=x0.dtype)
    frozen_diag = jnp.diag(1.0 - free_mask)

    # P is either (V, 3, 4) shared, or (T, V, 3, 4) per-slot (the tracker's
    # top-k view subset on wide rigs, cfg.ik_max_views)
    p_ax = 0 if P.ndim == 4 else None
    rj = jax.vmap(_residual_and_jacobian, in_axes=(0, None, 0, 0, p_ax, None))
    resid_b = jax.vmap(_residual, in_axes=(0, None, 0, 0, p_ax, None))

    def cond(state):
        x, r, lam, active, it = state
        return jnp.logical_and(it < n_iters, jnp.any(active))

    def body(state):
        x, r, lam, active, it = state
        _, J = rj(x, skel, obs, view_w, P, eps)
        J = J * free_mask[None, None, :]
        if fused:
            Jaug = jnp.concatenate([J, r[:, :, None]], axis=2)
            sol = fused_normal_solve(Jaug, lam, 1.0 - free_mask,
                                     interpret=interpret)
            dx = -sol * free_mask[None, :]
        else:
            JtJ = jnp.einsum("trd,tre->tde", J, J)
            g = jnp.einsum("trd,tr->td", J, r)
            ridge = 1e-6 * (jnp.trace(JtJ, axis1=1, axis2=2) / n) + 1e-6
            A = JtJ + (lam + ridge)[:, None, None] * eye + frozen_diag[None]
            dx = -batched_spd_solve(A, g, interpret=interpret) * free_mask[None, :]
        x_new = x + dx
        r_new = resid_b(x_new, skel, obs, view_w, P, eps)
        c_old = jnp.sum(r * r, axis=1)
        c_new = jnp.sum(r_new * r_new, axis=1)
        better = jnp.logical_and(c_new < c_old, jnp.isfinite(c_new)) & active
        x = jnp.where(better[:, None], x_new, x)
        r = jnp.where(better[:, None], r_new, r)
        lam = jnp.where(active,
                        jnp.where(better, jnp.maximum(lam * lam_down, 1e-6),
                                  jnp.minimum(lam * lam_up, 1e6)),
                        lam)
        small_gain = (c_old - c_new) <= ftol * (c_old + 1e-20)
        small_step = jnp.max(jnp.abs(dx), axis=1) <= xtol * (1.0 + jnp.max(jnp.abs(x), axis=1))
        converged = jnp.logical_and(better, jnp.logical_or(small_gain, small_step))
        active = active & ~converged
        return x, r, lam, active, it + 1

    # slots with no observations have an identically-zero residual: they can
    # never take a "better" step, so seeding them active would pin the loop
    # at the full iteration budget every call (profiler: cold spawn frames
    # ran all 50 iterations because of the empty slots, ~1.3 ms/frame
    # amortized).  Their x passes through unchanged either way.
    has_obs = jnp.sum(view_w, axis=1) > 0
    state0 = (x0, resid_b(x0, skel, obs, view_w, P, eps),
              jnp.full((T,), lam0, x0.dtype), has_obs,
              jnp.asarray(0, jnp.int32))
    x, r, lam, active, it = jax.lax.while_loop(cond, body, state0)
    if return_iters:
        return x, it
    return x


_FREE_POSE = np.zeros(N_PARAMS, dtype=np.float32)
_FREE_POSE[: 3 + N_JOINTS * 3] = 1.0
_FREE_ALL = np.ones(N_PARAMS, dtype=np.float32)


@high_precision
@functools.partial(jax.jit, static_argnames=("n_iters", "eps", "lam0", "lam_up",
                                             "lam_down", "stages", "solver",
                                             "interpret", "ftol", "xtol"))
def solve_two_stage(
    init: IkParams,
    skel: Skeleton,
    obs_coco: Array,
    view_w: Array,
    P: Array,
    n_iters: int,
    eps: float = 1e-5,
    lam0: float = 1e-3,
    lam_up: float = 10.0,
    lam_down: float = 0.33,
    stages: int = 2,
    solver: str = "chol",
    interpret: bool = False,
    ftol: float = 2e-6,
    xtol: float = 1e-6,
) -> Tuple[IkParams, Array]:
    """The reference's solve(): pose-only then pose+bone-lengths
    (ref:src/inverse_kinematics.py:402-407), batched over a leading tracklet
    axis.

    Args:
      init: IkParams batched (T, ...).
      obs_coco: (T, V, 17, 3) per-view COCO observations (mid-spine appended
        internally).
      view_w: (T, V) weights, 0 for cameras not part of the match.
      P: (V, 3, 4) projection matrices, or (T, V, 3, 4) per-slot (the
        tracker's top-k view subset on wide rigs, cfg.ik_max_views).
      n_iters: LM iterations per stage (50 cold / 5 warm; ref:397-400).
      stages: 2 = the reference's pose-only-then-pose+bone-lengths schedule
        (required for cold starts: zero-init angles need the staged warmup);
        1 = a single all-parameter solve — for warm starts the staging is
        just an optimization schedule, and one full stage reaches the same
        optimum at half the cost (quality-verified in docs/PERF.md).
    Returns:
      (params, joints): refined parameters and FK joint positions (T, 18, 3).
    """
    obs = add_mid_spine(obs_coco)  # (T, V, 18, 3)
    free_pose = jnp.asarray(_FREE_POSE)
    free_all = jnp.asarray(_FREE_ALL)
    x0 = init.pack()

    if solver in ("gj", "gj_fused"):
        # batched LM with the fused Pallas Gauss-Jordan normal-equation
        # solve; "gj_fused" additionally fuses the JtJ/g assembly into the
        # kernel (one J read per iteration)
        def stage(x, mask):
            return _lm_solve_batched(x, skel, obs, view_w, P, mask, n_iters,
                                     eps, lam0, lam_up, lam_down,
                                     interpret=interpret, ftol=ftol,
                                     xtol=xtol, fused=(solver == "gj_fused"))

        if stages == 1:
            x = stage(x0, free_all)
        else:
            x = stage(stage(x0, free_pose), free_all)
    else:
        def solve_one(x0_t, obs_t, w_t, P_t):
            if stages == 1:
                return _lm_solve(x0_t, skel, obs_t, w_t, P_t, free_all, n_iters,
                                 eps, lam0, lam_up, lam_down, ftol, xtol)
            x1 = _lm_solve(x0_t, skel, obs_t, w_t, P_t, free_pose, n_iters, eps,
                           lam0, lam_up, lam_down, ftol, xtol)
            return _lm_solve(x1, skel, obs_t, w_t, P_t, free_all, n_iters, eps,
                             lam0, lam_up, lam_down, ftol, xtol)

        p_ax = 0 if P.ndim == 4 else None
        x = jax.vmap(solve_one, in_axes=(0, 0, 0, p_ax))(x0, obs, view_w, P)
    params = IkParams.unpack(x)
    joints = forward_kinematics(skel, params.root, params.euler, params.side_lens)
    return params, joints
