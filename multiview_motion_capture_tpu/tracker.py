"""Fixed-capacity multi-view tracker: one jittable step, scanned over frames.

Re-designs the reference's `MvTracker`/`MvTracklet` object state machine
(ref:src/motion_capture.py:288-963) as a pure function over a fixed-size
slot-array state, so the *entire* per-frame pipeline — affinity assembly,
ALS association, group extraction, triangulation and batched IK — compiles
into a single XLA program and the offline path is one `lax.scan` over the
whole sequence.

Semantics parity map (ref:src/motion_capture.py):
- predict / time_since_update            :349-350, 874-875
- spatial-only matching (no live tracks) :597-631  (geometry_affinity path)
- spatial-time matrix assembly           :634-756
- ALS + parse into groups                :758-808, 417-446
- tracklet update (>= 2 views)           :924-934  (single-view match = no-op)
- tracklet death (Tentative or age out)  :387-391
- spawn from >= 2-view spatial groups    :936-958
- IK per update (warm) / per spawn (cold):326-332, 361-368

Deliberate deviations (documented per SURVEY.md §8):
- the reference's HEAD bug of importing the broken `_pino` solver
  (ref:motion_capture.py:37) is not reproduced; `inverse_kinematics.py` is
  the spec,
- padded slots use explicit validity masks instead of dynamic list sizes,
- the ALS random init has the static padded shape (same seeded distribution).
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from multiview_motion_capture_tpu.cameras import (
    CameraBank,
    pairwise_fundamental_det_np,
    pairwise_fundamental_np,
)
from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.ops import association as assoc
from multiview_motion_capture_tpu.ops import geometry as geom
from multiview_motion_capture_tpu.ops.fk import Skeleton
from multiview_motion_capture_tpu.ops import ik as ik_ops
from multiview_motion_capture_tpu.ops.triangulate import triangulate_points
from multiview_motion_capture_tpu.pose_def import (
    KpsFormat,
    common_kps_index,
    kps_index,
    KpsType,
)

Array = jnp.ndarray

# BASIC_18 joints observable in COCO (15: everything but Mid_Hip, Spine, Neck)
B18_COCO_SKEL_IDX, B18_COCO_OBS_IDX = common_kps_index(KpsFormat.BASIC_18, KpsFormat.COCO)
_COCO_IDX = kps_index(KpsFormat.COCO)
_LHIP, _RHIP = _COCO_IDX[KpsType.L_Hip], _COCO_IDX[KpsType.R_Hip]

FREE, TENTATIVE, CONFIRMED = 0, 1, 2


@struct.dataclass
class TrackerState:
    """Slot-array tracker state (all shapes static)."""

    active: Array        # (T,) int32: 0 free / 1 tentative / 2 confirmed
    track_id: Array      # (T,) int32
    hits: Array          # (T,) int32
    time_since_update: Array  # (T,) int32
    root: Array          # (T, 3)
    euler: Array         # (T, 18, 3)
    side_lens: Array     # (T, 11)
    pose3d: Array        # (T, 18, 3) current 3D pose (FK joints or triangulation)
    pose3d_score: Array  # (T, 18)
    root_vel: Array      # (T, 3) EMA per-frame ROOT velocity (association gate;
                         # whole-body translation only — limb motion is noise
                         # for crossing disambiguation, measured in r3)
    app_ema: Array       # (T, cfg.appearance_dim) EMA appearance embedding
                         # per track (zero-width when appearance is off)
    app_stats: Array     # (4,) online gain-calibration stats: EMA cos_same,
                         # EMA cos_diff, stat weight, EMA var(cos_same)
                         # [EMA cos(track, matched det), EMA cos(track,
                         # non-matched det), EMA weight in [0, 1]]; all zero
                         # until cfg.appearance_auto_target_px > 0 collects
    next_track_id: Array  # () int32

    @classmethod
    def zeros(cls, cfg: PipelineConfig) -> "TrackerState":
        T = cfg.max_tracks
        return cls(
            active=jnp.zeros(T, jnp.int32),
            track_id=jnp.full((T,), -1, jnp.int32),
            hits=jnp.zeros(T, jnp.int32),
            time_since_update=jnp.zeros(T, jnp.int32),
            root=jnp.zeros((T, 3)),
            euler=jnp.zeros((T, 18, 3)),
            side_lens=jnp.zeros((T, 11)),
            pose3d=jnp.zeros((T, 18, 3)),
            pose3d_score=jnp.zeros((T, 18)),
            root_vel=jnp.zeros((T, 3)),
            app_ema=jnp.zeros((T, cfg.appearance_dim)),
            app_stats=jnp.zeros(4),
            next_track_id=jnp.asarray(0, jnp.int32),
        )


class FrameOutput(NamedTuple):
    """Per-frame emission; host code reconstructs tracklets from the stack."""

    track_id: Array      # (T,) current id per slot (-1 if free)
    active: Array        # (T,) state after the update
    updated: Array       # (T,) bool — slot received a new pose this frame
    spawned: Array       # (T,) bool — slot was born this frame
    died_track_id: Array  # (T,) id of a track that died this frame (-1 none)
    root: Array          # (T, 3)
    euler: Array         # (T, 18, 3)
    side_lens: Array     # (T, 11)
    pose3d: Array        # (T, 18, 3)
    pose3d_score: Array  # (T, 18)
    matched_pose: Array  # (T, V) int32 matched detection slot per view (-1)
    app_obs: Array       # (T, appearance_dim) THIS frame's matched-detection
                         # mean appearance per slot (unit rows; zero when the
                         # slot was untouched / had no embedded detections;
                         # zero-width when appearance is off).  Unlike
                         # state.app_ema this carries no temporal smoothing,
                         # so offline passes can aggregate it over their own
                         # windows (crossings.resolve_crossings)
    als_iters: Array     # () int32


@dataclasses.dataclass(frozen=True)
class TrackerContext:
    """Static per-sequence context (closed over by the jitted step)."""

    cfg: PipelineConfig
    cams: CameraBank
    skel: Skeleton
    F_spatial: Array   # (V, V, 3, 3) skew-formula F (spatial affinity)
    F_det: Array       # (V, V, 3, 3) minor-formula F (spatial-time epipolar)
    K_inv: Array       # (V, 3, 3)
    diag_mask: Array   # (N, N) same-group block mask for ALS
    init_A: Array      # (N, rank) seeded ALS init factor
    use_ik: bool = True
    als_pallas_ctx: object = None  # PallasAlsContext when the fused kernel is used
    als_interpret: bool = False
    # optional device mesh: the O(V^2 P^2 K) epipolar blocks of the
    # similarity matrix are computed camera-sharded over this mesh axis
    # (parallel.sharded_association), with detections exchanged by one
    # all_gather over ICI — the scaled-rig multi-chip path (SURVEY.md §2.3)
    mesh: object = None
    mesh_axis: str = "dp"
    # hierarchical association (cfg.assoc_clusters > 1): per-cluster ALS
    # inputs — every cluster matrix has the same [T | Vc*P] layout, so one
    # mask/init/pallas context serves all clusters
    cluster_diag_mask: Array = None
    cluster_init_A: Array = None
    cluster_pallas_ctx: object = None
    # optional mesh over the CLUSTER axis: the C independent per-cluster ALS
    # solves shard_map to devices (parallel.sharded_solvers), zero
    # collectives until the output gather feeding the global closure —
    # multi-chip decomposition of ONE rig's solver stage
    cluster_mesh: object = None
    cluster_mesh_axis: str = "cl"
    # optional mesh over the TRACK-SLOT axis: the T independent per-track LM
    # solves shard_map to devices (parallel.sharded_solvers.sharded_lm_solve)
    # — the second half of the one-rig solver decomposition
    ik_mesh: object = None
    ik_mesh_axis: str = "tk"

    @classmethod
    def build(cls, cams: CameraBank, cfg: PipelineConfig, use_ik: bool = True,
              mesh=None, mesh_axis: str = "dp", cluster_mesh=None,
              cluster_mesh_axis: str = "cl", ik_mesh=None,
              ik_mesh_axis: str = "tk") -> "TrackerContext":
        K = np.asarray(cams.K, dtype=np.float64)
        Rt = np.asarray(cams.Rt, dtype=np.float64)
        P = np.asarray(cams.P, dtype=np.float64)
        group_sizes = (cfg.max_tracks,) + (cfg.max_people,) * cfg.n_views
        n = cfg.n_matrix
        diag_mask = assoc.block_diag_mask(group_sizes)
        init_A = assoc.default_init_factor(n, cfg.als_max_rank)

        backend = cfg.als_backend
        pallas_ctx = None
        # pallas kernels run compiled on TPU, interpreted elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
        if backend in ("auto", "pallas"):
            from multiview_motion_capture_tpu.ops import als_pallas

            if n <= als_pallas.MAX_PAD and cfg.assoc_clusters == 1 and (
                backend == "pallas" or jax.default_backend() == "tpu"
            ):
                pallas_ctx = als_pallas.PallasAlsContext.build(n, diag_mask, init_A)

        cluster_diag_mask = cluster_init_A = None
        cluster_pallas_ctx = None
        if cfg.assoc_clusters > 1:
            C = cfg.assoc_clusters
            if C > cfg.n_views:
                raise ValueError(
                    f"assoc_clusters={C} exceeds n_views={cfg.n_views}")
            # non-divisible view counts (r5): clusters take the interleaved
            # sizes ceil/floor(V/C); every cluster solve runs at the CEIL
            # shape and the short clusters pad with dead detection slots
            # (zero similarity rows — exactly how invalid detections behave
            # everywhere else), so one shared mask/init serves all C
            Vc = -(-cfg.n_views // C)
            nc = cfg.max_tracks + Vc * cfg.max_people
            c_sizes = (cfg.max_tracks,) + (cfg.max_people,) * Vc
            c_mask = assoc.block_diag_mask(c_sizes)
            c_init = assoc.default_init_factor(nc, cfg.als_max_rank)
            cluster_diag_mask = jnp.asarray(c_mask)
            cluster_init_A = jnp.asarray(c_init)
            if backend in ("auto", "pallas"):
                from multiview_motion_capture_tpu.ops import als_pallas

                if nc <= als_pallas.MAX_PAD and (
                    backend == "pallas" or jax.default_backend() == "tpu"
                ):
                    cluster_pallas_ctx = als_pallas.PallasAlsContext.build(
                        nc, c_mask, c_init
                    )
        if mesh is not None and cfg.n_views % mesh.shape[mesh_axis] != 0:
            raise ValueError(
                f"n_views={cfg.n_views} not divisible by mesh axis "
                f"{mesh_axis}={mesh.shape[mesh_axis]}"
            )
        if cluster_mesh is not None:
            if cfg.assoc_clusters <= 1:
                raise ValueError("cluster_mesh needs assoc_clusters > 1")
            n_cl = cluster_mesh.shape[cluster_mesh_axis]
            if cfg.assoc_clusters % n_cl != 0:
                raise ValueError(
                    f"assoc_clusters={cfg.assoc_clusters} not divisible by "
                    f"cluster mesh axis {cluster_mesh_axis}={n_cl}"
                )
        if ik_mesh is not None:
            if not use_ik:
                raise ValueError("ik_mesh needs use_ik=True")
            n_tk = ik_mesh.shape[ik_mesh_axis]
            if cfg.max_tracks % n_tk != 0:
                raise ValueError(
                    f"max_tracks={cfg.max_tracks} not divisible by ik mesh "
                    f"axis {ik_mesh_axis}={n_tk}"
                )
        return cls(
            cfg=cfg,
            cams=cams,
            skel=Skeleton.default(),
            F_spatial=jnp.asarray(pairwise_fundamental_np(K, Rt), dtype=jnp.float32),
            F_det=jnp.asarray(pairwise_fundamental_det_np(P), dtype=jnp.float32),
            K_inv=jnp.linalg.inv(cams.K),
            diag_mask=jnp.asarray(diag_mask),
            init_A=jnp.asarray(init_A),
            use_ik=use_ik,
            als_pallas_ctx=pallas_ctx,
            als_interpret=interpret,
            mesh=mesh,
            mesh_axis=mesh_axis,
            cluster_diag_mask=cluster_diag_mask,
            cluster_init_A=cluster_init_A,
            cluster_pallas_ctx=cluster_pallas_ctx,
            cluster_mesh=cluster_mesh,
            cluster_mesh_axis=cluster_mesh_axis,
            ik_mesh=ik_mesh,
            ik_mesh_axis=ik_mesh_axis,
        )


# ---------------------------------------------------------------------------
# similarity-matrix assembly
# ---------------------------------------------------------------------------

def _masked_sigmoid_similarity(dst: Array, valid2: Array, mean: Array, std: Array,
                               scale: float) -> Array:
    s = (dst - mean) / std
    return jnp.where(valid2, jax.nn.sigmoid(-scale * s), 0.0)


def _track_det_distances(ctx: TrackerContext, state: TrackerState,
                         kps: Array, det_valid: Array,
                         P_mats: Optional[Array] = None) -> Array:
    """Tracklet -> detection reprojection distances d23 (T, V, P), NaN where
    either side is invalid (the 2D-3D block of ref:src/motion_capture.py:
    634-741; also feeds the track-rescue gate)."""
    cfg = ctx.cfg
    if P_mats is None:
        P_mats = ctx.cams.P
    pose3d = state.pose3d
    if cfg.motion_gain:
        # constant-velocity prediction for the gate only (cfg.motion_gain):
        # rigid translation by the EMA root velocity (tsu was already
        # incremented this frame, so it IS the horizon)
        dt = state.time_since_update.astype(pose3d.dtype)
        shift = cfg.motion_gain * dt[:, None] * state.root_vel     # (T, 3)
        pose3d = pose3d + shift[:, None, :]
    if ctx.use_ik:
        pts = pose3d[:, jnp.asarray(B18_COCO_SKEL_IDX), :]         # (T,15,3)
        sc3 = state.pose3d_score[:, jnp.asarray(B18_COCO_SKEL_IDX)]
        obs = kps[:, :, jnp.asarray(B18_COCO_OBS_IDX), :]          # (V,P,15,3)
    else:
        pts = pose3d[:, :17, :]
        sc3 = state.pose3d_score[:, :17]
        obs = kps
    d23 = geom.masked_reprojection_error(
        pts[:, None, None, :, :], sc3[:, None, None, :], obs[None, :, :, :, :],
        P_mats[None, :, None, :, :], cfg.reproj_min_kps_score,
    )  # (T, V, P)
    t_alive = state.active > 0
    return jnp.where(t_alive[:, None, None] & det_valid[None, :, :],
                     d23, jnp.nan)


def _appearance_gain(cfg: PipelineConfig, state: TrackerState):
    """The px-per-unit-cosine-distance gain the appearance penalties use.

    Static `cfg.appearance_gain_px` by default; with
    `cfg.appearance_auto_target_px > 0` it is derived ONLINE from the
    state's matched-vs-unmatched cosine statistics (config.py for the
    rationale): gain = target_px / EMA(cos_same - cos_diff), clamped to
    [0, appearance_auto_max_px]; a gap below `appearance_auto_min_gap`
    means the embeddings carry no identity signal and the gain goes to 0
    (self-disabling); until the stat weight reaches 0.5 the static gain
    applies.  Returns a python float (auto off — the compiled program is
    unchanged) or a scalar traced value (auto on)."""
    if cfg.appearance_auto_target_px <= 0:
        return cfg.appearance_gain_px
    cs, cd, w, vs = (state.app_stats[0], state.app_stats[1],
                     state.app_stats[2], state.app_stats[3])
    gap = cs - cd
    # two constraints (r5, docs/PERF.md auto-gain study):
    #   discrimination target: gain * gap       <= target_px  (per swap)
    #   noise cap:             gain * std(same) <= noise_px
    # the noise cap is what the hand-tuned per-extractor gains were really
    # encoding — the raw color-layout descriptor's tuned 60 is 3 px /
    # sigma 0.046 almost exactly; when the two conflict the noise cap wins
    # (weak evidence must not shout)
    auto = cfg.appearance_auto_target_px / jnp.maximum(
        gap, cfg.appearance_auto_min_gap)
    if cfg.appearance_auto_noise_px > 0:
        sd = jnp.sqrt(jnp.maximum(vs, 1e-12))
        auto = jnp.minimum(auto, cfg.appearance_auto_noise_px
                           / jnp.maximum(sd, 1e-6))
    auto = jnp.clip(auto, 0.0, cfg.appearance_auto_max_px)
    auto = jnp.where(gap >= cfg.appearance_auto_min_gap, auto, 0.0)
    return jnp.where(w >= 0.5, auto, cfg.appearance_gain_px)


def _appearance_penalty(gain, app_ema: Array, app: Array) -> Array:
    """Appearance term of the 2D-3D similarity block: `gain` pixels of
    distance per unit cosine distance between a track's EMA embedding and a
    detection's embedding (crossing-instant disambiguation; zero wherever
    either side has no embedding yet).

    app_ema: (T, D); app: (V, P, D).  Returns (T, V, P).
    """
    eps = 1e-6
    tn = jnp.linalg.norm(app_ema, axis=-1)                # (T,)
    dn = jnp.linalg.norm(app, axis=-1)                    # (V, P)
    cos = jnp.einsum("td,vpd->tvp", app_ema, app) / (
        jnp.maximum(tn, eps)[:, None, None] * jnp.maximum(dn, eps)[None]
    )
    has = (tn > eps)[:, None, None] & (dn > eps)[None, :, :]
    return jnp.where(has, gain * (1.0 - cos), 0.0)


def _appearance_penalty_d22(gain, app: Array) -> Array:
    """Appearance term of the 2D-2D (cross-view detection grouping) block:
    same px-per-cosine-distance scale between detection pairs (epipolar
    geometry cannot separate two people near one epipolar plane; clothing
    can).  app: (V, P, D).  Returns (V, P, V, P), zero where either side
    has no embedding."""
    eps = 1e-6
    dn = jnp.linalg.norm(app, axis=-1)                    # (V, P)
    cos = jnp.einsum("vpd,wqd->vpwq", app, app) / (
        jnp.maximum(dn, eps)[:, :, None, None]
        * jnp.maximum(dn, eps)[None, None, :, :]
    )
    has = (dn > eps)[:, :, None, None] & (dn > eps)[None, None, :, :]
    return jnp.where(has, gain * (1.0 - cos), 0.0)


def _spatial_time_similarity(
    ctx: TrackerContext, state: TrackerState, kps: Array, det_valid: Array,
    view_idx: Optional[np.ndarray] = None,
    app: Optional[Array] = None,
    view_valid: Optional[np.ndarray] = None,
) -> Tuple[Array, Array, Array]:
    """The spatial-time similarity matrix (ref:src/motion_capture.py:634-756).

    Layout: [T tracklet slots | view0 slots | view1 slots | ...].
    `view_idx` (static) restricts the matrix to a camera subset — the
    hierarchical-cluster path, which never consumes cross-cluster entries
    and must not pay for their O(V^2 P^2 K) epipolar block.
    `app` (V, P, D) detection appearance embeddings add the
    `_appearance_penalty` term to the 2D-3D block (cfg.appearance_dim > 0);
    the returned d23 stays purely geometric.
    Returns (sim (N, N), elem_valid (N,), d23 (T, V, P) raw track->detection
    reprojection distances — reused by the track-rescue pass).
    """
    cfg = ctx.cfg
    T, P = cfg.max_tracks, cfg.max_people
    if view_idx is None:
        V = cfg.n_views
        F_det = ctx.F_det
        P_mats = ctx.cams.P
    else:
        V = len(view_idx)
        kps = kps[view_idx]
        det_valid = det_valid[view_idx]
        F_det = ctx.F_det[np.ix_(view_idx, view_idx)]
        P_mats = ctx.cams.P[view_idx]
        if app is not None:
            app = app[view_idx]
        if view_valid is not None:
            # dead pad rows (non-divisible cluster sizes): a duplicated
            # view with every detection masked contributes nothing
            det_valid = det_valid & jnp.asarray(view_valid)[:, None]
    N = T + V * P

    # ---- 2D-2D epipolar block (V,P,V,P) ----
    if ctx.mesh is not None and view_idx is None:
        from multiview_motion_capture_tpu.parallel.sharded_association import (
            sharded_st_epipolar,
        )

        d22 = sharded_st_epipolar(
            kps, ctx.F_det, cfg.epipolar_min_kps_score, ctx.mesh, ctx.mesh_axis
        )
    else:
        ka = kps[:, :, None, None, :, :]                   # (V,P,1,1,K,3)
        kb = kps[None, None, :, :, :, :]                   # (1,1,V,P,K,3)
        Fab = F_det[:, None, :, None, :, :]                # (V,1,V,1,3,3)
        d22 = geom.masked_symmetric_epipolar_error(ka, kb, Fab, cfg.epipolar_min_kps_score)
    if cfg.appearance_dim > 0 and app is not None:
        d22 = d22 + _appearance_penalty_d22(_appearance_gain(cfg, state), app)
    same_view = jnp.eye(V, dtype=bool)[:, None, :, None]
    pair_valid = det_valid[:, :, None, None] & det_valid[None, None, :, :]
    d22 = jnp.where(same_view | ~pair_valid, jnp.nan, d22)

    # ---- tracklet -> 2D reprojection block (T,V,P) ----
    d23 = _track_det_distances(ctx, state, kps, det_valid, P_mats=P_mats)
    t_alive = state.active > 0

    # appearance evidence perturbs the SIMILARITY distances only; d23 itself
    # stays geometric (the rescue pass gates on physical pixels)
    if cfg.appearance_dim > 0 and app is not None:
        d23_sim = d23 + _appearance_penalty(_appearance_gain(cfg, state),
                                            state.app_ema, app)
    else:
        d23_sim = d23

    # ---- assemble (N, N) ----
    dst = jnp.full((N, N), jnp.nan, dtype=kps.dtype)
    dst = dst.at[T:, T:].set(d22.reshape(V * P, V * P))
    dst = dst.at[:T, T:].set(d23_sim.reshape(T, V * P))
    dst = dst.at[T:, :T].set(d23_sim.reshape(T, V * P).T)

    elem_valid = jnp.concatenate([t_alive, det_valid.reshape(-1)])
    valid2 = elem_valid[:, None] & elem_valid[None, :]
    eye = jnp.eye(N, dtype=bool)
    dst = jnp.where(eye, 0.0, dst)  # i == j entries stay 0 (ref:676-677)

    # nan -> (masked) max + 1 (ref:742-745)
    finite = valid2 & ~jnp.isnan(dst)
    maxv = jnp.max(jnp.where(finite, dst, -jnp.inf))
    maxv = jnp.where(jnp.isfinite(maxv), maxv, 0.0)
    dst = jnp.where(jnp.isnan(dst), maxv + 1.0, dst)

    sim = _masked_sigmoid_similarity(
        dst, valid2, cfg.st_norm_mean, cfg.st_norm_std, cfg.affinity_sigmoid_scale
    )
    sim = jnp.where(sim < cfg.st_sim_floor, 0.0, sim)  # ref:755-756
    sim = jnp.minimum(sim, 1.0)
    return sim, elem_valid, d23


def _spatial_similarity(
    ctx: TrackerContext, kps: Array, det_valid: Array,
    view_idx: Optional[np.ndarray] = None,
    app: Optional[Array] = None,
    app_gain=None,
    view_valid: Optional[np.ndarray] = None,
) -> Tuple[Array, Array]:
    """The spatial-only similarity (ref:src/motion_capture.py:597-631 +
    ref:src/mv_math_util.py:320-351 `geometry_affinity`): raw epipolar
    distances (no score gating), fill 50 for same-view/unknown, diagonal 0,
    z-normalized by the matrix's own masked mean/std, sigmoid.
    `view_idx` (static) restricts to a camera subset (cluster path); the
    z-normalization then uses the cluster matrix's own statistics, exactly
    as the reference normalizes whatever matrix it solves.
    `app` (V, P, D) detection appearance embeddings (cfg.appearance_dim > 0)
    add the same px-per-cosine penalty as the spatial-time block — first
    frame / total-loss re-acquisition is exactly where two people crossing
    near one epipolar plane have no tracklet to disambiguate them.  Scale
    handling: the z-statistics are computed over the GEOMETRIC distances
    only (the penalty is added after), so the appearance term cannot dilute
    its own weight by inflating the matrix std; its effective sigma weight
    is appearance_gain_px / std(geometric matrix).  `app_gain` overrides the
    px-per-cosine gain (the step passes `_appearance_gain(cfg, state)` so
    auto-calibration covers this path too; None = the static config gain)."""
    cfg = ctx.cfg
    if app_gain is None:
        app_gain = cfg.appearance_gain_px
    T, P = cfg.max_tracks, cfg.max_people
    if view_idx is None:
        V = cfg.n_views
        F_spatial = ctx.F_spatial
    else:
        V = len(view_idx)
        kps = kps[view_idx]
        det_valid = det_valid[view_idx]
        F_spatial = ctx.F_spatial[np.ix_(view_idx, view_idx)]
        if app is not None:
            app = app[view_idx]
        if view_valid is not None:
            det_valid = det_valid & jnp.asarray(view_valid)[:, None]
    N = T + V * P

    if ctx.mesh is not None and view_idx is None:
        from multiview_motion_capture_tpu.parallel.sharded_association import (
            sharded_affinity,
        )

        d = sharded_affinity(kps, ctx.F_spatial, ctx.mesh, ctx.mesh_axis)
    else:
        d = geom.projected_distance_all_pairs(kps, F_spatial)  # (V,P,V,P)
    same_view = jnp.eye(V, dtype=bool)[:, None, :, None]
    d = jnp.where(same_view, cfg.spatial_fill_distance, d)
    dst = d.reshape(V * P, V * P)
    eye = jnp.eye(V * P, dtype=bool)
    dst = jnp.where(eye, 0.0, dst)

    dv = det_valid.reshape(-1)
    valid2 = dv[:, None] & dv[None, :]
    cnt = jnp.maximum(valid2.sum(), 1)
    mean = jnp.sum(jnp.where(valid2, dst, 0.0)) / cnt
    var = jnp.sum(jnp.where(valid2, (dst - mean) ** 2, 0.0)) / cnt
    std = jnp.maximum(jnp.sqrt(var), 1e-6)
    if cfg.appearance_dim > 0 and app is not None:
        # after the stats on purpose (see docstring); diagonal stays 0
        pen = _appearance_penalty_d22(app_gain, app).reshape(V * P, V * P)
        dst = dst + jnp.where(eye, 0.0, pen)
    sim2d = _masked_sigmoid_similarity(dst, valid2, mean, std, cfg.affinity_sigmoid_scale)

    sim = jnp.zeros((N, N), dtype=kps.dtype)
    sim = sim.at[T:, T:].set(sim2d)
    elem_valid = jnp.concatenate([jnp.zeros(T, dtype=bool), dv])
    return sim, elem_valid


def _run_als(ctx: TrackerContext, sim: Array, pallas_ctx, diag_mask, init_A):
    """One multi-way ALS solve: fused Pallas kernel when a context exists,
    the XLA while-loop otherwise (identical groupings, test_als_pallas)."""
    cfg = ctx.cfg
    if pallas_ctx is not None:
        from multiview_motion_capture_tpu.ops import als_pallas

        pc = pallas_ctx
        n = sim.shape[0]
        x_pad, n_iters = als_pallas.match_als_pallas(
            als_pallas.pad_similarity(sim, pc.pad), pc.keep, pc.eye_t,
            pc.init_A, pc.n_true,
            alpha=cfg.als_alpha, beta=cfg.als_beta, mu0=cfg.als_mu,
            tol=cfg.als_tol, max_iter=cfg.als_max_iter,
            stable_iters=cfg.als_stable_iters, rank=pc.rank,
            interpret=ctx.als_interpret,
        )
        return assoc.AlsResult(x_bin=x_pad[:n, :n], n_iters=n_iters)
    return assoc.match_als(
        sim, diag_mask, init_A,
        alpha=cfg.als_alpha, beta=cfg.als_beta, mu0=cfg.als_mu,
        tol=cfg.als_tol, max_iter=cfg.als_max_iter,
        stable_iters=cfg.als_stable_iters,
    )


def _clustered_association(
    ctx: TrackerContext, state: TrackerState,
    kps: Array, det_valid: Array, any_alive: Array,
    app: Optional[Array] = None,
) -> Tuple["assoc.AlsResult", Array, Array]:
    """Hierarchical association for rigs beyond the fused kernel's N=384
    (VERDICT r2 next #5; the reference is nested Python loops with no size
    ceiling but no scaling either, ref:src/mv_association.py:222-318).

    Cameras are partitioned into `cfg.assoc_clusters` INTERLEAVED clusters
    (cluster c = views c, c+C, c+2C, ...): on a ring rig every cluster then
    spans the full angular range, keeping wide baselines inside each
    cluster (contiguous sections were measured to merge depth-aligned
    people — four adjacent ~30-degree-apart views cannot separate two
    people along the section's depth axis).  Each cluster solves its own
    [T tracklet slots | its Vc views] ALS (each small enough for the fused
    kernel).  The per-cluster binarized matches are scattered into one
    global (N, N) matrix:

    - tracklet rows appear in EVERY cluster, so a tracked person's
      cross-cluster identity merges through the tracklet in the closure;
    - NEW people (detection-only groups) are linked across clusters by
      triangulated-centroid proximity (`cfg.cluster_merge_m`): each
      detection-led multi-view group triangulates its members' mean
      keypoint to one 3D point, and nearby cross-cluster groups get a
      linking edge before the global closure.

    Known approximation: a person seen in only ONE view per cluster (but
    2+ views total) cannot form a multi-view group anywhere and will not
    spawn until it reaches 2 views inside some cluster — size clusters to
    the rig's overlap structure.

    Only intra-cluster similarity is ever computed: the cross-cluster
    O(V^2 P^2 K) epipolar blocks are never consumed, and skipping them is
    where the clustered path's throughput comes from (computing the full
    matrix and slicing it measured 83.5 fps on the 64-cam rig; intra-only
    is ~C x cheaper on the dominant block).

    Returns (AlsResult over the global (N, N) layout, elem_valid (N,),
    d23 (T, V, P) global track->detection distances for the rescue pass).
    """
    cfg = ctx.cfg
    T, V, P = cfg.max_tracks, cfg.n_views, cfg.max_people
    N = cfg.n_matrix
    C = cfg.assoc_clusters
    Vc = -(-V // C)  # ceil: every cluster solve runs at this padded width
    W = Vc * P

    t_alive = state.active > 0
    dv_flat = det_valid.reshape(-1)
    ev_st = jnp.concatenate([t_alive, dv_flat])
    ev_sp = jnp.concatenate([jnp.zeros(T, dtype=bool), dv_flat])
    elem_valid = jnp.where(any_alive, ev_st, ev_sp)
    d23_global = _track_det_distances(ctx, state, kps, det_valid)

    # scatter-free assembly: cluster c's detections are the STRIDED slice
    # [c::C] of the (V, P) grid, so each per-cluster match matrix splits
    # into tracklet-tracklet / tracklet-det / det-det blocks that land in
    # the global matrix via static strided updates on zeros (cheap masked
    # selects) + concatenation.  The index-array `np.ix_(ids, ids)`
    # gather/scatter this replaces measured ~3.8 ms/frame on the 64-cam rig
    # (pred gather fusions + s32 index staging, docs/PERF.md) — the single
    # most expensive op group of the clustered profile.  Bit-identical
    # x_global to the scatter version: blocks are disjoint except the
    # tracklet-tracklet corner, which ORs across clusters.
    cluster_of_view = np.arange(V) % C           # interleaved clusters
    cluster_views = [np.nonzero(cluster_of_view == c)[0] for c in range(C)]
    subs = []
    for views_c in cluster_views:
        n_real = len(views_c)
        if n_real < Vc:
            # non-divisible V: pad the short cluster to the shared CEIL
            # width by duplicating its first view with view_valid=False —
            # every detection of the pad view is masked, so it contributes
            # exactly nothing (same mechanism as an invalid detection)
            views_p = np.concatenate(
                [views_c, np.full(Vc - n_real, views_c[0], views_c.dtype)])
            vvalid = np.arange(Vc) < n_real
        else:
            views_p, vvalid = views_c, None
        sim_st_c, _, _ = _spatial_time_similarity(ctx, state, kps, det_valid,
                                                  view_idx=views_p, app=app,
                                                  view_valid=vvalid)
        sim_sp_c, _ = _spatial_similarity(ctx, kps, det_valid,
                                          view_idx=views_p, app=app,
                                          app_gain=_appearance_gain(cfg, state),
                                          view_valid=vvalid)
        subs.append(jnp.where(any_alive, sim_st_c, sim_sp_c))

    if ctx.cluster_mesh is not None:
        # clusters -> devices (parallel.sharded_solvers): each device solves
        # its clusters' ALS locally (lax.map — the exact solo-solve
        # program, so the binarized matches are bit-equal to the sequential
        # path), zero collectives until the output gather
        from multiview_motion_capture_tpu.parallel.sharded_solvers import (
            sharded_cluster_als,
        )

        xb_all, iters_all = sharded_cluster_als(
            jnp.stack(subs), ctx.cluster_diag_mask, ctx.cluster_init_A,
            ctx.cluster_mesh, ctx.cluster_mesh_axis,
            alpha=cfg.als_alpha, beta=cfg.als_beta, mu0=cfg.als_mu,
            tol=cfg.als_tol, max_iter=cfg.als_max_iter,
            stable_iters=cfg.als_stable_iters,
        )
        xbs = [xb_all[c] for c in range(C)]
        iters = iters_all.sum()
    elif ctx.cluster_pallas_ctx is not None:
        # one batched kernel for all C cluster solves: each cluster freezes
        # at its own stop test (per-cluster results equal the sequential
        # kernels'), but the ridge-GJ latency chain — the kernel's measured
        # per-iteration floor — is paid once, not C times
        from multiview_motion_capture_tpu.ops import als_pallas
        pc = ctx.cluster_pallas_ctx
        n_c = subs[0].shape[0]
        W_pad = jnp.stack(
            [als_pallas.pad_similarity(s, pc.pad) for s in subs])
        # scoped-VMEM budget: the batched program keeps every cluster's
        # ADMM state resident, so wide rigs (128 cams = 4+ clusters of
        # pad 384) split into sequential chunks of the largest batch that
        # fits (als_pallas.max_als_batch; identical per-cluster results —
        # each problem freezes at its own stop test regardless of batch)
        c_max = als_pallas.max_als_batch(pc.pad)
        x_chunks, it_chunks = [], []
        for i in range(0, C, c_max):
            x_p, it_c = als_pallas.match_als_pallas_batched(
                W_pad[i:i + c_max], pc.keep, pc.eye_t, pc.init_A, pc.n_true,
                alpha=cfg.als_alpha, beta=cfg.als_beta, mu0=cfg.als_mu,
                tol=cfg.als_tol, max_iter=cfg.als_max_iter,
                stable_iters=cfg.als_stable_iters, rank=pc.rank,
                interpret=ctx.als_interpret,
            )
            x_chunks.append(x_p)
            it_chunks.append(it_c)
        x_pads = jnp.concatenate(x_chunks, axis=0)
        xbs = [x_pads[c, :n_c, :n_c] for c in range(C)]
        iters = jnp.concatenate(it_chunks).sum()
    else:
        xbs = []
        iters = jnp.asarray(0, jnp.int32)
        for sub in subs:
            als = _run_als(ctx, sub, None, ctx.cluster_diag_mask,
                           ctx.cluster_init_A)
            xbs.append(als.x_bin)
            iters = iters + als.n_iters

    x_tt = jnp.zeros((T, T), dtype=bool)
    x_td = jnp.zeros((T, V, P), dtype=bool)
    x_dd = jnp.zeros((V, P, V, P), dtype=bool)
    for c, (views_c, xb) in enumerate(zip(cluster_views, xbs)):
        n_real = len(views_c)  # pad rows (if any) sit at the END — slice off
        x_tt = x_tt | xb[:T, :T]
        x_td = x_td.at[:, c::C, :].set(
            xb[:T, T:].reshape(T, Vc, P)[:, :n_real])
        x_dd = x_dd.at[c::C, :, c::C, :].set(
            xb[T:, T:].reshape(Vc, P, Vc, P)[:n_real, :, :n_real]
        )
    x_td = x_td.reshape(T, V * P)
    top = jnp.concatenate([x_tt, x_td], axis=1)
    bottom = jnp.concatenate([x_td.T, x_dd.reshape(V * P, V * P)], axis=1)
    x_global = jnp.concatenate([top, bottom], axis=0)

    # ---- cross-cluster merge of NEW-person groups ----
    g0 = assoc.extract_groups(x_global, elem_valid)
    rep0, member0 = g0.rep, g0.member
    det_rep = rep0[T:].reshape(V, P)
    det_member = member0[T:].reshape(V, P)
    e_global = jnp.arange(V * P, dtype=jnp.int32) + T

    # per candidate leader: first member per view, mean-keypoint centroid.
    # The per-detection mean keypoint is independent of the candidate, so
    # compute it ONCE (V, P, 2) and gather 2 floats per candidate-view —
    # the naive per-candidate kps gather materialized (VP, V, K, 3)
    # (= 8.4M f32 at 128 cams) and its fusions were ~8 ms/frame of pure
    # HBM traffic, the top cost of the 128-cam xplane profile
    # (docs/PERF.md r5).  Bit-identical math: same mean over the same
    # detection's keypoints.
    w_all = kps[..., 2] > cfg.epipolar_min_kps_score     # (V, P, K)
    cnt_all = jnp.maximum(w_all.sum(axis=-1), 1)
    mean_uv = ((kps[..., :2] * w_all[..., None]).sum(axis=2)
               / cnt_all[..., None])                     # (V, P, 2)

    def centroid(key):
        cand = det_member & (det_rep == key)            # (V, P)
        exists = jnp.any(cand, axis=1)
        first = jnp.argmax(cand, axis=1).astype(jnp.int32)
        uv = jnp.take_along_axis(
            mean_uv, first[:, None, None], axis=1)[:, 0]  # (V, 2)
        sc = jnp.where(exists, 1.0, 0.0)
        point_obs = jnp.concatenate([uv, sc[:, None]], axis=-1)[:, None, :]
        tri = triangulate_points(ctx.cams.P, ctx.K_inv, point_obs, exists,
                                 0.5, 0)                 # (1, 4)
        return tri[0, :3], exists.sum()

    cents, nviews = jax.vmap(centroid)(e_global)         # (VP, 3), (VP,)
    # leaders of detection-only groups with >= 2 views (rep >= T excludes
    # groups containing a tracklet; those merge through the tracklet)
    is_leader = (rep0[T:] == e_global) & member0[T:] & (rep0[T:] >= T)
    ok = is_leader & (nviews >= 2)
    cents = jnp.where(ok[:, None], cents, 1e6)
    d = jnp.linalg.norm(cents[:, None] - cents[None, :], axis=-1)
    cluster_of = jnp.asarray(
        np.repeat(cluster_of_view, P).astype(np.int32)
    )  # (VP,) interleaved cluster of each detection slot
    cross = cluster_of[:, None] != cluster_of[None, :]
    link = (d < cfg.cluster_merge_m) & cross & ok[:, None] & ok[None, :]
    x_det = x_global[T:, T:] | link
    x_global = x_global.at[T:, T:].set(x_det)
    return (assoc.AlsResult(x_bin=x_global, n_iters=iters), elem_valid,
            d23_global)


# ---------------------------------------------------------------------------
# the tracker step
# ---------------------------------------------------------------------------

def _gather_obs(kps: Array, matched_pose: Array, exists: Array) -> Tuple[Array, Array]:
    """Per-slot observation tensors from matched detection indices.

    kps: (V, P, K, 3); matched_pose: (T, V); exists: (T, V).
    Returns obs (T, V, K, 3) and view weights (T, V)."""
    safe = jnp.maximum(matched_pose, 0)
    obs = jnp.take_along_axis(
        kps[None, :, :, :, :],
        safe[:, :, None, None, None],
        axis=2,
    )[:, :, 0]  # (T, V, K, 3)
    w = exists.astype(kps.dtype)
    return obs * w[:, :, None, None], w


def make_step(ctx: TrackerContext):
    """Build the jitted per-frame step function."""
    cfg = ctx.cfg
    T, V, P = cfg.max_tracks, cfg.n_views, cfg.max_people
    N = cfg.n_matrix
    skel = ctx.skel

    use_app = cfg.appearance_dim > 0

    def step(state: TrackerState, frame) -> Tuple[TrackerState, FrameOutput]:
        if use_app:
            # appearance-enabled contexts take a third per-frame input:
            # (V, P, appearance_dim) detection embeddings (unit vectors;
            # zero rows = no embedding for that detection)
            kps, det_valid, app = frame
        else:
            kps, det_valid = frame  # (V, P, K, 3), (V, P)
            app = None

        # 1. predict (ref:349-350)
        tsu = state.time_since_update + (state.active > 0).astype(jnp.int32)
        state = state.replace(time_since_update=tsu)

        # 2 + 3. similarity (spatial-time when any track is alive, spatial
        #    otherwise, ref:829-835) + ALS + group extraction (fused Pallas
        #    kernel on TPU, XLA loop otherwise; identical groupings — see
        #    tests/test_als_pallas.py).  Rigs beyond the fused kernel's
        #    N=384 use per-camera-cluster ALS over intra-cluster similarity
        #    only, with a synthesized global match matrix
        any_alive = jnp.any(state.active > 0)
        if cfg.assoc_clusters > 1:
            als, elem_valid, d23 = _clustered_association(
                ctx, state, kps, det_valid, any_alive, app=app
            )
        else:
            sim_st, ev_st, d23 = _spatial_time_similarity(ctx, state, kps,
                                                          det_valid, app=app)
            sim_sp, ev_sp = _spatial_similarity(
                ctx, kps, det_valid, app=app,
                app_gain=_appearance_gain(cfg, state))
            sim = jnp.where(any_alive, sim_st, sim_sp)
            elem_valid = jnp.where(any_alive, ev_st, ev_sp)
            als = _run_als(ctx, sim, ctx.als_pallas_ctx, ctx.diag_mask,
                           ctx.init_A)
        groups = assoc.extract_groups(als.x_bin, elem_valid)
        rep, member, group_size = groups.rep, groups.member, groups.group_size

        # 4. per-slot / per-leader matched detections
        det_rep = rep[T:].reshape(V, P)
        det_member = member[T:].reshape(V, P)

        def first_match(key):  # key: () group leader index
            cand = det_member & (det_rep == key)              # (V, P)
            exists = jnp.any(cand, axis=1)                    # (V,)
            first = jnp.argmax(cand, axis=1).astype(jnp.int32)
            return jnp.where(exists, first, -1), exists

        slot_idx = jnp.arange(T, dtype=jnp.int32)
        # a tracklet owns its group iff it is the group leader (the reference
        # takes the first '3d' element of each group, ref:764-769; tracklet
        # indices precede detections, so leader == lowest-index tracklet)
        t_is_leader = member[:T] & (rep[:T] == slot_idx)
        t_match, t_exists = jax.vmap(first_match)(slot_idx)   # (T, V), (T, V)
        t_match = jnp.where(t_is_leader[:, None], t_match, -1)
        t_exists = t_exists & t_is_leader[:, None]
        t_nviews = t_exists.sum(axis=1)

        update_mask = t_is_leader & (t_nviews >= 2)           # ref:927-928
        in_match_dict = t_is_leader & (t_nviews >= 1)         # 1-view: no-op (ref:929-932)

        # 4b. track rescue (config-gated deviation, docs/PARITY.md): a
        # CONFIRMED track about to die ADOPTS the ALS group of its nearest
        # detection when that detection is within `track_rescue_px`
        # reprojection distance.  Root-caused in r3
        # (scripts/fragmentation_study.py): excess deaths vs the f64 oracle
        # are NOT near-threshold ALS flips — the dying track sits 25-40 px
        # from real detections of its subject, decisively outside the
        # similarity sigmoid's useful range (sim ~ 0.1), so association can
        # never bind them and max_age=0 kills the track.  Adopting the
        # detection's whole group keeps the cross-view-consistent detection
        # set together: >= 2 adopted views -> normal update; exactly 1 ->
        # keep-alive without update (the reference's own single-view-match
        # no-op semantics, ref:929-932).  Adopted groups are continuations,
        # not new identities: they are suppressed from spawning.
        claimed_key = jnp.zeros((N,), dtype=bool)
        if cfg.track_rescue_px > 0:
            would_die = (state.active == CONFIRMED) & ~in_match_dict
            # adoptable detections: valid, and their group contains no track
            # slot (rep is the group min-index; tracks precede detections,
            # so rep >= T <=> detection-only group)
            rep_det = rep[T:]                                   # (VP,)
            adoptable = det_valid.reshape(-1) & (rep_det >= T)
            # singleton detections (no cross-view consistency) get the
            # tighter gate; multi-view groups the full one
            single_px = (cfg.track_rescue_px
                         if cfg.track_rescue_single_px is None
                         else cfg.track_rescue_single_px)
            gate_det = jnp.where(group_size[T:] >= 2,
                                 cfg.track_rescue_px, single_px)
            if use_app and app is not None:
                # appearance-consistent rescue: a dying track must not
                # adopt another person's detections just because they are
                # geometrically close (the crowd identity hazard) — the
                # same px-per-cosine penalty pushes wrong-person
                # detections beyond the rescue gate
                d23_rescue = d23 + _appearance_penalty(
                    _appearance_gain(cfg, state), state.app_ema, app)
            else:
                d23_rescue = d23
            d23f = d23_rescue.reshape(T, V * P)
            dflat = jnp.where(
                adoptable[None, :] & jnp.isfinite(d23f)
                & (d23f < gate_det[None, :]),
                d23f, jnp.inf,
            )
            best_e = jnp.argmin(dflat, axis=1).astype(jnp.int32)  # (T,)
            best_d = jnp.min(dflat, axis=1)
            cand = would_die & jnp.isfinite(best_d) & any_alive
            if cfg.track_rescue_ambiguity > 0:
                # only adopt when no OTHER live track is competitively close
                # to the same detection (raw distances, not rescue-gated):
                # crossing people put a detection near two tracks, and
                # adopting there swaps identities (docs/PERF.md r3 crowd
                # study) — while the Shelf drift case has no competitor
                dfin = jnp.where(jnp.isfinite(d23f), d23f, jnp.inf)
                m1 = jnp.min(dfin, axis=0)                        # (VP,)
                am1 = jnp.argmin(dfin, axis=0)
                t_ids = jnp.arange(T, dtype=am1.dtype)[:, None]
                m2 = jnp.min(jnp.where(t_ids == am1[None, :], jnp.inf, dfin),
                             axis=0)
                comp = jnp.where(am1[None, :] == t_ids, m2[None, :],
                                 m1[None, :])                     # (T, VP)
                comp_best = jnp.take_along_axis(
                    comp, best_e[:, None], axis=1)[:, 0]
                cand = cand & (comp_best
                               > cfg.track_rescue_ambiguity * best_d)
            best_key = rep_det[best_e]                           # (T,) global

            # slot-order allocation: one adopting track per group
            def alloc(claimed, t):
                k = best_key[t]
                ok = cand[t] & ~claimed[k]
                return claimed.at[k].set(claimed[k] | ok), ok

            claimed_key, adopt = jax.lax.scan(
                alloc, claimed_key, jnp.arange(T, dtype=jnp.int32)
            )
            a_match, a_exists = jax.vmap(first_match)(best_key)  # (T, V)
            a_exists = a_exists & adopt[:, None]
            # singleton groups have member=False: adopt the detection itself
            view_ids = jnp.arange(V, dtype=jnp.int32)
            best_v = (best_e // P).astype(jnp.int32)
            best_p = (best_e % P).astype(jnp.int32)
            single = adopt & ~a_exists.any(axis=1)
            at_best = view_ids[None, :] == best_v[:, None]
            a_match = jnp.where(single[:, None] & at_best, best_p[:, None], a_match)
            a_exists = a_exists | (single[:, None] & at_best)
            a_n = a_exists.sum(axis=1)

            t_match = jnp.where(adopt[:, None],
                                jnp.where(a_exists, a_match, -1), t_match)
            t_exists = jnp.where(adopt[:, None], a_exists, t_exists)
            update_mask = update_mask | (adopt & (a_n >= 2))
            in_match_dict = in_match_dict | adopt

        # 5. missed tracks die (ref:387-391,933-934)
        alive = state.active > 0
        missed = alive & ~in_match_dict
        dies = missed & (
            (state.active == TENTATIVE) | (state.time_since_update > cfg.max_age)
        )
        died_track_id = jnp.where(dies, state.track_id, -1)
        active_after_miss = jnp.where(dies, FREE, state.active)

        # 6. spawn leaders: detection-led groups with >= 2 views (ref:936-958);
        # groups adopted by the rescue pass are continuations, not new
        # identities — their leaders are suppressed
        e_idx = jnp.arange(N - T, dtype=jnp.int32) + T
        d_is_leader = member[T:] & (rep[T:] == e_idx) & ~claimed_key[e_idx]
        s_match_all, s_exists_all = jax.vmap(first_match)(e_idx)  # (VP, V)
        s_nviews = s_exists_all.sum(axis=1)
        spawn_ok = d_is_leader & (s_nviews >= 2)
        # only count spawns in spatial-time mode or spatial mode alike — the
        # reference spawns from `spatial_matches` in both paths
        spawn_rank = jnp.cumsum(spawn_ok.astype(jnp.int32)) - 1  # (VP,)

        free_slots = active_after_miss == FREE
        # order free slots by index: rank r -> slot index
        free_order = jnp.argsort(~free_slots, stable=True).astype(jnp.int32)  # free first
        n_free = free_slots.sum()

        # slot for each spawning leader (or -1 if out of capacity)
        leader_slot = jnp.where(
            spawn_ok & (spawn_rank < n_free), free_order[jnp.clip(spawn_rank, 0, T - 1)], -1
        )  # (VP,)

        # scatter: for each slot, which leader spawns into it (-1 none)
        slot_leader = jnp.full((T,), -1, jnp.int32)
        slot_leader = slot_leader.at[jnp.where(leader_slot >= 0, leader_slot, T)].set(
            e_idx, mode="drop"
        )
        spawned = slot_leader >= 0

        s_match = jnp.where(
            spawned[:, None],
            jnp.take(s_match_all, jnp.maximum(slot_leader - T, 0), axis=0),
            -1,
        )
        s_exists = spawned[:, None] & (s_match >= 0)

        # 7. batched IK / triangulation
        upd_obs, upd_w = _gather_obs(kps, t_match, t_exists)
        upd_w = upd_w * update_mask[:, None].astype(upd_w.dtype)
        new_obs, new_w = _gather_obs(kps, s_match, s_exists)
        new_w = new_w * spawned[:, None].astype(new_w.dtype)

        # wide rigs (cfg.ik_max_views): each track's per-frame solve (LM in
        # IK mode, refined triangulation otherwise) sees only its k
        # highest-score matched views — per-track (T, k, ...) gathers with
        # matching per-track P / K_inv rows.  Residual work scales with
        # views, so this caps the V=64 solve at k-view cost; SPAWN
        # triangulation (cold_init / tri_all) keeps all views.
        if cfg.ik_max_views is not None and cfg.ik_max_views < V:

            def topk_views(obs, w):
                score = jnp.sum(obs[..., 2], axis=-1) + w  # (T, V); 0 if unmatched
                idx = jnp.argsort(-score, axis=1, stable=True)
                idx = idx[:, : cfg.ik_max_views].astype(jnp.int32)
                obs_k = jnp.take_along_axis(obs, idx[:, :, None, None], axis=1)
                w_k = jnp.take_along_axis(w, idx, axis=1)
                return obs_k, w_k, ctx.cams.P[idx], ctx.K_inv[idx]

            upd_obs_ik, upd_w_ik, P_upd, Kinv_upd = topk_views(upd_obs, upd_w)
            new_obs_ik, new_w_ik, P_new, _ = topk_views(new_obs, new_w)
        else:
            upd_obs_ik, upd_w_ik = upd_obs, upd_w
            P_upd, Kinv_upd = ctx.cams.P, ctx.K_inv
            new_obs_ik, new_w_ik, P_new = new_obs, new_w, ctx.cams.P

        # cold init: triangulate COCO+spine observations, root = hip midpoint
        # (ref:src/inverse_kinematics.py:389-397)
        def cold_init(obs_t, w_t):
            obs18 = ik_ops.add_mid_spine(obs_t)  # (V, 18, 3)
            tri = triangulate_points(
                ctx.cams.P, ctx.K_inv, obs18, w_t > 0,
                cfg.triangulate_min_score, cfg.triangulate_refine_iters,
            )  # (18, 4)
            # degenerate 2-view matches can triangulate near infinity; keep
            # the IK init finite and inside a sane capture volume
            tri = jnp.clip(jnp.nan_to_num(tri), -100.0, 100.0)
            root = 0.5 * (tri[_LHIP, :3] + tri[_RHIP, :3])
            return tri, root

        if ctx.use_ik:
            any_update = jnp.any(update_mask)
            any_spawn = jnp.any(spawned)

            if ctx.ik_mesh is not None:
                # track slots -> devices (parallel.sharded_solvers): each
                # device LM-solves its T/n slots locally, zero collectives
                import functools

                from multiview_motion_capture_tpu.parallel.sharded_solvers import (
                    sharded_lm_solve,
                )

                solve_fn = functools.partial(
                    sharded_lm_solve, mesh=ctx.ik_mesh, axis=ctx.ik_mesh_axis
                )
            else:
                solve_fn = ik_ops.solve_two_stage

            def run_warm(_):
                init = ik_ops.IkParams(state.root, state.euler, state.side_lens)
                return solve_fn(
                    init, skel, upd_obs_ik, upd_w_ik, P_upd,
                    n_iters=cfg.ik_warm_iters, eps=cfg.ik_proj_eps,
                    lam0=cfg.ik_lm_damping_init, lam_up=cfg.ik_lm_damping_up,
                    lam_down=cfg.ik_lm_damping_down,
                    stages=cfg.ik_warm_stages,
                    solver=cfg.ik_solver, interpret=ctx.als_interpret,
                    ftol=cfg.ik_ftol, xtol=cfg.ik_xtol,
                )

            def run_cold(_):
                # cold-start triangulation lives inside the cond: it only
                # costs anything on the (rare) spawn frames
                cold_tri, cold_roots = jax.vmap(cold_init)(new_obs, new_w)
                # geometric angle init (vs the reference's zero init) cuts
                # the 50-iteration cold LM budget several-fold while
                # converging to the same optimum (quality-gated: identical
                # track structure + reprojection on the 300-frame bench)
                cold_euler = jax.vmap(lambda t: ik_ops.geometric_init(t, skel))(
                    cold_tri
                )
                init = ik_ops.IkParams(
                    root=cold_roots,
                    euler=cold_euler,
                    side_lens=jnp.broadcast_to(skel.side_bone_lens, (T, 11)),
                )
                return solve_fn(
                    init, skel, new_obs_ik, new_w_ik, P_new,
                    n_iters=cfg.ik_cold_iters, eps=cfg.ik_proj_eps,
                    lam0=cfg.ik_lm_damping_init, lam_up=cfg.ik_lm_damping_up,
                    lam_down=cfg.ik_lm_damping_down,
                    stages=cfg.ik_cold_stages,
                    solver=cfg.ik_solver, interpret=ctx.als_interpret,
                    ftol=cfg.ik_ftol, xtol=cfg.ik_xtol,
                )

            def skip(_):
                p = ik_ops.IkParams(state.root, state.euler, state.side_lens)
                return p, state.pose3d

            warm_params, warm_joints = jax.lax.cond(any_update, run_warm, skip, None)
            cold_params, cold_joints = jax.lax.cond(any_spawn, run_cold, skip, None)

            sel_u = update_mask
            sel_s = spawned
            new_root = jnp.where(sel_s[:, None], cold_params.root,
                                 jnp.where(sel_u[:, None], warm_params.root, state.root))
            new_euler = jnp.where(sel_s[:, None, None], cold_params.euler,
                                  jnp.where(sel_u[:, None, None], warm_params.euler, state.euler))
            new_side = jnp.where(sel_s[:, None], cold_params.side_lens,
                                 jnp.where(sel_u[:, None], warm_params.side_lens, state.side_lens))
            new_pose3d = jnp.where(sel_s[:, None, None], cold_joints,
                                   jnp.where(sel_u[:, None, None], warm_joints, state.pose3d))
            new_score = jnp.where((sel_s | sel_u)[:, None],
                                  jnp.ones_like(state.pose3d_score), state.pose3d_score)
        else:
            # triangulation pass-through (SURVEY.md §7.2 minimum slice);
            # updates honor the ik_max_views cap (a 64-view refined
            # triangulation per track per frame measured SLOWER than a
            # capped 16-view LM solve, docs/PERF.md)
            def tri_update(obs_t, w_t, P_t, Kinv_t):
                obs18 = ik_ops.add_mid_spine(obs_t)
                return triangulate_points(
                    P_t, Kinv_t, obs18, w_t > 0,
                    cfg.triangulate_min_score, cfg.triangulate_refine_iters,
                )

            p_ax = 0 if P_upd.ndim == 4 else None
            tri_upd = jax.vmap(tri_update, in_axes=(0, 0, p_ax, p_ax))(
                upd_obs_ik, upd_w_ik, P_upd, Kinv_upd)
            tri_all, _ = jax.vmap(cold_init)(new_obs, new_w)
            sel_u, sel_s = update_mask, spawned
            new_pose3d = jnp.where(
                sel_s[:, None, None], tri_all[..., :3],
                jnp.where(sel_u[:, None, None], tri_upd[..., :3], state.pose3d))
            new_score = jnp.where(
                sel_s[:, None], tri_all[..., 3],
                jnp.where(sel_u[:, None], tri_upd[..., 3], state.pose3d_score))
            new_root = jnp.where((sel_s | sel_u)[:, None],
                                 0.5 * (new_pose3d[:, _LHIP] + new_pose3d[:, _RHIP]),
                                 state.root)
            new_euler = state.euler
            new_side = state.side_lens

        # 7b. association-gate velocity (cfg.motion_gain): EMA of the
        # per-update ROOT delta (whole-body translation); fresh spawns start
        # at rest
        if cfg.motion_gain:
            dt = jnp.maximum(tsu, 1).astype(new_root.dtype)
            dx = (new_root - state.root) / dt[:, None]
            b = cfg.motion_vel_beta
            ema = b * dx + (1.0 - b) * state.root_vel
            new_vel = jnp.where(
                spawned[:, None], 0.0,
                jnp.where(update_mask[:, None], ema, state.root_vel))
        else:
            new_vel = state.root_vel

        # 7c. appearance EMA (cfg.appearance_dim): mean embedding of this
        # frame's matched detections folded into each track's EMA; spawns
        # initialize from their own detections.  Unit-normalized so the
        # similarity term stays a cosine.
        if use_app:
            m_match = jnp.where(spawned[:, None], s_match, t_match)  # (T, V)
            m_exists = jnp.where(spawned[:, None], s_exists, t_exists)
            safe = jnp.maximum(m_match, 0)
            app_det = jnp.take_along_axis(
                app[None], safe[:, :, None, None], axis=2
            )[:, :, 0]                                         # (T, V, D)
            wv = (m_exists
                  & (jnp.linalg.norm(app_det, axis=-1) > 1e-6)).astype(
                      app_det.dtype)                           # (T, V)
            mean_app = (app_det * wv[:, :, None]).sum(axis=1) / jnp.maximum(
                wv.sum(axis=1), 1.0)[:, None]                  # (T, D)
            has_obs_app = wv.sum(axis=1) > 0
            b_a = cfg.appearance_beta
            blended = jnp.where(
                (jnp.linalg.norm(state.app_ema, axis=-1) > 1e-6)[:, None],
                b_a * mean_app + (1.0 - b_a) * state.app_ema, mean_app)
            cand_app = jnp.where(spawned[:, None], mean_app, blended)
            cand_app = cand_app / jnp.maximum(
                jnp.linalg.norm(cand_app, axis=-1, keepdims=True), 1e-6)
            upd_app = update_mask
            if cfg.appearance_freeze_radius_m > 0:
                # ambiguity freeze (cfg.appearance_freeze_radius_m): while
                # another live track is close, the EMA keeps the last
                # unambiguous signature instead of blending in detections
                # the association itself may be misattributing
                alive_now = (active_after_miss > 0) | spawned
                dd = jnp.linalg.norm(
                    new_root[:, None] - new_root[None], axis=-1)
                other = (alive_now[:, None] & alive_now[None]
                         & ~jnp.eye(T, dtype=bool))
                near = jnp.where(other, dd, jnp.inf).min(axis=1)
                upd_app = update_mask & (
                    near >= cfg.appearance_freeze_radius_m)
            touched_app = (upd_app | spawned) & has_obs_app
            new_app = jnp.where(touched_app[:, None], cand_app,
                                jnp.where(spawned[:, None], 0.0,
                                          state.app_ema))
            # raw per-frame observation (no EMA, no freeze) for offline
            # hindsight passes — they window/aggregate it themselves
            obs_unit = mean_app / jnp.maximum(
                jnp.linalg.norm(mean_app, axis=-1, keepdims=True), 1e-6)
            emit_app = (update_mask | spawned) & has_obs_app
            app_obs_out = jnp.where(emit_app[:, None], obs_unit, 0.0)
        else:
            new_app = state.app_ema
            app_obs_out = jnp.zeros((T, 0), dtype=state.root.dtype)

        # 7d. online gain-calibration stats (cfg.appearance_auto_target_px):
        # fold this frame's matched (same-person) and claimed-by-another-
        # track (cross-person) track-vs-detection cosines into the EMA
        # stats the NEXT frame's _appearance_gain consumes.  Cross samples
        # are restricted to detections another track claimed this frame —
        # both sides then carry a firm identity belief (an unmatched
        # detection of the track's own person would otherwise pollute
        # cos_diff upward).  One-person scenes never produce cross samples,
        # so w stays 0 and the static gain applies — appearance evidence
        # is moot there anyway.
        if use_app and cfg.appearance_auto_target_px > 0:
            eps = 1e-6
            tn = jnp.linalg.norm(state.app_ema, axis=-1)          # (T,)
            dn = jnp.linalg.norm(app, axis=-1)                    # (V, P)
            cosall = jnp.einsum("td,vpd->tvp", state.app_ema, app) / (
                jnp.maximum(tn, eps)[:, None, None]
                * jnp.maximum(dn, eps)[None])
            has = ((tn > eps)[:, None, None] & (dn > eps)[None]
                   & det_valid[None])
            matched = (m_exists[:, :, None]
                       & (jnp.arange(P, dtype=jnp.int32)[None, None, :]
                          == jnp.maximum(m_match, 0)[:, :, None]))
            claimed = jnp.any(matched, axis=0)                    # (V, P)
            same_m = has & matched & (update_mask & ~spawned)[:, None, None]
            diff_m = (has & ~matched & claimed[None]
                      & ((state.active > 0) & ~spawned)[:, None, None])
            n_s = same_m.sum()
            n_d = diff_m.sum()
            mean_s = jnp.where(same_m, cosall, 0.0).sum() / jnp.maximum(n_s, 1)
            mean_d = jnp.where(diff_m, cosall, 0.0).sum() / jnp.maximum(n_d, 1)
            cs, cd, w, vs = (state.app_stats[0], state.app_stats[1],
                             state.app_stats[2], state.app_stats[3])
            b_s = cfg.appearance_auto_beta
            have_both = (n_s > 0) & (n_d > 0)
            # per-frame matched-cosine variance around the running mean:
            # the appearance NOISE the penalty amplifies (the noise-bounded
            # half of the auto-gain rule, _appearance_gain)
            ref_s = jnp.where(w > 0, cs, mean_s)
            var_s = (jnp.where(same_m, (cosall - ref_s) ** 2, 0.0).sum()
                     / jnp.maximum(n_s, 1))
            # the first contributing frame SETS the stats (w == 0); later
            # ones EMA-fold; w ramps 0 -> 1 on contributing frames only
            new_cs = jnp.where(
                have_both,
                jnp.where(w > 0, (1 - b_s) * cs + b_s * mean_s, mean_s), cs)
            new_cd = jnp.where(
                have_both,
                jnp.where(w > 0, (1 - b_s) * cd + b_s * mean_d, mean_d), cd)
            new_vs = jnp.where(
                have_both,
                jnp.where(w > 0, (1 - b_s) * vs + b_s * var_s, var_s), vs)
            new_w = jnp.where(have_both, (1.0 - b_s) * w + b_s, w)
            new_app_stats = jnp.stack([new_cs, new_cd, new_w, new_vs])
        else:
            new_app_stats = state.app_stats

        # 8. lifecycle bookkeeping
        touched = update_mask | spawned
        new_hits = jnp.where(spawned, 1, jnp.where(update_mask, state.hits + 1, state.hits))
        new_tsu = jnp.where(touched, 0, state.time_since_update)
        promoted = (active_after_miss == TENTATIVE) & update_mask & (new_hits >= cfg.n_init_hits)
        new_active = jnp.where(
            spawned, TENTATIVE, jnp.where(promoted, CONFIRMED, active_after_miss)
        )
        spawn_order = jnp.cumsum(spawned.astype(jnp.int32)) - 1
        new_ids = state.next_track_id + spawn_order
        new_track_id = jnp.where(spawned, new_ids,
                                 jnp.where(new_active > 0, state.track_id, -1))
        next_tid = state.next_track_id + spawned.sum(dtype=jnp.int32)

        new_state = TrackerState(
            active=new_active.astype(jnp.int32),
            track_id=new_track_id.astype(jnp.int32),
            hits=new_hits.astype(jnp.int32),
            time_since_update=new_tsu.astype(jnp.int32),
            root=new_root,
            euler=new_euler,
            side_lens=new_side,
            pose3d=new_pose3d,
            pose3d_score=new_score,
            root_vel=new_vel,
            app_ema=new_app,
            app_stats=new_app_stats,
            next_track_id=next_tid,
        )
        out = FrameOutput(
            track_id=new_track_id.astype(jnp.int32),
            active=new_active.astype(jnp.int32),
            updated=touched,
            spawned=spawned,
            died_track_id=died_track_id.astype(jnp.int32),
            root=new_root,
            euler=new_euler,
            side_lens=new_side,
            pose3d=new_pose3d,
            pose3d_score=new_score,
            matched_pose=jnp.where(spawned[:, None], s_match, t_match).astype(jnp.int32),
            app_obs=app_obs_out,
            als_iters=als.n_iters,
        )
        return new_state, out

    return step


# ---------------------------------------------------------------------------
# host-facing API
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Tracklet:
    """Host-side reconstructed tracklet (the reference's MvTracklet record,
    ref:src/motion_capture.py:312-400, minus live solver state)."""

    track_id: int
    frame_idxs: List[int]
    roots: np.ndarray        # (L, 3)
    eulers: np.ndarray       # (L, 18, 3)
    side_lens: np.ndarray    # (L, 11)
    poses_3d: np.ndarray     # (L, 18, 3)
    poses_score: np.ndarray  # (L, 18)
    matched_pose: np.ndarray  # (L, V)
    # per-frame matched-detection mean appearance (L, D); None when the run
    # had appearance off.  Zero rows = frames with no embedded detections.
    app: Optional[np.ndarray] = None

    def __len__(self) -> int:
        return len(self.frame_idxs)


class MvTracker:
    """Streaming-mode tracker: host loop around the jitted step."""

    def __init__(self, cams: CameraBank, cfg: PipelineConfig = None, use_ik: bool = True):
        self.cfg = cfg or PipelineConfig(n_views=cams.n_views)
        self.ctx = TrackerContext.build(cams, self.cfg, use_ik=use_ik)
        self._step = jax.jit(make_step(self.ctx))
        self.state = TrackerState.zeros(self.cfg)
        self.outputs: List[FrameOutput] = []
        self.frame_idxs: List[int] = []

    def update(self, frame_idx: int, kps: np.ndarray, valid: np.ndarray,
               app: Optional[np.ndarray] = None) -> FrameOutput:
        if self.cfg.appearance_dim > 0:
            if app is None:
                raise ValueError("cfg.appearance_dim > 0: update needs "
                                 "app=(V, P, D) detection embeddings")
            frame = (jnp.asarray(kps), jnp.asarray(valid), jnp.asarray(app))
        else:
            frame = (jnp.asarray(kps), jnp.asarray(valid))
        self.state, out = self._step(self.state, frame)
        self.outputs.append(jax.device_get(out))
        self.frame_idxs.append(frame_idx)
        return self.outputs[-1]

    def update_batch(self, frame_idxs, kps: np.ndarray, valid: np.ndarray,
                     pad_to: Optional[int] = None,
                     app: Optional[np.ndarray] = None) -> List[FrameOutput]:
        """Micro-batched streaming update: process k frames in ONE device
        dispatch (a k-length `lax.scan` of the step).

        Per-frame dispatch dominates online latency when the device is
        remote (the axon tunnel costs ~30 ms round-trip per call against
        ~4.5 ms of device work, docs/PERF.md); batching k frames amortizes
        the round-trip k-fold at k frames of added output latency.  Results
        are identical to k sequential `update` calls (the scan runs the same
        step function over the same state).

        kps: (k, V, P, K, 3); valid: (k, V, P); len(frame_idxs) == k.

        The jitted scan specializes on the chunk length.  `pad_to` fixes the
        compiled length: a shorter chunk (e.g. the sequence tail) is padded
        with inert frames that leave the state untouched (`lax.cond` skips
        the step body, so a padded tail costs ~k_real frames of device work,
        not pad_to), and only the real frames' outputs are returned.  One
        compile serves every chunk size <= pad_to — the serving path should
        always pass its steady micro-batch size here.
        """
        k = len(frame_idxs)
        assert kps.shape[0] == k and valid.shape[0] == k
        use_app = self.cfg.appearance_dim > 0
        if use_app and app is None:
            raise ValueError("cfg.appearance_dim > 0: update_batch needs "
                             "app=(k, V, P, D) detection embeddings")
        if pad_to is not None and k < pad_to:
            pad = pad_to - k
            kps = np.concatenate(
                [np.asarray(kps), np.zeros((pad,) + kps.shape[1:], kps.dtype)]
            )
            valid = np.concatenate(
                [np.asarray(valid), np.zeros((pad,) + valid.shape[1:], bool)]
            )
            if use_app:
                app = np.concatenate(
                    [np.asarray(app),
                     np.zeros((pad,) + app.shape[1:], app.dtype)]
                )
            real = np.concatenate([np.ones(k, bool), np.zeros(pad, bool)])
        elif pad_to is not None and k > pad_to:
            raise ValueError(f"chunk of {k} frames exceeds pad_to={pad_to}")
        else:
            real = np.ones(k, bool)
        fn = _cached_scan(("chunk", id(self.ctx)), self.ctx, self._build_chunk_scan)
        if use_app:
            frames = (jnp.asarray(kps), jnp.asarray(valid), jnp.asarray(app),
                      jnp.asarray(real))
        else:
            frames = (jnp.asarray(kps), jnp.asarray(valid), jnp.asarray(real))
        self.state, outs = fn(self.state, frames)
        outs = jax.device_get(outs)
        per_frame = [
            FrameOutput(*[np.asarray(getattr(outs, f))[i] for f in FrameOutput._fields])
            for i in range(k)
        ]
        self.outputs.extend(per_frame)
        self.frame_idxs.extend(int(f) for f in frame_idxs)
        return per_frame

    def _build_chunk_scan(self):
        step = make_step(self.ctx)
        n_views = self.ctx.cfg.n_views
        use_app = self.ctx.cfg.appearance_dim > 0

        def masked_step(state, frame):
            if use_app:
                kps, valid, app, real = frame
                inner = (kps, valid, app)
            else:
                kps, valid, real = frame
                inner = (kps, valid)
            # inert pad frames: the state passes through unchanged (a real
            # empty frame would age and kill live tracks)
            return jax.lax.cond(
                real,
                lambda s: step(s, inner),
                lambda s: (s, _dummy_output(s, n_views)),
                state,
            )

        @jax.jit
        def scan_chunk(state, frames):
            return jax.lax.scan(masked_step, state, frames)

        return scan_chunk

    def tracklets(self) -> List[Tracklet]:
        if not self.outputs:
            return []
        stacked = FrameOutput(*[np.stack([np.asarray(getattr(o, f)) for o in self.outputs])
                                for f in FrameOutput._fields])
        return assemble_tracklets(stacked, self.frame_idxs)


def _dummy_output(state: TrackerState, n_views: int) -> FrameOutput:
    """Placeholder FrameOutput for an inert pad frame (discarded on host)."""
    T = state.active.shape[0]
    return FrameOutput(
        track_id=state.track_id,
        active=state.active,
        updated=jnp.zeros((T,), bool),
        spawned=jnp.zeros((T,), bool),
        died_track_id=jnp.full((T,), -1, jnp.int32),
        root=state.root,
        euler=state.euler,
        side_lens=state.side_lens,
        pose3d=state.pose3d,
        pose3d_score=state.pose3d_score,
        matched_pose=jnp.full((T, n_views), -1, jnp.int32),
        app_obs=jnp.zeros_like(state.app_ema),
        als_iters=jnp.asarray(0, jnp.int32),
    )


# id(ctx) -> (ctx, fn).  The strong reference to ctx in the value is what
# makes the id() key safe: while an entry lives, its context cannot be
# garbage-collected, so no *different* context can be allocated at the same
# address.  The identity check on retrieval guards the eviction race (an
# entry evicted and its address reused between calls).
_SCAN_CACHE: dict = {}


def _cached_scan(key, ctx: TrackerContext, build):
    entry = _SCAN_CACHE.get(key)
    if entry is not None and entry[0] is ctx:
        return entry[1]
    fn = build()
    _SCAN_CACHE[key] = (ctx, fn)
    if len(_SCAN_CACHE) > 64:  # bound growth across many contexts
        _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)))
    return fn


def _scan_fn(ctx: TrackerContext):
    """Per-context cached jitted whole-sequence scan: rebuilding the closure
    per call would force a full retrace/lowering every time (measured ~3s of
    host time per 300-frame run against 1.4s of device time)."""

    def build():
        step = make_step(ctx)

        if ctx.cfg.appearance_dim > 0:

            @jax.jit
            def scan_all(kps, valid, app):
                state0 = TrackerState.zeros(ctx.cfg)
                return jax.lax.scan(step, state0, (kps, valid, app))

        else:

            @jax.jit
            def scan_all(kps, valid):
                state0 = TrackerState.zeros(ctx.cfg)
                return jax.lax.scan(step, state0, (kps, valid))

        return scan_all

    return _cached_scan(id(ctx), ctx, build)


def run_offline(
    ctx: TrackerContext, kps: Array, valid: Array,
    frame_idxs: Optional[np.ndarray] = None,
    app: Optional[Array] = None,
) -> Tuple[TrackerState, FrameOutput]:
    """Whole-sequence tracking as ONE device call: `lax.scan` of the step
    over all frames (the TPU-native replacement for the reference's Python
    while-loop, ref:src/motion_capture.py:1062-1116).

    `app` (F, V, P, appearance_dim) per-detection appearance embeddings —
    required iff the context's config has appearance_dim > 0."""
    if ctx.cfg.appearance_dim > 0:
        if app is None:
            raise ValueError(
                "cfg.appearance_dim > 0: run_offline needs per-detection "
                "appearance embeddings (app=(F, V, P, D))")
        return _scan_fn(ctx)(kps, valid, jnp.asarray(app))
    return _scan_fn(ctx)(kps, valid)


# NOTE: a `run_offline_batched` mode (B sequences through one vmapped scan)
# shipped in r1 and was rebuilt in r2 around a merged cold+warm solve; it
# was removed after measurement: B=4 identical Shelf streams reached 155
# aggregate fps against 518 fps from simply scanning the streams one after
# another (vmap forces every stream to pay the slowest stream's association
# and LM iteration counts each frame, and the fused ALS kernel cannot batch
# its SMEM scalar output).  On one chip, sequential `run_offline` IS the
# serving mode; across chips, map sequences to devices and run it per
# device (docs/PERF.md).


def assemble_tracklets(out: FrameOutput, frame_idxs=None) -> List[Tracklet]:
    """Reconstruct per-track histories from stacked per-frame emissions."""
    F, T = np.asarray(out.track_id).shape
    if frame_idxs is None:
        frame_idxs = list(range(F))
    app_arr = np.asarray(out.app_obs)
    has_app = app_arr.size and app_arr.shape[-1] > 0
    tracks = {}
    for f in range(F):
        for t in range(T):
            if not bool(np.asarray(out.updated)[f, t]):
                continue
            tid = int(np.asarray(out.track_id)[f, t])
            if tid < 0:
                continue
            rec = tracks.setdefault(tid, {
                "frames": [], "roots": [], "eulers": [], "sides": [],
                "poses": [], "scores": [], "matched": [], "app": [],
            })
            rec["frames"].append(frame_idxs[f])
            rec["roots"].append(np.asarray(out.root)[f, t])
            rec["eulers"].append(np.asarray(out.euler)[f, t])
            rec["sides"].append(np.asarray(out.side_lens)[f, t])
            rec["poses"].append(np.asarray(out.pose3d)[f, t])
            rec["scores"].append(np.asarray(out.pose3d_score)[f, t])
            rec["matched"].append(np.asarray(out.matched_pose)[f, t])
            if has_app:
                rec["app"].append(app_arr[f, t])

    tlets = [
        Tracklet(
            track_id=tid,
            frame_idxs=rec["frames"],
            roots=np.stack(rec["roots"]),
            eulers=np.stack(rec["eulers"]),
            side_lens=np.stack(rec["sides"]),
            poses_3d=np.stack(rec["poses"]),
            poses_score=np.stack(rec["scores"]),
            matched_pose=np.stack(rec["matched"]),
            app=np.stack(rec["app"]) if has_app else None,
        )
        for tid, rec in tracks.items()
    ]
    # sorted by descending length (ref:src/motion_capture.py:1120-1121)
    return sorted(tlets, key=lambda t: -len(t))
