"""Typed configuration for the whole pipeline.

Every hard-coded constant that is buried at call sites in the reference is
captured here with its provenance, so parity runs use the defaults and scaled
runs override them (SURVEY.md §5 "config/flag system").
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # ---- static capacities (TPU shapes; new design, no reference analogue) --
    n_views: int = 5            # cameras
    max_people: int = 10        # detections per view (padded)
    max_tracks: int = 16        # live tracklet slots
    n_kps: int = 17             # COCO detections
    dtype: str = "float32"

    # ---- in-loop detection (CLI `detect`; no reference analogue — the
    # reference shells out to OpenPose, run_openpose.sh:10) -----------------
    # center-peak NMS window (heatmap px) for the bottom-up decode.  5 is
    # right for sparse scenes; packed crowds put 21-24% of GT center pairs
    # under 3 heatmap px, where a 5-window suppresses real people — the
    # crowd study measured recall 0.838 -> 0.882 (10 packed people) and
    # 0.891 -> 0.938 (8) going 5 -> 3 at equal precision (docs/PERF.md r5).
    detect_nms_window: int = 5

    # ---- detection filtering (ref:src/motion_capture.py:1023-1043,1091) ----
    filter_min_kps_score: float = 0.01  # a keypoint is valid above this score
    filter_min_valid_kps: int = 4       # poses need at least this many valid kps
    filter_min_bbox_px: float = 5.0     # min bbox side over valid kps

    # ---- affinity / association --------------------------------------------
    # spatial path (ref:src/mv_math_util.py:320-351)
    spatial_fill_distance: float = 50.0
    affinity_sigmoid_scale: float = 5.0
    # spatial-time path (ref:src/motion_capture.py:742-756)
    st_norm_mean: float = 15.0
    st_norm_std: float = 30.0
    st_sim_floor: float = 1e-3
    # epipolar / reprojection validity gates
    epipolar_min_kps_score: float = 0.1   # ref:src/motion_capture.py:694-696
    reproj_min_kps_score: float = 0.1     # ref:src/motion_capture.py:714
    # match binarization (ref:src/motion_capture.py:417-419)
    match_support_threshold: float = 1.9

    # ---- ALS multi-way matching (ref:src/mv_association.py:222-318) --------
    als_alpha: float = 50.0
    als_beta: float = 0.1
    als_mu: float = 64.0
    als_tol: float = 1e-4
    als_max_iter: int = 1000
    als_rank_factor: int = 2   # maxRank = rank_factor * max people per group
    # practical early exit: stop when the binarized match matrix is unchanged
    # for this many iterations (0 = reference's residual-only test, which in
    # practice runs all 1000 iterations; see ops/association.py)
    als_stable_iters: int = 15
    # "auto": fused Pallas kernel on TPU (when the matrix fits MAX_PAD=384,
    # i.e. up to a ~32-cam x 10-people rig), XLA while-loop elsewhere; or
    # force "xla" / "pallas"
    als_backend: str = "auto"
    # ---- hierarchical association (rigs beyond the N=384 fused-ALS reach) --
    # > 1 partitions the cameras into this many INTERLEAVED clusters
    # (cluster c = views c, c+C, c+2C, ...): on a ring rig every cluster
    # then spans the full angular range, keeping wide baselines inside each
    # cluster.  (Contiguous sections were measured to merge depth-aligned
    # people — adjacent views cannot separate two people along the
    # section's depth axis; see tracker._clustered_association.)  Each
    # cluster solves its own [tracklets | its views] ALS (each small enough
    # for the fused kernel), and the per-cluster binarized matches are
    # synthesized into one global match matrix.  Tracklets appear in EVERY
    # cluster matrix, so a tracked person's cross-cluster identity merges
    # through its tracklet in the transitive closure; NEW people (no
    # tracklet yet) are merged across clusters by triangulated-centroid
    # proximity (`cluster_merge_m`).  1 = monolithic (reference semantics).
    assoc_clusters: int = 1
    cluster_merge_m: float = 0.35  # cross-cluster new-person merge radius (m)

    # ---- triangulation (ref:src/mv_math_util.py:152-212) -------------------
    triangulate_min_score: float = 0.01
    triangulate_refine_iters: int = 2

    # ---- tracker lifecycle (ref:src/motion_capture.py:319-320) -------------
    n_init_hits: int = 3   # Tentative -> Confirmed
    max_age: int = 0       # missed frames before death
    # track rescue (deviation, off = strict reference semantics): a CONFIRMED
    # track that would die reclaims unclaimed detections within this
    # reprojection distance (px) in >= 2 views instead of dying.
    # Root-caused in r3: the tracker's excess fragments vs the f64 oracle are
    # tracks sitting 25-40 px from their subject's real detections —
    # decisively outside the similarity sigmoid's range, nothing ALS-level
    # can bind them (scripts/fragmentation_study.py, docs/PARITY.md).
    # Default ON (Shelf: 36 -> 27 fragments on the default capacities,
    # median reprojection 6.6 -> 6.48 px, synthetic IDF1 +0.004 and -4 ID
    # switches); set 0.0 for strict reference-lifecycle replication.
    track_rescue_px: float = 40.0
    # gate for adopting a SINGLETON detection (1-view keep-alive, no update):
    # a lone detection has no cross-view consistency check, so it gets a
    # tighter gate than a multi-view group.  None = same as track_rescue_px.
    track_rescue_single_px: Optional[float] = 25.0
    # ambiguity guard: a dying track adopts a detection only when the
    # NEXT-closest live track is at least this factor farther from it (and
    # beyond the rescue gate's reach is always unambiguous).  In crowds a
    # crossing person's detections sit close to two tracks — adopting there
    # is what turned rescue into an identity hazard (10x10 synthetic: re-ID
    # IDF1 0.707 -> 0.529 with an unguarded rescue; the guard restores it,
    # docs/PERF.md).  Shelf's rescue case — a drifting track 25-40 px from
    # its subject with no competitor nearby — passes untouched.  0 disables.
    track_rescue_ambiguity: float = 1.5

    # ---- appearance evidence in association (new; no reference analogue) ---
    # > 0 enables per-detection appearance embeddings in the tracker: the
    # step consumes an extra (V, P, appearance_dim) unit-vector input, every
    # track carries an EMA appearance vector, and the 2D-3D similarity block
    # (track -> detection) pays `appearance_gain_px` pixels of distance per
    # unit cosine distance between them.  This targets the crossing-instant
    # association ambiguity that geometry cannot resolve (two people inside
    # one reprojection gate -> in-fragment identity switches, docs/PERF.md
    # r3 crowd study); the rescue pass and reprojection metrics keep using
    # the raw geometric distances.  0 = reference semantics (geometry only).
    appearance_dim: int = 0
    # px of similarity distance per unit cosine distance, applied to the
    # 2D-3D (track->detection) and 2D-2D (cross-view grouping) blocks of the
    # spatial-time matrix AND to the spatial-only matrix (first frame /
    # total-loss re-acquisition; there the z-stats stay geometric-only so
    # the penalty cannot dilute its own scale — tracker._spatial_similarity).
    # CALIBRATE TO THE EMBEDDING SOURCE: discrimination needs roughly
    # gain * (cos_same - cos_diff) ~ 8 px while gain * (1 - cos_same)
    # stays small.  Oracle-grade embeddings (cross-person cos ~0): 20 ->
    # 10x10 crowd IDsw 131 -> 3, IDF1 0.997.  Extractor-grade (the
    # keypoint-color-layout descriptor: cos_same 0.97 / cos_diff 0.83):
    # ~60 -> emulated crowd IDF1 0.996; 20 is too weak there and 140
    # over-penalizes true matches (docs/PERF.md r4 sweeps).
    appearance_gain_px: float = 20.0
    appearance_beta: float = 0.5       # per-update EMA factor
    # > 0 enables ONLINE GAIN AUTO-CALIBRATION, replacing the static
    # appearance_gain_px once the tracker has seen enough evidence: the
    # state carries EMA estimates of the matched (same-person) and
    # non-matched (cross-person) track-vs-detection cosines, and the
    # effective gain becomes target_px / (cos_same - cos_diff) — i.e. "a
    # true-vs-false appearance swap is worth `target_px` pixels", whatever
    # the embedding source's absolute cosine scale is.  This removes the
    # calibrate-to-extractor footgun above (oracle needs ~20, the
    # color-layout descriptor ~60).  Safety property: a signal-free
    # extractor (gap < appearance_auto_min_gap) drives the gain to ZERO —
    # useless embeddings self-disable instead of injecting noise.  During
    # warm-up (stat weight < 0.5, ~7 matched frames at beta 0.1) the static
    # gain applies.  The gain consumed at frame f uses stats through f-1.
    appearance_auto_target_px: float = 0.0
    # noise cap on the auto gain: gain * EMA-std(matched cosine) stays
    # below this many px (r5).  The per-extractor hand-tuned gains were
    # really encoding THIS quantity — the raw color-layout descriptor's
    # tuned 60 is 3 px / sigma 0.046 almost exactly (docs/PERF.md r5
    # auto-gain study); the discrimination target alone over-drives noisy
    # extractors (raw at target 8 -> gain 99).  <= 0 disables the cap.
    appearance_auto_noise_px: float = 3.0
    appearance_auto_beta: float = 0.10     # EMA factor for the cosine stats
    appearance_auto_max_px: float = 200.0  # gain clamp (tiny-gap blowup)
    appearance_auto_min_gap: float = 0.02  # below this: no signal -> gain 0
    # > 0 FREEZES a track's appearance EMA while any other live track's root
    # is within this many meters (r5, VERDICT r4 next #2).  Rationale: the
    # measured crowd switch structure is OSCILLATION — two people walking
    # together for tens of frames while one track ping-pongs between their
    # detections (10x10 study: 43 of 69 in-tracklet identity changes are
    # <5-frame flickers inside such stretches).  The per-update EMA then
    # blends both identities and stops discriminating exactly when the
    # appearance penalty is needed; holding the last unambiguous signature
    # through the encounter keeps the penalty pointed at the right person.
    # Spawns still initialize from their own detections.  0 disables.
    appearance_freeze_radius_m: float = 0.0

    # ---- crowd-density preset safety (new; no reference analogue) ----------
    # pipeline.run warns when the mean number of concurrently CONFIRMED
    # tracks reaches this while track rescue is active: rescue is a
    # sparse-scene remedy and a measured identity hazard in crowds (re-ID
    # IDF1 0.707 -> 0.546 on the 10x10 synthetic, docs/PERF.md r3 study).
    # Threshold provenance: Shelf — the sparse case rescue was built for —
    # runs ~4 concurrent tracks; the 10x10 hazard case runs ~9-10.  0
    # disables the warning.
    density_warn_tracks: float = 6.0

    # ---- motion-predicted association (new; no reference analogue) ---------
    # Constant-velocity prediction of each track's 3D pose inside the
    # track->detection reprojection gate: d23 is measured from
    # pose3d + motion_gain * time_since_update * vel instead of the last
    # pose.  0.0 = reference semantics (gate on the last pose, which is
    # ambiguous when two people cross — the source of in-fragment identity
    # switches at scale, docs/PERF.md r3 identity study).  The velocity
    # estimate is an EMA of the per-update pose delta (motion_vel_beta);
    # it only biases the ASSOCIATION gate — poses themselves are still
    # solved from the raw detections, so reprojection quality is untouched.
    motion_gain: float = 0.0
    motion_vel_beta: float = 0.5

    # ---- inverse kinematics (ref:src/inverse_kinematics.py:389-407) --------
    ik_cold_iters: int = 50
    ik_warm_iters: int = 5
    ik_proj_eps: float = 1e-5      # divide guard (ref:src/inverse_kinematics.py:229)
    ik_lm_damping_init: float = 1e-3
    ik_lm_damping_up: float = 10.0
    ik_lm_damping_down: float = 0.33
    # warm-start solves: 2 = reference's pose-then-bone-lengths schedule,
    # 1 = single all-parameter stage (same optimum, half the solver cost)
    ik_warm_stages: int = 2
    # cold (spawn) solves: 2 = the reference's staged schedule
    # (ref:src/inverse_kinematics.py:402-407) — required for ZERO-init
    # angles, where the joint pose must settle before bone lengths unlock;
    # 1 = single all-parameter solve.  This tracker cold-starts from the
    # GEOMETRIC init (ik.geometric_init), which may make the staged warmup
    # redundant (VERDICT r3 next #1a); quality-gate before switching.
    ik_cold_stages: int = 2
    # LM early-exit tolerances (relative cost decrease / step size).  The
    # f32 defaults are near the roundoff floor; wide rigs whose LM whiles
    # dominate the profile can trade tail iterations for throughput here
    # (association is binarized and the pose tail is sub-0.1px — verify
    # with the bench quality gate).
    ik_ftol: float = 2e-6
    ik_xtol: float = 1e-6
    # LM linear solver: "chol" (batched Cholesky via vmap), "gj" (fused
    # Pallas Gauss-Jordan over all slots in one kernel), or "gj_fused"
    # (additionally fuses the JtJ/g normal-equation assembly into the same
    # kernel — one J read per LM iteration).  gj_fused measured a slight
    # NEGATIVE vs gj on the TPU at wide-rig shapes (126.1 vs 126.7 /
    # 165.1 vs 170.7 fps, docs/PERF.md r4 sweep): XLA already keeps the
    # (T,512,68) JtJ matmuls fused with the ridge add.  Kept as an option;
    # no preset selects it.
    ik_solver: str = "chol"
    # Wide rigs: solve each track's IK against only its `ik_max_views`
    # highest-score matched views (per-track static gather; LM residual work
    # scales linearly with views, and past ~12 well-placed cameras extra
    # views add no constraint the solve needs).  None = all views (reference
    # semantics — the reference never runs rigs this wide).
    ik_max_views: Optional[int] = None

    # ---- run-mode driver (ref:src/motion_capture.py:1058-1060) -------------
    max_frames: Optional[int] = 300

    # ---- output post-filter (new; no reference analogue) -------------------
    # drop output tracklets shorter than this many frames, plus any tracklet
    # whose poses are entirely non-finite (degenerate 2-view ghosts).  1 =
    # keep everything, reproducing the reference's raw fragment output.
    min_track_length: int = 1

    @classmethod
    def parity(cls, **overrides) -> "PipelineConfig":
        """Strict reference-lifecycle preset (VERDICT r4 weak #2).

        `PipelineConfig()` is the recommended DEFAULT, which carries one
        documented deviation: track rescue (`track_rescue_px=40`).  This
        preset pins rescue OFF — the exact config the parity study
        (scripts/parity_study.py, docs/PARITY.md) validates against the
        float64 scipy oracle of the reference's semantics — so a user
        comparing output against the reference gets reference lifecycle
        behavior, not the deviation.  Everything else in the defaults is
        either reference-exact or verified output-identical on Shelf
        (als_stable_iters=15's early exit, docs/PERF.md).
        """
        base = dict(track_rescue_px=0.0, track_rescue_single_px=None)
        base.update(overrides)
        return cls(**base)

    @classmethod
    def fast(cls, **overrides) -> "PipelineConfig":
        """Non-parity speed preset.

        Identical to the SHELF_BENCH capacities (max_people=6, max_tracks=8,
        single-stage warm IK, fused GJ solver) except `als_stable_iters=6`:
        the ALS early-exit fires after 6 unchanged binarizations instead of
        SHELF_BENCH's 10 (the full-parity default is 15).  The reference's
        residual-only convergence test effectively runs all 1000 iterations
        (ref:src/mv_association.py:261,275), so ANY early exit is a
        deviation; 10 reproduces the parity run bit-exactly on Shelf, 6
        perturbs near-threshold association on ~1 frame in 300 (35 vs 34
        fragments, one fragment boundary moves; same long tracks, median
        reprojection unchanged at 6.45 px — see
        tests/test_tracker.py::test_fast_preset_consistency).  Use when
        throughput matters more than bit-parity with the reference schedule.
        """
        base = dict(
            max_people=6,
            max_tracks=8,
            als_max_iter=100,
            als_stable_iters=6,
            ik_warm_stages=1,
            ik_cold_stages=1,
            ik_solver="gj",
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def wide(cls, n_views: int, **overrides) -> "PipelineConfig":
        """Throughput preset for wide rigs (16+ well-placed cameras).

        Packages the r4 TPU-measured wide-rig IK levers (docs/PERF.md r4
        sweep, 64 cam x 10 ppl): merged cold schedule + 3-iteration warm
        budget + 16-view IK cap -> 64-cam full IK 126.7 -> 170.7 fps with
        association bit-identical and crowd quality neutral (36 tracklets /
        8 long / 0.8621 m vs 37/8/0.8611 at the default budget, CPU quality
        study).  Past the fused-ALS kernel's N=384 ceiling the association
        switches to hierarchical interleaved camera clusters (2 clusters
        from 48 cameras up).  The warm-budget cut is wide-rig-ONLY: Shelf
        (5 cameras, real detections) fragments already at warm 4 — do not
        use this preset on narrow rigs.
        """
        base = dict(
            n_views=n_views,
            als_max_iter=100,
            ik_warm_stages=1,
            ik_solver="gj",
            ik_cold_stages=1,
            ik_warm_iters=3,
            ik_max_views=16,
            assoc_clusters=2 if n_views >= 48 else 1,
        )
        base.update(overrides)
        return cls(**base)

    @classmethod
    def crowded(cls, **overrides) -> "PipelineConfig":
        """Identity-first preset for dense multi-person scenes.

        Track rescue OFF: rescue is a sparse-scene remedy — a dying track in
        a crowd has usually drifted onto *another* person, and adopting that
        person's detections swaps identities mid-fragment, which the offline
        re-ID relabeling can never repair.  Measured on the 10x10 synthetic
        crowd (docs/PERF.md r3 study): re-ID IDF1 0.707 with rescue off vs
        0.546 with the default rescue on (ambiguity guards at 1.5/3/6 only
        recover 0.546/0.573/0.611).  Fragmentation is higher (84 vs 76 raw
        fragments) but fragments are MERGEABLE by re-ID; impure fragments
        are not.  Use the defaults for sparse scenes (Shelf: rescue closes
        36-vs-23 oracle fragmentation to 27 with no identity cost).

        Also tightens the bottom-up decode's center NMS window to 3 heatmap
        px (`detect_nms_window`): packed crowds put 21-24% of GT center
        pairs under 3 heatmap px, where the sparse-scene 5-window
        suppresses real people (crowd recall 0.838 -> 0.882 at 10 packed,
        docs/PERF.md r5).
        """
        base = dict(track_rescue_px=0.0, detect_nms_window=3)
        base.update(overrides)
        return cls(**base)

    @property
    def n_obs_kps(self) -> int:
        """Detections + synthetic mid-spine appended for IK."""
        return self.n_kps + 1

    @property
    def n_matrix(self) -> int:
        """Static side of the spatial-time association matrix."""
        return self.max_tracks + self.n_views * self.max_people

    @property
    def als_max_rank(self) -> int:
        return min(self.n_matrix, self.als_rank_factor * max(self.max_tracks, self.max_people))


SHELF = PipelineConfig()

# Shelf-sized static capacities (measured: <= 6 detections/view after
# filtering, ~4 concurrent tracks): smaller padded shapes make the
# latency-bound association/IK kernels proportionally faster on TPU.
# ALS capped at 100 iterations — verified output-identical to the 1000-iter
# reference schedule on all 300 Shelf frames (see docs/PERF.md).
SHELF_BENCH = PipelineConfig(
    max_people=6,
    max_tracks=8,
    als_max_iter=100,
    als_stable_iters=10,
    ik_warm_stages=1,
    # merged cold schedule: quality BETTER on Shelf than the reference's
    # staged warmup (22 vs 25 fragments, mean reproj 9.62 vs 10.73 px —
    # the geometric init makes stage 1 redundant; docs/PERF.md r4 study).
    # The parity default (PipelineConfig()) keeps the staged schedule.
    ik_cold_stages=1,
    ik_solver="gj",
)
