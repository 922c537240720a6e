"""End-to-end pipeline drivers: prepare / run / evaluate.

The reference's `run_main` loop (ref:src/motion_capture.py:1046-1129) becomes:
  prepare: OpenPose JSON -> packed npz (data.ingest)
  run:     one `lax.scan` over the whole packed sequence on device
           (tracker.run_offline), or a streaming host loop (tracker.MvTracker)
  output:  tracklets pickle {"tracklets": [...]} sorted by length
           (ref:motion_capture.py:1120-1129) + optional BVH export per track.
"""
from __future__ import annotations

import dataclasses
import pickle
import time
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multiview_motion_capture_tpu.cameras import CameraBank
from multiview_motion_capture_tpu.config import PipelineConfig
from multiview_motion_capture_tpu.data.ingest import (
    FrameBatch,
    filter_bad_poses,
    load_openpose_dir,
    save_frame_batch,
)
from multiview_motion_capture_tpu.tracker import (
    Tracklet,
    TrackerContext,
    assemble_tracklets,
    run_offline,
)
from multiview_motion_capture_tpu.utils.profiling import StageTimer


@dataclasses.dataclass
class RunResult:
    tracklets: List[Tracklet]
    n_frames: int
    wall_time_s: float
    track_time_s: float
    timings: dict
    # mean concurrent CONFIRMED tracks over the run (density diagnostic;
    # feeds the crowd-preset safety warning)
    mean_concurrent_tracks: float = 0.0

    @property
    def fps(self) -> float:
        return self.n_frames / max(self.track_time_s, 1e-9)


def _density_guard(cfg: PipelineConfig, host_out) -> float:
    """Crowd-density preset safety (r3 identity study, docs/PERF.md): track
    rescue — ON by default because it repairs Shelf-style sparse-scene
    fragmentation — becomes an IDENTITY HAZARD in crowds (10x10 synthetic:
    re-ID IDF1 0.707 with rescue off vs 0.546 with it on; a dying track in
    a crowd has usually drifted onto ANOTHER person, and adopting that
    person's detections swaps identities mid-fragment, which no offline
    relabeling can repair).  Nothing in the input declares density, so the
    run itself is the detector: when the mean number of concurrently
    CONFIRMED tracks reaches `cfg.density_warn_tracks` with rescue active, a
    prominent warning recommends `PipelineConfig.crowded()`.

    Returns the mean concurrent confirmed-track count (RunResult diagnostic).
    """
    active = np.asarray(host_out.active)  # (F, T)
    if active.size == 0:
        return 0.0
    mean_conc = float((active == 2).sum(axis=1).mean())
    # appearance-enabled runs are exempt: the rescue pass is then
    # appearance-gated (wrong-person detections are pushed beyond the
    # rescue gate), measured to neutralize the crowd hazard entirely
    # (rescue on == rescue off at re-ID IDF1 0.996 on the 8-person crowd,
    # docs/PERF.md r4)
    if (cfg.track_rescue_px > 0 and cfg.density_warn_tracks > 0
            and cfg.appearance_dim == 0
            and mean_conc >= cfg.density_warn_tracks):
        import warnings

        warnings.warn(
            f"Dense scene: {mean_conc:.1f} concurrent confirmed tracks on "
            f"average (threshold {cfg.density_warn_tracks:g}) with track "
            f"rescue ACTIVE (track_rescue_px="
            f"{cfg.track_rescue_px:g}).  In crowds, rescue adoption swaps "
            "identities mid-fragment (measured re-ID IDF1 0.707 -> 0.546 on "
            "a 10x10 synthetic crowd, docs/PERF.md).  Use "
            "PipelineConfig.crowded() (rescue off, identity-first) for "
            "dense scenes, or set density_warn_tracks=0 to silence this.",
            stacklevel=3,
        )
    return mean_conc


def prepare(kps_dir: Path, out_path: Path, cfg: Optional[PipelineConfig] = None,
            max_frames: Optional[int] = None) -> FrameBatch:
    """prepare mode: parse OpenPose JSON into the packed npz
    (ref:src/motion_capture.py:987-1005)."""
    cfg = cfg or PipelineConfig()
    batch = load_openpose_dir(Path(kps_dir), cfg, max_frames=max_frames)
    save_frame_batch(Path(out_path), batch)
    return batch


def run(
    batch: FrameBatch,
    cams: CameraBank,
    cfg: Optional[PipelineConfig] = None,
    use_ik: bool = True,
    skip_first_frame: bool = False,
    checkpoint_dir: Optional[Path] = None,
    checkpoint_every: int = 100,
    reid: bool = False,
    reid_cfg=None,
    app: Optional[np.ndarray] = None,
    crossings: bool = False,
    crossings_cfg=None,
    mesh_spec=None,
) -> RunResult:
    """run mode: filter detections, track + solve the whole sequence.

    `skip_first_frame` replicates the reference's off-by-one (frm_idx starts
    at 1, ref:src/motion_capture.py:1058-1063) for strict parity runs; the
    default processes every frame.

    `reid=True` runs the offline tracklet re-identification merge pass
    (reid.merge_tracklets): fragments killed by the reference's `max_age=0`
    lifecycle are re-joined by bone-length + trajectory identity evidence.
    Off by default so parity runs reproduce the reference's fragmentation.

    `mesh_spec` (a `parallel.mesh.MeshSpec` or its string form, e.g.
    ``"cameras=4,clusters=8,tracks=8"``) shards the tracker's stages over
    the visible device mesh — camera-sharded similarity, cluster-sharded
    ALS, track-sharded LM IK, composable in one context (multi-chip path;
    certified on the virtual mesh by `__graft_entry__.dryrun_multichip`).

    With `checkpoint_dir`, the scan runs in `checkpoint_every`-frame chunks,
    persisting tracker state + emissions after each; an interrupted run
    resumes from the last completed chunk (the reference has no mid-run
    persistence at all, SURVEY.md §5).

    A "two-pass" mode (track on triangulated poses, then one giant batched
    IK over every (tracklet, frame) pair) shipped in r1 to cut sequential
    depth; it was removed in r2 after measuring 25 fps against the scanned
    single pass's 518 fps — the batched while_loop runs until the slowest
    of 2400 solves converges, and the premise (that the scan's sequential
    depth was the bottleneck) stopped being true once the scan hit 500+ fps.
    """
    def _post(tracklets: List[Tracklet]) -> List[Tracklet]:
        if crossings:
            # hindsight crossing repair BEFORE the fragment merge: the cut
            # stage needs the raw contiguous tracklets, and its output is
            # identity-pure PIECES that only become useful once the
            # appearance-aware merge reassembles them — so crossings
            # IMPLIES the reid merge (docs/PERF.md r5 cuts-beat-swaps)
            from multiview_motion_capture_tpu.crossings import resolve_crossings

            tracklets = resolve_crossings(tracklets, crossings_cfg)
        if reid or crossings:
            from multiview_motion_capture_tpu.reid import merge_tracklets

            tracklets = merge_tracklets(tracklets, reid_cfg)
        return filter_ghost_tracklets(tracklets, cfg.min_track_length)
    cfg = cfg or PipelineConfig(n_views=batch.n_views)
    timer = StageTimer()

    with timer.stage("filter"):
        batch = filter_bad_poses(batch, cfg)

    start = 0
    frame_idxs = np.arange(batch.n_frames)
    if skip_first_frame:
        start = 1
    if cfg.max_frames is not None:
        end = min(batch.n_frames, start + cfg.max_frames)
    else:
        end = batch.n_frames
    kps = jnp.asarray(batch.kps[start:end])
    valid = jnp.asarray(batch.valid[start:end])
    frame_idxs = frame_idxs[start:end]
    if cfg.appearance_dim > 0:
        if app is None:
            raise ValueError("cfg.appearance_dim > 0: run() needs "
                             "app=(F, V, P, D) detection embeddings")
        app_arr = jnp.asarray(np.asarray(app)[start:end])
    else:
        app_arr = None

    mesh_kwargs = {}
    if mesh_spec is not None:
        from multiview_motion_capture_tpu.parallel.mesh import MeshSpec

        if isinstance(mesh_spec, str):
            mesh_spec = MeshSpec.parse(mesh_spec)
        mesh_kwargs = mesh_spec.context_kwargs()

    with timer.stage("build_context"):
        ctx = TrackerContext.build(cams, cfg, use_ik=use_ik, **mesh_kwargs)

    if checkpoint_dir is not None:
        from multiview_motion_capture_tpu.utils import checkpoint as ckpt
        from multiview_motion_capture_tpu.tracker import TrackerState, make_step

        step = make_step(ctx)

        @jax.jit
        def scan_chunk(state, frames):
            return jax.lax.scan(step, state, frames)

        info = ckpt.resume_info(checkpoint_dir)
        n = int(end - start)
        n_chunks = (n + checkpoint_every - 1) // checkpoint_every
        first_chunk = 0
        state = TrackerState.zeros(cfg)
        if info is not None:
            first_chunk = info["last_chunk"] + 1
            state = ckpt.load_state(checkpoint_dir, info["last_chunk"])
        t0 = time.perf_counter()
        t1 = time.perf_counter()
        with timer.stage("compile+track"):
            for c in range(first_chunk, n_chunks):
                s = c * checkpoint_every
                e = min(n, s + checkpoint_every)
                frames = ((kps[s:e], valid[s:e], app_arr[s:e])
                          if app_arr is not None else (kps[s:e], valid[s:e]))
                state, outs = scan_chunk(state, frames)
                jax.block_until_ready(outs.pose3d)
                ckpt.save_chunk(checkpoint_dir, c, e, state, jax.device_get(outs))
        track_time = time.perf_counter() - t1
        with timer.stage("assemble"):
            host_out = ckpt.concat_outputs(ckpt.load_outputs(checkpoint_dir, n_chunks - 1))
            tracklets = _post(assemble_tracklets(host_out, list(frame_idxs)))
        return RunResult(
            tracklets=tracklets,
            n_frames=int(end - start),
            wall_time_s=time.perf_counter() - t0,
            track_time_s=track_time,
            timings=timer.summary(),
            mean_concurrent_tracks=_density_guard(cfg, host_out),
        )

    t0 = time.perf_counter()
    with timer.stage("compile+track"):
        state, outputs = run_offline(ctx, kps, valid, app=app_arr)
        jax.block_until_ready(outputs.pose3d)
    # timed run excludes compilation: scan again for the steady-state number
    with timer.stage("track"):
        t1 = time.perf_counter()
        state, outputs = run_offline(ctx, kps, valid, app=app_arr)
        jax.block_until_ready(outputs.pose3d)
        track_time = time.perf_counter() - t1

    with timer.stage("assemble"):
        host_out = jax.device_get(outputs)
        tracklets = _post(assemble_tracklets(host_out, list(frame_idxs)))

    return RunResult(
        tracklets=tracklets,
        n_frames=int(end - start),
        wall_time_s=time.perf_counter() - t0,
        track_time_s=track_time,
        timings=timer.summary(),
        mean_concurrent_tracks=_density_guard(cfg, host_out),
    )


def filter_ghost_tracklets(
    tracklets: List[Tracklet], min_length: int = 1
) -> List[Tracklet]:
    """Config-gated ghost filter (VERDICT r2 weak #4): with `min_length > 1`,
    drop tracklets shorter than `min_length` frames AND tracklets with no
    finite pose at all (a degenerate 2-view spawn that triangulated to
    infinity and died — it can survive the re-ID merge as a one-frame
    'identity').  `min_length <= 1` is a strict no-op: EVERYTHING is kept,
    never-finite ghosts included, reproducing the reference's raw fragment
    output (the parity default).
    """
    if min_length <= 1:
        return tracklets
    out = []
    for t in tracklets:
        if len(t) < min_length:
            continue
        if not np.isfinite(np.asarray(t.poses_3d)).any():
            continue
        out.append(t)
    return out


def save_tracklets(path: Path, tracklets: List[Tracklet]) -> None:
    """Write the reference's output contract: a pickle of
    {"tracklets": [...]} sorted by descending length
    (ref:src/motion_capture.py:1127-1129), with each tracklet a plain dict so
    the file loads without this package installed."""
    payload = {
        "tracklets": [
            {
                "track_id": t.track_id,
                "frame_idxs": list(t.frame_idxs),
                "roots": t.roots,
                "euler_angles": t.eulers,
                "side_bone_lens": t.side_lens,
                "poses_3d": t.poses_3d,
                "poses_score": t.poses_score,
                "matched_pose": t.matched_pose,
                "app": t.app,
                "kps_format": "BASIC_18",
            }
            for t in tracklets
        ]
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_tracklets(path: Path) -> List[Tracklet]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    out = []
    for d in payload["tracklets"]:
        out.append(
            Tracklet(
                track_id=d["track_id"],
                frame_idxs=d["frame_idxs"],
                roots=d["roots"],
                eulers=d["euler_angles"],
                side_lens=d["side_bone_lens"],
                poses_3d=d["poses_3d"],
                poses_score=d["poses_score"],
                matched_pose=d["matched_pose"],
                app=d.get("app"),  # absent in pre-r5 pickles
            )
        )
    return out


def mpjpe_between(t_a: Tracklet, t_b: Tracklet, joint_idx=None) -> float:
    """Mean per-joint position error over the overlapping frames of two
    tracklets (the parity metric of BASELINE.md)."""
    frames_a = {f: i for i, f in enumerate(t_a.frame_idxs)}
    pairs = [(frames_a[f], j) for j, f in enumerate(t_b.frame_idxs) if f in frames_a]
    if not pairs:
        return float("nan")
    ia, ib = zip(*pairs)
    pa = t_a.poses_3d[list(ia)]
    pb = t_b.poses_3d[list(ib)]
    if joint_idx is not None:
        pa, pb = pa[:, joint_idx], pb[:, joint_idx]
    return float(np.linalg.norm(pa - pb, axis=-1).mean())
