"""CLI: prepare | run | viz | bench — the reference's argparse surface
(ref:src/motion_capture.py:1221-1256) rebuilt over the packed-tensor
pipeline, minus its hard-coded absolute paths.

Examples:
  python -m multiview_motion_capture_tpu prepare \
      --kps_dir data/shelf/kps_opn --out data/shelf/frames.npz
  python -m multiview_motion_capture_tpu run \
      --kps_dir data/shelf/kps_opn --calib_dir data/shelf/calibs \
      --out_dir out/ --bvh --max_frames 300
  python -m multiview_motion_capture_tpu viz \
      --tracklets out/tracklets.pkl --calib_dir data/shelf/calibs \
      --out out/result.mp4
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _add_common(p):
    p.add_argument("--max_frames", type=int, default=300,
                   help="frame cap (reference n_test=300)")
    p.add_argument("--max_people", type=int, default=10)
    p.add_argument("--max_tracks", type=int, default=16)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--min_track_len", type=int, default=1,
                   help="drop output tracklets shorter than this (and "
                        "never-finite degenerate ghosts); 1 = keep all "
                        "(reference-parity fragments)")
    p.add_argument("--preset", default="default",
                   choices=("default", "parity", "fast", "crowded", "wide"),
                   help="config preset: default (recommended: includes the "
                        "documented track-rescue deviation, docs/PARITY.md), "
                        "parity (STRICT reference lifecycle — rescue off, "
                        "the config the oracle parity study pins), "
                        "fast (ALS early-exit throughput), crowded "
                        "(identity-first, rescue off), wide (16+-camera "
                        "rigs: merged cold IK, warm budget 3, 16-view cap)")


def _config(args, n_views):
    from multiview_motion_capture_tpu.config import PipelineConfig

    common = dict(
        max_frames=args.max_frames,
        max_people=args.max_people,
        max_tracks=args.max_tracks,
        min_track_length=getattr(args, "min_track_len", 1),
    )
    preset = getattr(args, "preset", "default")
    if preset == "parity":
        return PipelineConfig.parity(n_views=n_views, **common)
    if preset == "fast":
        return PipelineConfig.fast(n_views=n_views, **common)
    if preset == "crowded":
        return PipelineConfig.crowded(n_views=n_views, **common)
    if preset == "wide":
        return PipelineConfig.wide(n_views, **common)
    return PipelineConfig(n_views=n_views, **common)


def _crossings_cfg(args):
    """CrossingConfig override from CLI flags (None = library defaults)."""
    gate = getattr(args, "cut_gate", None)
    if gate is None:
        return None
    from multiview_motion_capture_tpu.crossings import CrossingConfig

    return CrossingConfig(cut_gate=gate)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="multiview_motion_capture_tpu")
    sub = parser.add_subparsers(dest="mode", required=True)

    p_prep = sub.add_parser("prepare", help="OpenPose JSON -> packed npz")
    p_prep.add_argument("--kps_dir", required=True)
    p_prep.add_argument("--out", required=True)
    _add_common(p_prep)

    p_run = sub.add_parser("run", help="track + IK a sequence")
    p_run.add_argument("--kps_dir", help="OpenPose JSON root (one dir per cam)")
    p_run.add_argument("--frames_npz", help="packed npz from prepare")
    p_run.add_argument("--calib_dir", required=True)
    p_run.add_argument("--out_dir", required=True)
    p_run.add_argument("--no_ik", action="store_true",
                       help="triangulation pass-through instead of IK")
    p_run.add_argument("--bvh", action="store_true", help="export BVH per track")
    p_run.add_argument("--reid", action="store_true",
                       help="offline re-identification merge of tracklet "
                            "fragments (bone-length + trajectory evidence)")
    p_run.add_argument("--crossings", action="store_true",
                       help="hindsight crossing repair: cut every track at "
                            "its appearance identity change-points (2-means "
                            "label transitions) and reassemble the pure "
                            "pieces with the re-ID merge (implied); crossing "
                            "events without appearance are adjudicated by "
                            "bone/velocity tail swaps")
    p_run.add_argument("--cut_gate", type=float, default=None,
                       help="crossing identity-cut separation gate "
                            "(default 0.03; flat optimum 0.03-0.05 across "
                            "extractors, docs/PERF.md r5); needs "
                            "--crossings")
    p_run.add_argument("--mesh", default=None, metavar="SPEC",
                       help="multi-chip sharding of the tracker stages, "
                            "e.g. cameras=4,clusters=8,tracks=8 (any "
                            "subset); shards the similarity assembly / "
                            "per-cluster ALS solves / per-slot IK solves "
                            "over the visible device mesh")
    p_run.add_argument("--debug_dump", default=None, metavar="DIR",
                       help="per-frame association diagnostics: similarity "
                            "matrix csv/npz, ALS X + |X-0.5| margins, group "
                            "parse, track->detection distances (the "
                            "reference's xlsx/crop debug surface)")
    p_run.add_argument("--debug_frames", default=None,
                       help="comma-separated frame indices for --debug_dump "
                            "(default: every frame where a track dies, "
                            "capped at 20)")
    _add_common(p_run)

    p_det = sub.add_parser(
        "detect",
        help="camera frames -> tracklets, no OpenPose: on-device person "
             "proposal + crop + keypoint CNN, then association/tracking/IK "
             "(BASELINE config 5)",
    )
    p_det.add_argument("--image_dir", required=True,
                       help="root with one subdir of frame images per camera")
    p_det.add_argument("--calib_dir", required=True)
    p_det.add_argument("--out_dir", required=True)
    p_det.add_argument("--params", default=None,
                       help="CNN parameter checkpoint (models.checkpoint); "
                            "defaults to the shipped checkpoint "
                            "(models/checkpoints/posenet_synth.npz) if present")
    p_det.add_argument("--smoke", action="store_true",
                       help="allow running with RANDOM-INIT weights (output "
                            "is noise; pipeline smoke-testing only)")
    p_det.add_argument("--crop_h", type=int, default=512)
    p_det.add_argument("--crop_w", type=int, default=384)
    p_det.add_argument("--no_ik", action="store_true")
    p_det.add_argument("--appearance", action="store_true",
                       help="appearance-evidence association: the detector "
                            "also emits keypoint-color-layout embeddings "
                            "and the tracker uses them to disambiguate "
                            "crossings (bottom-up checkpoint only)")
    p_det.add_argument("--crossings", action="store_true",
                       help="hindsight crossing resolution post-pass "
                            "(see run --crossings); most effective with "
                            "--appearance")
    p_det.add_argument("--cut_gate", type=float, default=None,
                       help="crossing identity-cut separation gate "
                            "(see run --cut_gate)")
    p_det.add_argument("--appearance_head", default="auto",
                       metavar="PATH|auto|none",
                       help="metric-learned embedding head refining the "
                            "color-layout descriptor (held-out cos gap "
                            "0.05 -> 0.74, docs/PERF.md r4). 'auto' (the "
                            "default) uses the shipped checkpoint when "
                            "present; 'none' keeps the raw descriptor")
    _add_common(p_det)

    p_viz = sub.add_parser("viz", help="render tracklets to video")
    p_viz.add_argument("--tracklets", required=True)
    p_viz.add_argument("--calib_dir", required=True)
    p_viz.add_argument("--out", required=True)
    p_viz.add_argument("--image_dir", default=None,
                       help="optional dir with per-cam frame images")
    p_viz.add_argument("--animate_3d", default=None, metavar="PATH",
                       help="also export an animated 3D skeleton playback "
                            "(mp4; falls back to gif without ffmpeg) — the "
                            "reference's FuncAnimation window, exported")
    _add_common(p_viz)

    p_bench = sub.add_parser("bench", help="run the driver benchmark")

    args = parser.parse_args(argv)

    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.mode == "prepare":
        from multiview_motion_capture_tpu import pipeline

        cfg = _config(args, n_views=0)
        batch = pipeline.prepare(Path(args.kps_dir), Path(args.out), cfg,
                                 max_frames=args.max_frames)
        print(f"packed {batch.n_frames} frames x {batch.n_views} views -> {args.out}")
        return 0

    if args.mode == "run":
        from multiview_motion_capture_tpu import pipeline
        from multiview_motion_capture_tpu.cameras import CameraBank
        from multiview_motion_capture_tpu.data.ingest import (
            load_frame_batch,
            load_openpose_dir,
        )

        cams = CameraBank.from_json_dir(Path(args.calib_dir))
        cfg = _config(args, n_views=cams.n_views)
        if args.frames_npz:
            batch = load_frame_batch(Path(args.frames_npz))
        elif args.kps_dir:
            batch = load_openpose_dir(Path(args.kps_dir), cfg,
                                      max_frames=args.max_frames)
        else:
            parser.error("run needs --kps_dir or --frames_npz")
        res = pipeline.run(batch, cams, cfg, use_ik=not args.no_ik,
                           reid=args.reid, crossings=args.crossings,
                           crossings_cfg=_crossings_cfg(args),
                           mesh_spec=args.mesh)
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        pipeline.save_tracklets(out_dir / "tracklets.pkl", res.tracklets)
        if args.debug_dump:
            from multiview_motion_capture_tpu import debug as dbg
            from multiview_motion_capture_tpu.data.ingest import filter_bad_poses
            from multiview_motion_capture_tpu.tracker import TrackerContext

            fb = filter_bad_poses(batch, cfg)
            nmax = (min(fb.n_frames, cfg.max_frames)
                    if cfg.max_frames else fb.n_frames)
            dbg_frames = ([int(x) for x in args.debug_frames.split(",")]
                          if args.debug_frames else None)
            ctx = TrackerContext.build(cams, cfg, use_ik=not args.no_ik)
            paths = dbg.dump_association_debug(
                ctx, fb.kps[:nmax], fb.valid[:nmax], Path(args.debug_dump),
                frames=dbg_frames,
            )
            print(f"debug dump: {len(paths)} frames -> {args.debug_dump}")
        if args.bvh and not args.no_ik:
            from multiview_motion_capture_tpu.utils.bvh import export_tracklet_bvh

            for t in res.tracklets:
                export_tracklet_bvh(out_dir / f"track_{t.track_id:03d}.bvh", t)
        print(json.dumps({
            "n_frames": res.n_frames,
            "fps": round(res.fps, 2),
            "n_tracklets": len(res.tracklets),
            "top_lengths": sorted((len(t) for t in res.tracklets), reverse=True)[:5],
            "out": str(out_dir / "tracklets.pkl"),
        }))
        return 0

    if args.mode == "detect":
        import time

        import numpy as np

        from multiview_motion_capture_tpu import pipeline
        from multiview_motion_capture_tpu.cameras import CameraBank
        from multiview_motion_capture_tpu.data.detect import (
            frames_to_frame_batch,
            make_bottom_up_detector,
            make_multi_person_detector,
        )
        from multiview_motion_capture_tpu.models.pose_net import PoseNet, PoseNetConfig

        cams = CameraBank.from_json_dir(Path(args.calib_dir))
        cfg = _config(args, n_views=cams.n_views)

        import cv2

        root = Path(args.image_dir)
        cam_dirs = sorted(d for d in root.iterdir() if d.is_dir())
        if len(cam_dirs) != cams.n_views:
            parser.error(f"{len(cam_dirs)} image dirs vs {cams.n_views} calibs")
        per_cam = [sorted(list(d.glob("*.jpg")) + list(d.glob("*.png")))
                   for d in cam_dirs]
        n = min(len(x) for x in per_cam)
        if args.max_frames:
            n = min(n, args.max_frames)
        images = np.stack([
            np.stack([
                cv2.imread(str(per_cam[v][f]))[..., ::-1].astype(np.float32) / 255.0
                for v in range(cams.n_views)
            ]) for f in range(n)
        ])

        import jax
        import jax.numpy as jnp

        params_path = args.params
        if params_path is None:
            shipped = (Path(__file__).parent / "models" / "checkpoints"
                       / "posenet_synth.npz")
            if shipped.exists():
                params_path = str(shipped)
        if params_path:
            from multiview_motion_capture_tpu.models.checkpoint import load_posenet

            mcfg, params = load_posenet(Path(params_path))
        elif args.smoke:
            mcfg = PoseNetConfig(predict_center=True)
            model = PoseNet(mcfg)
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1,) + mcfg.img_hw + (3,)))["params"]
        else:
            parser.error(
                "no trained weights: pass --params <checkpoint>, or --smoke "
                "to run with random-init weights (the output would be noise)"
            )

        use_app = bool(args.appearance)
        if use_app and not mcfg.predict_offsets:
            parser.error("--appearance needs the bottom-up checkpoint "
                         "(predict_offsets=True)")
        head = None
        if use_app and args.appearance_head != "none":
            hp = args.appearance_head
            if hp == "auto":
                shipped_h = (Path(__file__).parent / "models" / "checkpoints"
                             / "appearance_head.npz")
                hp = str(shipped_h) if shipped_h.exists() else None
            if hp:
                from multiview_motion_capture_tpu.models.checkpoint import (
                    load_appearance_head,
                )

                head = load_appearance_head(Path(hp))
        if mcfg.predict_offsets:
            # single-pass bottom-up (the shipped checkpoint's architecture)
            detect = make_bottom_up_detector(mcfg, max_people=cfg.max_people,
                                             center_nms_window=cfg.detect_nms_window,
                                             return_appearance=use_app,
                                             appearance_head=head)
        else:
            detect = make_multi_person_detector(
                mcfg, max_people=cfg.max_people,
                crop_hw=(args.crop_h, args.crop_w),
            )
        t0 = time.perf_counter()
        app = None
        if use_app:
            batch, app = frames_to_frame_batch(detect, params, images, cfg,
                                               collect_appearance=True)
            import dataclasses as _dc

            # gain 60 for BOTH extractors (r5 packed-crowd e2e study,
            # docs/PERF.md): the raw color-layout descriptor's 0.07-0.14
            # cosine gap needs 60 for ~8px discrimination, and with the
            # head, packed scenes need the strong veto too — detector-driven
            # 8 people at dist 0.5: IDF1 0.698@60 vs 0.525@20 raw,
            # 0.906@60 vs 0.824@20 with --crossings.  The sparse 4-person
            # scene prefers 20 by only 0.014 (0.957 vs 0.943, r4) — 60 is
            # the robust choice.  The online auto rule measured WORSE with
            # the head on packed scenes (noise cap binds at ~10px,
            # crossings_auto20 0.820) — kept opt-in.
            cfg = _dc.replace(cfg, appearance_dim=app.shape[-1],
                              appearance_gain_px=60.0)
        else:
            batch = frames_to_frame_batch(detect, params, images, cfg)
        detect_s = time.perf_counter() - t0
        res = pipeline.run(batch, cams, cfg, use_ik=not args.no_ik, app=app,
                           crossings=args.crossings,
                           crossings_cfg=_crossings_cfg(args))
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        pipeline.save_tracklets(out_dir / "tracklets.pkl", res.tracklets)
        total_s = detect_s + res.track_time_s
        print(json.dumps({
            "n_frames": n,
            "detect_fps": round(n / max(detect_s, 1e-9), 2),
            "track_fps": round(res.fps, 2),
            "e2e_fps": round(n / max(total_s, 1e-9), 2),
            "n_tracklets": len(res.tracklets),
            "out": str(out_dir / "tracklets.pkl"),
        }))
        return 0

    if args.mode == "viz":
        from multiview_motion_capture_tpu import pipeline
        from multiview_motion_capture_tpu.cameras import CameraBank
        from multiview_motion_capture_tpu.utils.viz import render_tracklets_video

        cams = CameraBank.from_json_dir(Path(args.calib_dir))
        tlets = pipeline.load_tracklets(Path(args.tracklets))
        frame_images = None
        if args.image_dir:
            import cv2

            frame_images = {}
            root = Path(args.image_dir)
            cam_dirs = sorted([d for d in root.iterdir() if d.is_dir()])
            per_cam = [sorted(d.glob("*.jpg")) for d in cam_dirs]
            n = min(len(x) for x in per_cam) if per_cam else 0
            for f in range(n):
                frame_images[f] = [cv2.imread(str(per_cam[v][f]))
                                   for v in range(len(cam_dirs))]
        out = render_tracklets_video(tlets, cams, Path(args.out),
                                     frame_images=frame_images)
        print(f"wrote {out}")
        if args.animate_3d:
            from multiview_motion_capture_tpu.utils.viz import (
                animate_tracklets_3d,
            )

            out3d = animate_tracklets_3d(tlets, Path(args.animate_3d))
            print(f"wrote {out3d}")
        return 0

    if args.mode == "bench":
        import bench  # repo-root bench.py

        bench.main()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
