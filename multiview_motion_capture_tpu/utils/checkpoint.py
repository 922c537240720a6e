"""Chunked checkpoint/resume for tracking runs.

The reference has no mid-run persistence — a crash in `run` mode loses every
frame since the start (SURVEY.md §5).  Here the offline scan is split into
fixed-size chunks; after each chunk the tracker state and that chunk's
emissions are written to disk, and `resume_info` lets a restarted run
continue from the last completed chunk.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import numpy as np

from multiview_motion_capture_tpu.tracker import FrameOutput, TrackerState


def _state_to_arrays(state: TrackerState) -> dict:
    return {f.name: np.asarray(getattr(state, f.name))
            for f in dataclasses.fields(state)}


def save_chunk(ckpt_dir: Path, chunk_idx: int, end_frame: int,
               state: TrackerState, outputs: FrameOutput) -> None:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        ckpt_dir / f"chunk_{chunk_idx:05d}.npz",
        **{f"state_{k}": v for k, v in _state_to_arrays(state).items()},
        **{f"out_{name}": np.asarray(getattr(outputs, name))
           for name in FrameOutput._fields},
    )
    meta = {"last_chunk": chunk_idx, "end_frame": end_frame}
    (ckpt_dir / "meta.json").write_text(json.dumps(meta))


def resume_info(ckpt_dir: Path) -> Optional[dict]:
    meta_path = Path(ckpt_dir) / "meta.json"
    if not meta_path.exists():
        return None
    return json.loads(meta_path.read_text())


def load_state(ckpt_dir: Path, chunk_idx: int) -> TrackerState:
    with np.load(Path(ckpt_dir) / f"chunk_{chunk_idx:05d}.npz") as z:
        import jax.numpy as jnp

        kwargs = {
            f.name: jnp.asarray(z[f"state_{f.name}"])
            for f in dataclasses.fields(TrackerState)
        }
    return TrackerState(**kwargs)


def load_outputs(ckpt_dir: Path, up_to_chunk: int) -> List[FrameOutput]:
    outs = []
    for c in range(up_to_chunk + 1):
        with np.load(Path(ckpt_dir) / f"chunk_{c:05d}.npz") as z:
            outs.append(FrameOutput(*[z[f"out_{n}"] for n in FrameOutput._fields]))
    return outs


def concat_outputs(chunks: List[FrameOutput]) -> FrameOutput:
    return FrameOutput(*[
        np.concatenate([np.asarray(getattr(c, name)) for c in chunks], axis=0)
        for name in FrameOutput._fields
    ])
