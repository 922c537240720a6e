"""Train-once disk cache for in-test CNN trainings (VERDICT r4 next #9).

The e2e CNN tests (tests/test_e2e_cnn.py, tests/test_detect_cascade.py ::
test_fullframe_multiperson_end_to_end) train small PoseNets from scratch
every run and dominate the suite wall-time.  Training is deterministic
given the seeds and sources, so a trained checkpoint can be reused across
runs — PROVIDED the cache is invalidated whenever any code that shapes
the training changes.  The fingerprint therefore hashes the exact source
files the caller names plus the caller's hyper-parameter key: touch
models/pose_net.py (or the example itself) and the next run retrains.

Cache location: $MVMC_TEST_CKPT_CACHE or /tmp/mvmc_test_ckpt.  Delete the
directory to force retraining everywhere.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Iterable


def source_fingerprint(paths: Iterable[Path], key: str) -> str:
    """sha1 over the given source files' bytes + the hyper-param key."""
    h = hashlib.sha1()
    for p in sorted(str(p) for p in paths):
        h.update(Path(p).read_bytes())
    h.update(key.encode())
    return h.hexdigest()[:16]


def checkpoint_path(name: str, fingerprint: str) -> Path:
    base = Path(os.environ.get("MVMC_TEST_CKPT_CACHE", "/tmp/mvmc_test_ckpt"))
    base.mkdir(parents=True, exist_ok=True)
    return base / f"{name}-{fingerprint}.npz"
