"""Model parameter persistence (orbax when available, npz fallback)."""
from __future__ import annotations

from pathlib import Path
from typing import Any


def save_params(path: Path, params: Any) -> None:
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(Path(path).absolute(), params, force=True)
        ckptr.wait_until_finished()
    except Exception:
        import numpy as np
        import jax

        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
        np.savez_compressed(str(path) + ".npz", **arrays)


def save_posenet(path: Path, cfg, params, dtype=None) -> None:
    """Single-file, self-describing PoseNet checkpoint: one compressed npz
    holding the flattened params plus the PoseNetConfig as JSON, so loaders
    need no out-of-band model description (the shipped checkpoint
    `models/checkpoints/posenet_synth.npz` uses this format).  `dtype`
    (e.g. np.float16) downcasts stored weights to shrink the file; they are
    restored as f32."""
    import dataclasses
    import json

    import jax
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {}
    for k, v in flat:
        a = np.asarray(v)
        arrays[jax.tree_util.keystr(k)] = a.astype(dtype) if dtype else a
    d = dataclasses.asdict(cfg)
    d["compute_dtype"] = np.dtype(cfg.compute_dtype).name
    arrays["__posenet_config__"] = np.frombuffer(
        json.dumps(d).encode(), dtype=np.uint8
    )
    np.savez_compressed(str(path), **arrays)


def load_posenet(path: Path):
    """Load a `save_posenet` checkpoint -> (PoseNetConfig, params)."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multiview_motion_capture_tpu.models.pose_net import (
        PoseNet,
        PoseNetConfig,
    )

    with np.load(str(path)) as z:
        d = json.loads(bytes(z["__posenet_config__"]).decode())
        d["compute_dtype"] = jnp.dtype(d["compute_dtype"])
        d["stage_features"] = tuple(d["stage_features"])
        d["img_hw"] = tuple(d["img_hw"])
        cfg = PoseNetConfig(**d)
        like = PoseNet(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1,) + cfg.img_hw + (3,))
        )["params"]
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = [
            jnp.asarray(z[jax.tree_util.keystr(k)], dtype=jnp.asarray(v).dtype)
            for k, v in flat
        ]
    return cfg, jax.tree_util.tree_unflatten(treedef, leaves)


def load_params(path: Path, like: Any) -> Any:
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(Path(path).absolute(), like)
    except Exception:
        import numpy as np
        import jax
        import jax.numpy as jnp

        with np.load(str(path) + ".npz") as z:
            flat, treedef = jax.tree_util.tree_flatten_with_path(like)
            leaves = [jnp.asarray(z[jax.tree_util.keystr(k)]) for k, _ in flat]
        return jax.tree_util.tree_unflatten(treedef, leaves)


def save_appearance_head(path: Path, cfg, params) -> None:
    """Single-file self-describing appearance-head checkpoint (npz with the
    AppearanceHeadConfig as JSON), mirroring `save_posenet`'s format."""
    import dataclasses
    import json

    import jax
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    arrays["__appearance_head_config__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
    )
    np.savez_compressed(str(path), **arrays)


def load_appearance_head(path: Path):
    """Load a `save_appearance_head` checkpoint -> (cfg, params)."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multiview_motion_capture_tpu.models.appearance_net import (
        AppearanceHeadConfig,
        init_head,
    )

    with np.load(str(path)) as z:
        d = json.loads(bytes(z["__appearance_head_config__"]).decode())
        d["hidden"] = tuple(d["hidden"])
        cfg = AppearanceHeadConfig(**d)
        like = init_head(jax.random.PRNGKey(0), cfg)
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = [jnp.asarray(z[jax.tree_util.keystr(k)]) for k, _ in flat]
    return cfg, jax.tree_util.tree_unflatten(treedef, leaves)
