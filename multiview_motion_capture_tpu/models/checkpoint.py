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
