"""Multi-chip training step for the keypoint CNN: dp x tp GSPMD sharding.

Mesh axes:
  dp — data parallel: batch sharded, gradients all-reduced by XLA,
  tp — tensor parallel: wide conv/deconv channel axes sharded; GSPMD inserts
       the activation collectives.

All sharding is expressed as NamedSharding constraints on params/data; XLA
chooses and places the collectives (psum for grad reduction, all-gathers at
tp boundaries) on ICI.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multiview_motion_capture_tpu.models.pose_net import (
    PoseNet,
    PoseNetConfig,
    gaussian_heatmaps,
    heatmap_loss,
)


def param_sharding_rules(params, mesh: Mesh, tp_axis: str = "tp"):
    """PartitionSpec pytree: shard wide channel axes on tp, replicate the
    rest."""
    tp = mesh.shape[tp_axis]

    def rule(path, x):
        if x.ndim == 4 and x.shape[-1] % tp == 0 and x.shape[-1] >= 128:
            return NamedSharding(mesh, P(None, None, None, tp_axis))
        if x.ndim == 1 and x.shape[0] % tp == 0 and x.shape[0] >= 128:
            return NamedSharding(mesh, P(tp_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def sharded_train_step(mesh: Mesh, cfg: PoseNetConfig = None, lr: float = 1e-3):
    """Build (step_fn, params, opt_state, data_sharding) with the full
    training step jitted over the mesh."""
    import optax

    cfg = cfg or PoseNetConfig()
    model = PoseNet(cfg)
    H, W = cfg.img_hw
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, H, W, 3)))["params"]
    tx = optax.adamw(lr)

    p_shard = param_sharding_rules(params, mesh)
    params = jax.device_put(params, p_shard)
    # adam moments initialized from the sharded params inherit their sharding
    opt_state = jax.jit(tx.init)(params)
    data_sharding = NamedSharding(mesh, P("dp"))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, images, kps, kp_mask):
        target = gaussian_heatmaps(kps, cfg.heatmap_hw)

        def loss_fn(p):
            heat = model.apply({"params": p}, images, train=True)
            return heatmap_loss(heat, target, kp_mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, params, opt_state, data_sharding
