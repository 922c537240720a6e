"""Multi-chip paths on the 8-device virtual CPU mesh: sharded affinity
equals the single-device kernel; the dp x tp training step runs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiview_motion_capture_tpu.cameras import (
    pairwise_fundamental_np,
    synthetic_camera_ring,
)
from multiview_motion_capture_tpu.ops.geometry import projected_distance_all_pairs
from multiview_motion_capture_tpu.parallel.mesh import make_mesh, pick_mesh_shape
from multiview_motion_capture_tpu.parallel.sharded_association import sharded_affinity


def test_pick_mesh_shape():
    assert pick_mesh_shape(8) == (2, 4)
    assert pick_mesh_shape(4) == (1, 4)
    assert pick_mesh_shape(6) == (3, 2)
    assert pick_mesh_shape(7) == (7, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_affinity_matches_single_device():
    mesh = make_mesh(8)
    dp = mesh.shape["dp"]
    V = dp * 2  # 2 cameras per shard
    cams = synthetic_camera_ring(V)
    F = jnp.asarray(
        pairwise_fundamental_np(np.asarray(cams.K), np.asarray(cams.Rt)),
        dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    kps = jnp.asarray(rng.rand(V, 4, 17, 3).astype(np.float32) * 400.0)

    ref = np.asarray(projected_distance_all_pairs(kps, F))
    out = np.asarray(sharded_affinity(kps, F, mesh, axis="dp"))
    # compare off-diagonal view pairs (diagonal uses the epsilon F)
    for a in range(V):
        for b in range(V):
            if a == b:
                continue
            np.testing.assert_allclose(out[a, :, b, :], ref[a, :, b, :],
                                       rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_runs():
    from multiview_motion_capture_tpu.models.pose_net import PoseNetConfig
    from multiview_motion_capture_tpu.parallel.train import sharded_train_step

    mesh = make_mesh(8)
    cfg = PoseNetConfig(img_hw=(64, 48), stage_features=(128, 128, 256),
                        blocks_per_stage=1, head_features=128)
    step, params, opt_state, data_sharding = sharded_train_step(mesh, cfg)
    B = 4
    rng = jax.random.PRNGKey(0)
    images = jax.device_put(jax.random.uniform(rng, (B, 64, 48, 3)), data_sharding)
    Hh, Wh = cfg.heatmap_hw
    kps = jax.device_put(jax.random.uniform(rng, (B, 17, 2)) * jnp.asarray([Wh, Hh]),
                         data_sharding)
    mask = jax.device_put(jnp.ones((B, 17)), data_sharding)
    params, opt_state, loss = step(params, opt_state, images, kps, mask)
    assert jnp.isfinite(loss)
    # a second step with donated buffers also works
    params, opt_state, loss2 = step(params, opt_state, images, kps, mask)
    assert jnp.isfinite(loss2)
