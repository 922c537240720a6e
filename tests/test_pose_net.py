"""Keypoint CNN: shapes, decoding accuracy, training step, detect stage."""
import numpy as np
import jax
import jax.numpy as jnp

from multiview_motion_capture_tpu.models.pose_net import (
    PoseNet,
    PoseNetConfig,
    decode_heatmaps,
    gaussian_heatmaps,
    heatmap_loss,
)

SMALL = PoseNetConfig(img_hw=(64, 48), stage_features=(64, 64, 128),
                      blocks_per_stage=1, head_features=64)


def test_forward_shapes():
    model = PoseNet(SMALL)
    x = jnp.zeros((2, 64, 48, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    heat = model.apply({"params": params}, x)
    assert heat.shape == (2, 16, 12, 17)
    assert heat.dtype == jnp.float32


def test_soft_argmax_decodes_gaussian_peaks():
    rng = np.random.RandomState(0)
    kps = rng.uniform(2, 10, size=(3, 17, 2)).astype(np.float32)
    heat = gaussian_heatmaps(jnp.asarray(kps), (16, 12), sigma=1.5)
    # logits ~ scaled gaussians
    decoded = np.asarray(decode_heatmaps(20.0 * heat))
    np.testing.assert_allclose(decoded[..., 0], kps[..., 0], atol=0.3)
    np.testing.assert_allclose(decoded[..., 1], kps[..., 1], atol=0.3)
    assert (decoded[..., 2] > 0.2).all()


def test_train_step_reduces_loss():
    import optax

    model = PoseNet(SMALL)
    rng = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(rng, (4, 64, 48, 3))
    kps = jax.random.uniform(jax.random.PRNGKey(2), (4, 17, 2)) * jnp.asarray([11.0, 15.0])
    target = gaussian_heatmaps(kps, (16, 12))
    mask = jnp.ones((4, 17))
    params = model.init(rng, imgs)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return heatmap_loss(model.apply({"params": p}, imgs, train=True),
                                target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_detect_stage_shapes():
    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.detect import (
        crops_to_frame_batch,
        make_detector,
    )

    cfg = PipelineConfig(n_views=2, max_people=3)
    detect, params = make_detector(SMALL)
    F, V, P = 2, 2, 3
    crops = jnp.asarray(np.random.RandomState(3).rand(F, V, P, 64, 48, 3),
                        dtype=jnp.float32)
    boxes = jnp.tile(jnp.asarray([100.0, 50.0, 196.0, 178.0]), (F, V, P, 1))
    valid = np.ones((F, V, P), dtype=bool)
    batch = crops_to_frame_batch(detect, params, crops, boxes, valid, cfg)
    assert batch.kps.shape == (F, V, P, 17, 3)
    # keypoints land inside their boxes
    assert (batch.kps[..., 0] >= 100 - 1e-3).all() and (batch.kps[..., 0] <= 196 + 1e-3).all()
    assert (batch.kps[..., 1] >= 50 - 1e-3).all() and (batch.kps[..., 1] <= 178 + 1e-3).all()
