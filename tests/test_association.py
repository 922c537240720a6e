import numpy as np
import jax.numpy as jnp

from multiview_motion_capture_tpu.ops import association as A


def _make_similarity(groups, sizes, hi=0.9, lo=0.05, seed=0):
    """Build a block similarity matrix over `sizes` camera groups where
    elements of the same person (groups[i] == groups[j]) have high score."""
    rng = np.random.RandomState(seed)
    n = len(groups)
    W = np.zeros((n, n), dtype=np.float32)
    offs = np.cumsum([0] + list(sizes))
    cam_of = np.concatenate([[c] * s for c, s in enumerate(sizes)]) if n else []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if cam_of[i] == cam_of[j]:
                continue
            base = hi if groups[i] == groups[j] else lo
            W[i, j] = np.clip(base + rng.uniform(-0.04, 0.04), 0, 1)
    W = 0.5 * (W + W.T)
    return W, offs


def test_match_als_recovers_groups():
    sizes = (3, 3, 2, 3)
    groups = [0, 1, 2, 1, 0, 2, 0, 1, 2, 0, 1]  # person ids per element
    W, _ = _make_similarity(groups, sizes)
    mask = A.block_diag_mask(sizes)
    init = A.default_init_factor(len(groups), 6)
    res = A.match_als(jnp.asarray(W), jnp.asarray(mask), jnp.asarray(init))
    x = np.asarray(res.x_bin)
    for i in range(len(groups)):
        for j in range(len(groups)):
            if i == j:
                continue
            same_cam = mask[i, j]
            if same_cam:
                assert not x[i, j]
            elif groups[i] == groups[j]:
                assert x[i, j], (i, j)
            else:
                assert not x[i, j], (i, j)
    assert int(res.n_iters) <= 1000


def test_transitive_closure():
    n = 6
    x = np.zeros((n, n), dtype=bool)
    x[0, 1] = x[1, 0] = True
    x[1, 2] = x[2, 1] = True
    x[4, 5] = x[5, 4] = True
    c = np.asarray(A.transitive_closure(jnp.asarray(x)))
    assert c[0, 2] and c[2, 0]  # transitivity through 1
    assert c[3, 3] and not c[3, 0]
    assert c[4, 5] and not c[4, 2]


def test_extract_groups_semantics():
    n = 7
    x = np.zeros((n, n), dtype=bool)
    # group {0, 2, 3}, group {1, 5}, singletons 4, 6
    for a, b in [(0, 2), (2, 3), (1, 5)]:
        x[a, b] = x[b, a] = True
    valid = np.ones(n, dtype=bool)
    g = A.extract_groups(jnp.asarray(x), jnp.asarray(valid))
    rep = np.asarray(g.rep)
    member = np.asarray(g.member)
    assert rep[0] == rep[2] == rep[3] == 0
    assert rep[1] == rep[5] == 1
    assert member[:4].all() and member[5]
    assert not member[4] and not member[6]


def test_extract_groups_ignores_invalid():
    n = 5
    x = np.zeros((n, n), dtype=bool)
    x[0, 1] = x[1, 0] = True
    x[1, 2] = x[2, 1] = True
    valid = np.array([True, False, True, True, True])
    g = A.extract_groups(jnp.asarray(x), jnp.asarray(valid))
    member = np.asarray(g.member)
    # element 1 is padding: its links vanish, so 0 and 2 become singletons
    assert not member.any()


def test_als_padded_rows_stay_single():
    """Zero-similarity (padded) rows must not join any group."""
    sizes = (3, 3)
    groups = [0, 1, -1, 0, 1, -2]  # two padded slots with zero similarity
    rng = np.random.RandomState(0)
    n = 6
    W = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        for j in range(n):
            same_cam = (i // 3) == (j // 3)
            if i == j or same_cam or groups[i] < 0 or groups[j] < 0:
                continue
            W[i, j] = 0.9 if groups[i] == groups[j] else 0.05
    mask = A.block_diag_mask(sizes)
    res = A.match_als(jnp.asarray(W), jnp.asarray(mask), jnp.asarray(A.default_init_factor(n, 6)))
    g = A.extract_groups(res.x_bin, jnp.asarray([True, True, False, True, True, False]))
    member = np.asarray(g.member)
    rep = np.asarray(g.rep)
    assert member[0] and member[3] and rep[3] == 0
    assert member[1] and member[4] and rep[4] == 1
    assert not member[2] and not member[5]


def test_associate_frame_standalone():
    from multiview_motion_capture_tpu.config import PipelineConfig
    from multiview_motion_capture_tpu.data.synthetic import synthetic_sequence
    from multiview_motion_capture_tpu.ops.association import associate_frame

    cfg = PipelineConfig(n_views=4, max_people=5)
    seq = synthetic_sequence(n_frames=1, n_people=3, n_views=4, cfg=cfg,
                             drop_prob=0.0, seed=8)
    groups = associate_frame(seq.batch.kps[0], seq.batch.valid[0],
                             seq.cameras, cfg)
    full = [g for g in groups if len(g) == 4]
    assert len(full) == 3
    for g in full:
        pids = {seq.gt_slot_person[0, v, p] for v, p in g}
        assert len(pids) == 1
