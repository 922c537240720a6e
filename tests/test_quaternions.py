"""Direct parity: ops/quaternions.py vs the reference's Quaternions class
(ref:src/Quaternions.py), imported from /root/reference/src."""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiview_motion_capture_tpu.ops import quaternions as Q

REF_SRC = Path("/root/reference/src")


@pytest.fixture(scope="module")
def RefQ():
    if not REF_SRC.exists():
        pytest.skip("reference source not available")
    if str(REF_SRC) not in sys.path:
        sys.path.append(str(REF_SRC))
    from Quaternions import Quaternions

    return Quaternions


def _rand_q(rng, shape):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_qmul_and_rot(RefQ):
    rng = np.random.RandomState(0)
    a, b = _rand_q(rng, (6,)), _rand_q(rng, (6,))
    v = rng.normal(size=(6, 3))
    want_mul = (RefQ(a) * RefQ(b)).qs
    got_mul = np.asarray(Q.qmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got_mul, want_mul, atol=1e-6)

    want_rot = RefQ(a) * v
    got_rot = np.asarray(Q.qrot(jnp.asarray(a), jnp.asarray(v)))
    np.testing.assert_allclose(got_rot, want_rot, atol=1e-6)


def test_matrix_roundtrip(RefQ):
    rng = np.random.RandomState(1)
    q = _rand_q(rng, (8,))
    want = RefQ(q).transforms()
    got = np.asarray(Q.to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    want_q = RefQ.from_transforms(want).qs
    got_q = np.asarray(Q.from_matrix(jnp.asarray(want)))
    # quaternions are sign-ambiguous; compare up to sign per element
    sign = np.sign(np.sum(got_q * want_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(got_q * sign, want_q, atol=1e-5)
    # and the roundtrip must reproduce the rotation
    np.testing.assert_allclose(
        np.asarray(Q.to_matrix(jnp.asarray(got_q))), want, atol=1e-5
    )


def test_euler_roundtrip(RefQ):
    rng = np.random.RandomState(2)
    es = rng.uniform(-1.2, 1.2, size=(10, 3))
    want = RefQ.from_euler(es, order="xyz").qs
    got = np.asarray(Q.from_euler(jnp.asarray(es)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    want_es = RefQ(want).euler()
    got_es = np.asarray(Q.to_euler(jnp.asarray(got)))
    np.testing.assert_allclose(got_es, want_es, atol=1e-5)


def test_exp_log(RefQ):
    rng = np.random.RandomState(3)
    w = rng.normal(size=(7, 3)) * 0.8
    want = RefQ.exp(w).qs
    got = np.asarray(Q.exp(jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    q = _rand_q(rng, (7,))
    want_l = RefQ(q.copy()).log()
    got_l = np.asarray(Q.log(jnp.asarray(q)))
    np.testing.assert_allclose(got_l, want_l, atol=1e-5)


def test_slerp(RefQ):
    rng = np.random.RandomState(4)
    a, b = _rand_q(rng, (5,)), _rand_q(rng, (5,))
    for t in (0.0, 0.25, 0.5, 0.9, 1.0):
        want = RefQ.slerp(RefQ(a.copy()), RefQ(b.copy()), np.full(5, t)).qs
        got = np.asarray(Q.slerp(jnp.asarray(a), jnp.asarray(b), t))
        np.testing.assert_allclose(got, want, atol=1e-5)
    # nearly-parallel pair exercises the linear branch
    c = a + rng.normal(size=a.shape) * 1e-4
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    want = RefQ.slerp(RefQ(a.copy()), RefQ(c.copy()), np.full(5, 0.5)).qs
    got = np.asarray(Q.slerp(jnp.asarray(a), jnp.asarray(c), 0.5))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_between(RefQ):
    rng = np.random.RandomState(5)
    v0 = rng.normal(size=(6, 3))
    v1 = rng.normal(size=(6, 3))
    want = RefQ.between(v0, v1).qs
    got = np.asarray(Q.between(jnp.asarray(v0), jnp.asarray(v1)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # property: rotating v0 by the result aligns it with v1
    r = np.asarray(Q.qrot(jnp.asarray(got), jnp.asarray(v0)))
    cos = np.sum(r * v1, -1) / (np.linalg.norm(r, axis=-1) * np.linalg.norm(v1, axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_average(RefQ):
    """The reference's average() needs numpy.core.umath_tests (removed in
    modern numpy); replicate its math in-line as the oracle."""
    rng = np.random.RandomState(6)
    base = _rand_q(rng, ())
    qs = np.stack([base + rng.normal(size=4) * 0.05 for _ in range(20)])
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)

    system = np.einsum("ni,nj->ij", qs, qs)
    w, v = np.linalg.eigh(system)
    align = ((1.0 - np.einsum("ni,ij->nj", qs, v) ** 2)).sum(axis=0)
    want = v[:, np.argmin(align)]

    got = np.asarray(Q.average(jnp.asarray(qs)))
    sign = np.sign(np.dot(got, want))
    np.testing.assert_allclose(got * sign, want, atol=1e-5)
    # and it is close to the construction base
    assert abs(np.dot(got, base)) > 0.999


def test_jit_and_vmap():
    """Everything must trace: jit a composite and vmap slerp."""
    rng = np.random.RandomState(7)
    q = jnp.asarray(_rand_q(rng, (4,)), dtype=jnp.float32)

    @jax.jit
    def composite(q):
        return Q.to_euler(Q.from_matrix(Q.to_matrix(Q.normalize(q))))

    out = composite(q)
    assert out.shape == (4, 3)
    ts = jnp.linspace(0.0, 1.0, 4)
    out2 = jax.vmap(lambda t: Q.slerp(q[0], q[1], t))(ts)
    assert out2.shape == (4, 4)
    assert bool(jnp.isfinite(out2).all())
