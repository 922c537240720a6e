"""General quaternion algebra as pure jnp functions (wxyz layout).

TPU-native re-design of the reference's array-of-quaternions class
(ref:src/Quaternions.py): instead of an ndarray subclass with data-dependent
boolean indexing, every op here is a pure function on (..., 4) arrays built
from `jnp.where` selects, so everything jits, vmaps, and grads.

Convention notes (kept bit-compatible with the reference, verified in
tests/test_quaternions.py):

- `qmul(a, b)` reproduces the reference's `a * b`
  (ref:src/Quaternions.py:96-115).  In textbook Hamilton terms that product
  composes rotations as "apply b, then a" the same way the reference does —
  e.g. `from_euler` builds q0*(q1*q2) with it (ref:465-476).
- `to_euler` implements the reference's (corrected) xyz extraction
  (ref:src/Quaternions.py:268-272).
- `average` is the eigen-decomposition average (ref:src/Quaternions.py:310-322).

These utilities are not on the Shelf hot path (FK uses closed-form euler
matrices, ops/fk.py); they serve BVH/motion tooling, the re-ID trajectory
matching, and any consumer of the reference's Quaternions surface.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

_EPS = 1e-10


def normalize(q: Array) -> Array:
    """Unit-norm quaternions (ref:src/Quaternions.py:186-190)."""
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def conjugate(q: Array) -> Array:
    """Negated imaginary part (the reference's `-self`, ref:src/Quaternions.py:170)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(a: Array, b: Array) -> Array:
    """Quaternion product matching the reference's `a * b`
    (ref:src/Quaternions.py:96-115)."""
    q0, q1, q2, q3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    r0, r1, r2, r3 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            r0 * q0 - r1 * q1 - r2 * q2 - r3 * q3,
            r0 * q1 + r1 * q0 - r2 * q3 + r3 * q2,
            r0 * q2 + r1 * q3 + r2 * q0 - r3 * q1,
            r0 * q3 - r1 * q2 + r2 * q1 + r3 * q0,
        ],
        axis=-1,
    )


def qrot(q: Array, v: Array) -> Array:
    """Rotate 3-vectors by quaternions: the reference's `q * v`
    (ref:src/Quaternions.py:117-121, `(self * (vs * -self)).imaginaries`)."""
    vq = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return qmul(q, qmul(vq, conjugate(q)))[..., 1:]


def to_matrix(q: Array) -> Array:
    """(..., 4) -> (..., 3, 3) rotation matrices (ref:src/Quaternions.py:335-366)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = qx + qx, qy + qy, qz + qz
    xx, yy, zz = qx * x2, qy * y2, qz * z2
    wx, wy, wz = qw * x2, qw * y2, qw * z2
    xy, yz, xz = qx * y2, qy * z2, qx * z2
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def from_matrix(m: Array) -> Array:
    """(..., 3, 3) -> (..., 4): the reference's branch-free Shepperd variant
    (ref:src/Quaternions.py:465-506) with the boolean-index sign fixups
    expressed as `where` selects."""
    d0, d1, d2 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    q0 = jnp.sqrt(jnp.clip((d0 + d1 + d2 + 1.0) / 4.0, 0.0, None))
    q1 = jnp.sqrt(jnp.clip((d0 - d1 - d2 + 1.0) / 4.0, 0.0, None))
    q2 = jnp.sqrt(jnp.clip((-d0 + d1 - d2 + 1.0) / 4.0, 0.0, None))
    q3 = jnp.sqrt(jnp.clip((-d0 - d1 + d2 + 1.0) / 4.0, 0.0, None))

    c0 = (q0 >= q1) & (q0 >= q2) & (q0 >= q3)
    c1 = (q1 >= q0) & (q1 >= q2) & (q1 >= q3) & ~c0
    c2 = (q2 >= q0) & (q2 >= q1) & (q2 >= q3) & ~c0 & ~c1
    # note: the reference applies its fixups sequentially with overlapping
    # masks; ties resolve to the first matching case, which the ~c chain
    # reproduces for the q-selection (equal-magnitude components only differ
    # by a global sign, which represents the same rotation)

    s = jnp.sign
    m21_12 = s(m[..., 2, 1] - m[..., 1, 2])
    m02_20 = s(m[..., 0, 2] - m[..., 2, 0])
    m10_01 = s(m[..., 1, 0] - m[..., 0, 1])
    p10_01 = s(m[..., 1, 0] + m[..., 0, 1])
    p02_20 = s(m[..., 0, 2] + m[..., 2, 0])
    p21_12 = s(m[..., 2, 1] + m[..., 1, 2])

    w = jnp.where(c0, q0, jnp.where(c1, q0 * m21_12, jnp.where(c2, q0 * m02_20, q0 * m10_01)))
    x = jnp.where(c0, q1 * m21_12, jnp.where(c1, q1, jnp.where(c2, q1 * p10_01, q1 * p02_20)))
    y = jnp.where(c0, q2 * m02_20, jnp.where(c1, q2 * p10_01, jnp.where(c2, q2, q2 * p21_12)))
    z = jnp.where(c0, q3 * m10_01, jnp.where(c1, q3 * p02_20, jnp.where(c2, q3 * p21_12, q3)))
    return jnp.stack([w, x, y, z], axis=-1)


def from_angle_axis(angle: Array, axis: Array) -> Array:
    """(...,), (..., 3) -> (..., 4) (ref:src/Quaternions.py:444-448)."""
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def to_angle_axis(q: Array) -> tuple[Array, Array]:
    """(..., 4) -> (angles (...,), axes (..., 3)) (ref:src/Quaternions.py:324-333)."""
    q = normalize(q)
    s = jnp.sqrt(jnp.clip(1.0 - q[..., 0] ** 2, 0.0, None))
    s = jnp.where(s == 0, 0.001, s)
    return 2.0 * jnp.arccos(jnp.clip(q[..., 0], -1.0, 1.0)), q[..., 1:] / s[..., None]


_AXES = {"x": (1.0, 0.0, 0.0), "y": (0.0, 1.0, 0.0), "z": (0.0, 0.0, 1.0)}


def from_euler(es: Array, order: str = "xyz", world: bool = False) -> Array:
    """(..., 3) euler angles -> (..., 4) (ref:src/Quaternions.py:450-462)."""
    qs = [
        from_angle_axis(es[..., i], jnp.asarray(_AXES[order[i]], dtype=es.dtype))
        for i in range(3)
    ]
    if world:
        return qmul(qs[2], qmul(qs[1], qs[0]))
    return qmul(qs[0], qmul(qs[1], qs[2]))


def to_euler(q: Array) -> Array:
    """(..., 4) -> (..., 3) xyz euler extraction (ref:src/Quaternions.py:268-272)."""
    q = normalize(q)
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ez = jnp.arctan2(2 * (q0 * q3 - q1 * q2), q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3)
    ey = jnp.arcsin(jnp.clip(2 * (q1 * q3 + q0 * q2), -1.0, 1.0))
    ex = jnp.arctan2(2 * (q0 * q1 - q2 * q3), q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3)
    return jnp.stack([ex, ey, ez], axis=-1)


def exp(w: Array) -> Array:
    """Exponential map: rotation vectors (..., 3) -> quaternions
    (ref:src/Quaternions.py:393-405)."""
    t = jnp.linalg.norm(w, axis=-1)
    t_safe = jnp.where(t == 0, 0.001, t)
    l = jnp.sin(t_safe) / t_safe
    q = jnp.concatenate([jnp.cos(t_safe)[..., None], w * l[..., None]], axis=-1)
    return normalize(q)


def log(q: Array) -> Array:
    """Log map: quaternions -> rotation vectors (..., 3)
    (ref:src/Quaternions.py:196-201)."""
    q = normalize(q)
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))  # abs() hemisphere
    imgs = q[..., 1:]
    lens = jnp.linalg.norm(imgs, axis=-1)
    scale = jnp.arctan2(lens, q[..., 0]) / (lens + _EPS)
    return imgs * scale[..., None]


def slerp(q0: Array, q1: Array, a: Array) -> Array:
    """Spherical interpolation (ref:src/Quaternions.py:408-434); `a` in [0,1]
    broadcasts over the batch."""
    a = jnp.asarray(a, dtype=q0.dtype)
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)
    d = jnp.abs(d)

    linear = (1.0 - d) < 0.01
    omega = jnp.arccos(jnp.clip(jnp.where(linear, 0.0, d), -1.0, 1.0))
    sinom = jnp.where(linear, 1.0, jnp.sin(omega))
    w0 = jnp.where(linear, 1.0 - a, jnp.sin((1.0 - a) * omega) / sinom)
    w1 = jnp.where(linear, a, jnp.sin(a * omega) / sinom)
    return w0[..., None] * q0 + w1[..., None] * q1


def between(v0: Array, v1: Array) -> Array:
    """Quaternion rotating v0 onto v1 (ref:src/Quaternions.py:437-440)."""
    a = jnp.cross(v0, v1)
    w = jnp.sqrt(jnp.sum(v0**2, axis=-1) * jnp.sum(v1**2, axis=-1)) + jnp.sum(
        v0 * v1, axis=-1
    )
    return normalize(jnp.concatenate([w[..., None], a], axis=-1))


def average(qs: Array) -> Array:
    """Eigen-average of a (N, 4) quaternion set (ref:src/Quaternions.py:310-322):
    the eigenvector of sum_i q_i q_i^T best aligned with the inputs."""
    system = jnp.einsum("ni,nj->ij", qs, qs)
    _, v = jnp.linalg.eigh(system)  # columns ascending by eigenvalue
    align = jnp.sum(1.0 - jnp.einsum("ni,ij->nj", qs, v) ** 2, axis=0)
    return v[:, jnp.argmin(align)]
