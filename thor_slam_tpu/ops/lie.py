"""JAX Lie-group math: SO(3)/SE(3) exp/log, quaternions — batched, jit-safe.

Device-side counterpart of :mod:`thor_slam_tpu.geometry` (host/numpy).
Quaternions are xyzw. All functions operate on single elements with standard
shapes ((3,), (3,3), (4,4), (6,)) and are written to be `vmap`-able; small-
angle branches use Taylor expansions selected with `jnp.where` so gradients
stay finite everywhere (required by the Gauss-Newton solvers in engine/).

Convention for se(3) tangent vectors: ``xi = [rho, phi]`` with translation
part first, rotation part last — matching the 6x6 covariance layout of
:class:`~thor_slam_tpu.slam.interface.SlamPose` (translation block first).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: 3-vector -> 3x3 skew-symmetric matrix."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y]),
            jnp.stack([z, zero, -x]),
            jnp.stack([-y, x, zero]),
        ]
    )


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`."""
    return jnp.stack([m[2, 1], m[0, 2], m[1, 0]])


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: rotation vector (3,) -> rotation matrix (3,3)."""
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    k = hat(phi)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near zero.
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    return jnp.eye(3) + a * k + b * (k @ k)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> rotation vector (3,). Safe near 0 and pi.

    Routes through the branch-free quaternion conversion and the quaternion
    log: phi = 2 * atan2(|q_v|, q_w) * q_v / |q_v|, with a Taylor fallback
    for tiny |q_v| (atan2 keeps the angle well-conditioned near pi, where
    the classic trace formula loses precision).
    """
    q = matrix_to_quat(r)
    qv, qw = q[:3], q[3]
    n = jnp.linalg.norm(qv)
    angle = 2.0 * jnp.arctan2(n, qw)
    scale = jnp.where(n > _EPS, angle / jnp.maximum(n, _EPS), 2.0 / jnp.maximum(qw, _EPS))
    return qv * scale


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): d(exp) w.r.t. the tangent."""
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    k = hat(phi)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(
        theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0 - theta2 / 120.0
    )
    return jnp.eye(3) + b * k + c * (k @ k)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent [rho, phi] (6,) -> 4x4 homogeneous transform."""
    rho, phi = xi[:3], xi[3:]
    r = so3_exp(phi)
    t = so3_left_jacobian(phi) @ rho
    m = jnp.eye(4)
    m = m.at[:3, :3].set(r)
    m = m.at[:3, 3].set(t)
    return m


def se3_log(m: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous transform -> se(3) tangent [rho, phi] (6,)."""
    phi = so3_log(m[:3, :3])
    # Invert the left Jacobian analytically via its closed form.
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    k = hat(phi)
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        theta2 > _EPS,
        (1.0 - 0.5 * theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS)) / theta2,
        1.0 / 12.0 + theta2 / 720.0,
    )
    j_inv = jnp.eye(3) - 0.5 * k + cot_term * (k @ k)
    rho = j_inv @ m[:3, 3]
    return jnp.concatenate([rho, phi])


def se3_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Analytic rigid inverse of a 4x4 transform."""
    r = m[:3, :3]
    t = m[:3, 3]
    out = jnp.eye(4)
    out = out.at[:3, :3].set(r.T)
    out = out.at[:3, 3].set(-r.T @ t)
    return out


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to (..., 3) points."""
    return pts @ m[:3, :3].T + m[:3, 3]


# ---------------------------------------------------------------------------
# Quaternions (xyzw) in JAX
# ---------------------------------------------------------------------------

def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (xyzw) -> 3x3 rotation matrix."""
    q = q / jnp.linalg.norm(q)
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
        ]
    )


def matrix_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion (xyzw), branch-free.

    Uses the max-component formulation evaluated for all four candidates and
    selected with where (jit/vmap-safe, no data-dependent branching).
    """
    t = jnp.trace(r)
    # candidates[i] = un-normalized (x, y, z, w) computed under the
    # hypothesis that component i (x, y, z, w order) is the largest;
    # each is proportional to the true quaternion by 4 * component_i.
    qx = jnp.stack(
        [1.0 + r[0, 0] - r[1, 1] - r[2, 2], r[0, 1] + r[1, 0], r[0, 2] + r[2, 0], r[2, 1] - r[1, 2]]
    )
    qy = jnp.stack(
        [r[0, 1] + r[1, 0], 1.0 - r[0, 0] + r[1, 1] - r[2, 2], r[1, 2] + r[2, 1], r[0, 2] - r[2, 0]]
    )
    qz = jnp.stack(
        [r[0, 2] + r[2, 0], r[1, 2] + r[2, 1], 1.0 - r[0, 0] - r[1, 1] + r[2, 2], r[1, 0] - r[0, 1]]
    )
    qw = jnp.stack([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1], 1.0 + t])
    candidates = jnp.stack([qx, qy, qz, qw])
    # mags[i] = (4 * component_i)^2 / 4 — picking the max selects the
    # best-conditioned hypothesis.
    mags = jnp.stack(
        [
            1.0 + r[0, 0] - r[1, 1] - r[2, 2],
            1.0 - r[0, 0] + r[1, 1] - r[2, 2],
            1.0 - r[0, 0] - r[1, 1] + r[2, 2],
            1.0 + t,
        ]
    )
    best = jnp.argmax(mags)
    q = candidates[best]
    q = q / jnp.linalg.norm(q)
    return jnp.where(q[3] < 0, -q, q)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (xyzw)."""
    x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
    x2, y2, z2, w2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )
