"""Branch-free quaternion / SE(3) / Sim(3) ops (see package docstring).

Semantics match the reference's Sophus usage (thirdparty/Sophus/sophus/
{so3,se3,sim3}.hpp) — exp/log/compose/inverse/adjoint and the
``se3FromSim3``/``sim3FromSE3`` converters of util/SophusUtil.h:53-63 —
re-derived for masked, batched jnp execution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU MXU default matmul precision is bf16 — catastrophic for pose math.
# Every matmul in this module is tiny (3x3), so full f32 costs nothing.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HI)


def _mv(a, b):
    return jnp.einsum("...ij,...j->...i", a, b, precision=_HI)

# Taylor-fallback threshold. For f32, sin/cos-based formulas lose precision
# below ~1e-3; the quadratic Taylor terms keep ~1e-7 relative error there.
_EPS = 1e-6

# number of terms in the W = sum M^k/(k+1)! series (exact to f32 ULP for
# |omega| <= pi, |sigma| <= ~2; term 14 is pi^14/15! ~ 7e-7 of term 0)
_W_SERIES_TERMS = 16


# --------------------------------------------------------------------------
# quaternions ([w, x, y, z])
# --------------------------------------------------------------------------

def quat_identity(batch_shape=(), dtype=jnp.float32):
    q = jnp.zeros(batch_shape + (4,), dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, p):
    """Rotate points ``p`` (..., 3) by unit quaternions ``q`` (..., 4)."""
    w = q[..., 0:1]
    v = q[..., 1:4]
    # p' = p + 2 w (v x p) + 2 v x (v x p)
    vxp = jnp.cross(v, p)
    return p + 2.0 * (w * vxp + jnp.cross(v, vxp))


def quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix (..., 3, 3) -> unit quaternion, branch-free.

    Uses the 4-candidate construction (one per largest diagonal element)
    blended with where-masks; numerically safe for all rotations.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # candidate 0: trace-dominant
    q0w = safe_sqrt(1.0 + tr)
    q0 = jnp.stack([q0w, (m21 - m12) / q0w, (m02 - m20) / q0w, (m10 - m01) / q0w], -1)
    # candidate 1: m00 dominant
    q1x = safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack([(m21 - m12) / q1x, q1x, (m01 + m10) / q1x, (m02 + m20) / q1x], -1)
    # candidate 2: m11 dominant
    q2y = safe_sqrt(1.0 - m00 + m11 - m22)
    q2 = jnp.stack([(m02 - m20) / q2y, (m01 + m10) / q2y, q2y, (m12 + m21) / q2y], -1)
    # candidate 3: m22 dominant
    q3z = safe_sqrt(1.0 - m00 - m11 + m22)
    q3 = jnp.stack([(m10 - m01) / q3z, (m02 + m20) / q3z, (m12 + m21) / q3z, q3z], -1)

    # pick the best-conditioned candidate
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], -1)
    best = jnp.argmax(scores, axis=-1)[..., None]
    q = jnp.where(best == 0, q0, jnp.where(best == 1, q1, jnp.where(best == 2, q2, q3)))
    return quat_normalize(0.5 * q)


def hat(w):
    """so(3) hat: (..., 3) -> (..., 3, 3) skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


# --------------------------------------------------------------------------
# SO(3)
# --------------------------------------------------------------------------

def so3_exp(omega):
    """Axis-angle (..., 3) -> unit quaternion (..., 4)."""
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    half = 0.5 * theta
    small = theta_sq < _EPS
    # sin(t/2)/t with Taylor 1/2 - t^2/48
    k = jnp.where(
        small,
        0.5 - theta_sq / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, theta),
    )
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * omega], axis=-1)


def so3_log(q):
    """Unit quaternion -> axis-angle (..., 3), |result| in [0, pi]."""
    # force w >= 0 (q and -q are the same rotation)
    q = q * jnp.sign(jnp.where(q[..., 0:1] == 0, 1.0, q[..., 0:1]))
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    vn_sq = jnp.sum(q[..., 1:4] ** 2, axis=-1, keepdims=True)
    vn = jnp.sqrt(vn_sq)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn_sq < _EPS
    # theta / |v| ; Taylor: 2/w * (1 - vn^2/(3 w^2))
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(w, 1e-12) * (1.0 - vn_sq / (3.0 * jnp.maximum(w * w, 1e-12))),
        theta / jnp.where(small, 1.0, vn),
    )
    return scale * q[..., 1:4]


# --------------------------------------------------------------------------
# the unified V/W matrix: W(omega, sigma) = sum_k M^k / (k+1)!,
# M = sigma*I + hat(omega).  sigma=0 gives SE3's left Jacobian V.
# --------------------------------------------------------------------------

def _w_matrix(omega, sigma):
    batch = jnp.broadcast_shapes(omega.shape[:-1], sigma.shape)
    dtype = omega.dtype
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))
    m = sigma[..., None, None] * eye + hat(omega)
    m = jnp.broadcast_to(m, batch + (3, 3))
    # Horner evaluation of sum_{k=0}^{N} M^k/(k+1)!
    #   = I + (M/2)(I + (M/3)(I + ... (I + M/(N+1)) ...))
    w = eye
    for k in range(_W_SERIES_TERMS, 0, -1):
        w = eye + _mm(m, w) / float(k + 1)
    return w


def _solve33(a, b):
    """Closed-form 3x3 solve via the adjugate (full f32, no LU dispatch).

    W is well-conditioned (det >= ~0.4 for |omega| <= pi), so the cofactor
    formula is accurate and much cheaper than batched LU on TPU.
    """
    c0 = jnp.cross(a[..., 1, :], a[..., 2, :])
    c1 = jnp.cross(a[..., 2, :], a[..., 0, :])
    c2 = jnp.cross(a[..., 0, :], a[..., 1, :])
    det = jnp.sum(a[..., 0, :] * c0, axis=-1, keepdims=True)
    # inv(A) has columns [c0 c1 c2]/det, so x = (b0*c0 + b1*c1 + b2*c2)/det
    x = b[..., 0:1] * c0 + b[..., 1:2] * c1 + b[..., 2:3] * c2
    return x / det


def _w_inverse_apply(omega, sigma, t):
    """Solve W(omega, sigma) x = t for x (3-vector)."""
    return _solve33(_w_matrix(omega, sigma), t)


# --------------------------------------------------------------------------
# SE(3): (..., 7) = [quat(4), t(3)]; tangent (..., 6) = [upsilon, omega]
# --------------------------------------------------------------------------

def se3_identity(batch_shape=(), dtype=jnp.float32):
    g = jnp.zeros(batch_shape + (7,), dtype)
    return g.at[..., 0].set(1.0)


def se3_exp(tangent):
    ups, omega = tangent[..., 0:3], tangent[..., 3:6]
    q = so3_exp(omega)
    t = _mv(_w_matrix(omega, jnp.zeros(omega.shape[:-1], omega.dtype)), ups)
    return jnp.concatenate([q, t], axis=-1)


def se3_log(g):
    q, t = g[..., 0:4], g[..., 4:7]
    omega = so3_log(q)
    ups = _w_inverse_apply(omega, jnp.zeros(omega.shape[:-1], omega.dtype), t)
    return jnp.concatenate([ups, omega], axis=-1)


def se3_mul(a, b):
    qa, ta = a[..., 0:4], a[..., 4:7]
    qb, tb = b[..., 0:4], b[..., 4:7]
    return jnp.concatenate(
        [quat_normalize(quat_mul(qa, qb)), quat_rotate(qa, tb) + ta], axis=-1
    )


def se3_inverse(g):
    q, t = g[..., 0:4], g[..., 4:7]
    qi = quat_conj(q)
    return jnp.concatenate([qi, -quat_rotate(qi, t)], axis=-1)


def se3_apply(g, p):
    return quat_rotate(g[..., 0:4], p) + g[..., 4:7]


def se3_matrix(g):
    r = quat_to_matrix(g[..., 0:4])
    m = jnp.zeros(g.shape[:-1] + (4, 4), g.dtype)
    m = m.at[..., 0:3, 0:3].set(r)
    m = m.at[..., 0:3, 3].set(g[..., 4:7])
    return m.at[..., 3, 3].set(1.0)


def se3_from_matrix(m):
    return jnp.concatenate([matrix_to_quat(m[..., 0:3, 0:3]), m[..., 0:3, 3]], axis=-1)


def se3_adjoint(g):
    """Adjoint in [upsilon, omega] ordering: [[R, hat(t)R], [0, R]]."""
    r = quat_to_matrix(g[..., 0:4])
    t = g[..., 4:7]
    adj = jnp.zeros(g.shape[:-1] + (6, 6), g.dtype)
    adj = adj.at[..., 0:3, 0:3].set(r)
    adj = adj.at[..., 0:3, 3:6].set(_mm(hat(t), r))
    return adj.at[..., 3:6, 3:6].set(r)


# --------------------------------------------------------------------------
# Sim(3): (..., 8) = [quat(4), t(3), s]; tangent (..., 7) = [ups, omega, sigma]
# --------------------------------------------------------------------------

def sim3_identity(batch_shape=(), dtype=jnp.float32):
    g = jnp.zeros(batch_shape + (8,), dtype)
    g = g.at[..., 0].set(1.0)
    return g.at[..., 7].set(1.0)


def sim3_exp(tangent):
    ups, omega, sigma = tangent[..., 0:3], tangent[..., 3:6], tangent[..., 6]
    q = so3_exp(omega)
    s = jnp.exp(sigma)
    t = _mv(_w_matrix(omega, sigma), ups)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_log(g):
    q, t, s = g[..., 0:4], g[..., 4:7], g[..., 7]
    omega = so3_log(q)
    sigma = jnp.log(s)
    ups = _w_inverse_apply(omega, sigma, t)
    return jnp.concatenate([ups, omega, sigma[..., None]], axis=-1)


def sim3_mul(a, b):
    qa, ta, sa = a[..., 0:4], a[..., 4:7], a[..., 7:8]
    qb, tb, sb = b[..., 0:4], b[..., 4:7], b[..., 7:8]
    return jnp.concatenate(
        [
            quat_normalize(quat_mul(qa, qb)),
            sa * quat_rotate(qa, tb) + ta,
            sa * sb,
        ],
        axis=-1,
    )


def sim3_inverse(g):
    q, t, s = g[..., 0:4], g[..., 4:7], g[..., 7:8]
    qi = quat_conj(q)
    si = 1.0 / s
    return jnp.concatenate([qi, -si * quat_rotate(qi, t), si], axis=-1)


def sim3_apply(g, p):
    return g[..., 7:8] * quat_rotate(g[..., 0:4], p) + g[..., 4:7]


def sim3_matrix(g):
    r = quat_to_matrix(g[..., 0:4]) * g[..., 7:8, None]
    m = jnp.zeros(g.shape[:-1] + (4, 4), g.dtype)
    m = m.at[..., 0:3, 0:3].set(r)
    m = m.at[..., 0:3, 3].set(g[..., 4:7])
    return m.at[..., 3, 3].set(1.0)


def sim3_adjoint(g):
    """Sim3 adjoint, [ups, omega, sigma] ordering (Sophus sim3.hpp Adj):

        [[s R, hat(t) R, -t],
         [ 0 ,    R    ,  0],
         [ 0 ,    0    ,  1]]
    """
    r = quat_to_matrix(g[..., 0:4])
    t = g[..., 4:7]
    s = g[..., 7]
    adj = jnp.zeros(g.shape[:-1] + (7, 7), g.dtype)
    adj = adj.at[..., 0:3, 0:3].set(s[..., None, None] * r)
    adj = adj.at[..., 0:3, 3:6].set(_mm(hat(t), r))
    adj = adj.at[..., 0:3, 6].set(-t)
    adj = adj.at[..., 3:6, 3:6].set(r)
    return adj.at[..., 6, 6].set(1.0)


def se3_from_sim3(g):
    """Drop the scale, keep rotation+translation (util/SophusUtil.h:60-63)."""
    return g[..., 0:7]


def sim3_from_se3(g, scale=1.0):
    """Attach an explicit scale (util/SophusUtil.h:53-58)."""
    s = jnp.broadcast_to(jnp.asarray(scale, g.dtype), g.shape[:-1] + (1,))
    return jnp.concatenate([g, s], axis=-1)
