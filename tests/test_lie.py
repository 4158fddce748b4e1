"""Lie-group identity tests, modeled on Sophus's own test suite
(thirdparty/Sophus/sophus/tests.hpp, test_se3.cpp, test_sim3.cpp):
exp/log round-trip, group axioms, adjoint identity, matrix round-trip,
and action consistency — evaluated batched at f32 tolerances.
"""

import numpy as np
import jax.numpy as jnp
import scipy.linalg

from lsd_slam_tpu import lie

ATOL = 2e-5


def random_tangents(rng, n, dim, scale=1.0):
    t = rng.normal(size=(n, dim)).astype(np.float32) * scale
    return jnp.asarray(t)


# ---------------------------------------------------------------- SO3 / quat

def test_quat_mul_matches_matrix(rng):
    a = lie.so3_exp(random_tangents(rng, 32, 3))
    b = lie.so3_exp(random_tangents(rng, 32, 3))
    lhs = lie.quat_to_matrix(lie.quat_mul(a, b))
    rhs = np.einsum("nij,njk->nik", lie.quat_to_matrix(a), lie.quat_to_matrix(b))
    np.testing.assert_allclose(lhs, rhs, atol=ATOL)


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-8, 1e-4, 0.5, 2.0]:
        w = random_tangents(rng, 64, 3, scale)
        # keep |w| < pi so log is unique
        w = w * (2.9 / jnp.maximum(2.9, jnp.linalg.norm(w, axis=-1, keepdims=True)))
        back = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(back, w, atol=ATOL, rtol=1e-4)


def test_quat_rotate_matches_matrix(rng):
    q = lie.so3_exp(random_tangents(rng, 16, 3))
    p = random_tangents(rng, 16, 3, 3.0)
    np.testing.assert_allclose(
        lie.quat_rotate(q, p),
        np.einsum("nij,nj->ni", lie.quat_to_matrix(q), p),
        atol=ATOL,
    )


def test_matrix_to_quat_roundtrip(rng):
    # include near-pi rotations (trace-negative branch)
    w = random_tangents(rng, 64, 3, 3.0)
    q = lie.so3_exp(w)
    m = lie.quat_to_matrix(q)
    q2 = lie.matrix_to_quat(m)
    # q and -q equal; compare matrices
    np.testing.assert_allclose(lie.quat_to_matrix(q2), m, atol=ATOL)


# ---------------------------------------------------------------------- SE3

def test_se3_exp_log_roundtrip(rng):
    for scale in [1e-8, 1e-3, 1.0]:
        t = random_tangents(rng, 64, 6, scale)
        t = t.at[:, 3:6].multiply(
            2.9 / jnp.maximum(2.9, jnp.linalg.norm(t[:, 3:6], axis=-1, keepdims=True))
        )
        back = lie.se3_log(lie.se3_exp(t))
        np.testing.assert_allclose(back, t, atol=ATOL, rtol=1e-4)


def test_se3_exp_matches_expm(rng):
    """exp agrees with the 4x4 matrix exponential of the twist."""
    t = np.asarray(random_tangents(rng, 8, 6, 0.8), dtype=np.float64)
    for ti in t:
        xi = np.zeros((4, 4))
        xi[:3, :3] = np.asarray(lie.hat(jnp.asarray(ti[3:6])), dtype=np.float64)
        xi[:3, 3] = ti[0:3]
        expected = scipy.linalg.expm(xi)
        got = np.asarray(lie.se3_matrix(lie.se3_exp(jnp.asarray(ti, jnp.float32))))
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_se3_group_axioms(rng):
    a = lie.se3_exp(random_tangents(rng, 32, 6))
    b = lie.se3_exp(random_tangents(rng, 32, 6))
    c = lie.se3_exp(random_tangents(rng, 32, 6))
    # associativity
    np.testing.assert_allclose(
        lie.se3_matrix(lie.se3_mul(lie.se3_mul(a, b), c)),
        lie.se3_matrix(lie.se3_mul(a, lie.se3_mul(b, c))),
        atol=ATOL,
    )
    # inverse
    ident = lie.se3_mul(a, lie.se3_inverse(a))
    np.testing.assert_allclose(
        lie.se3_matrix(ident), np.broadcast_to(np.eye(4), (32, 4, 4)), atol=ATOL
    )


def test_se3_action_matches_matrix(rng):
    g = lie.se3_exp(random_tangents(rng, 16, 6))
    p = random_tangents(rng, 16, 3, 2.0)
    m = lie.se3_matrix(g)
    np.testing.assert_allclose(
        lie.se3_apply(g, p),
        np.einsum("nij,nj->ni", m[:, :3, :3], p) + m[:, :3, 3],
        atol=ATOL,
    )


def test_se3_adjoint_identity(rng):
    """Adj(g) x == log(g exp(x) g^-1) for small x."""
    g = lie.se3_exp(random_tangents(rng, 16, 6))
    x = random_tangents(rng, 16, 6, 1e-3)
    lhs = jnp.einsum("nij,nj->ni", lie.se3_adjoint(g), x)
    rhs = lie.se3_log(lie.se3_mul(lie.se3_mul(g, lie.se3_exp(x)), lie.se3_inverse(g)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5, rtol=1e-3)


def test_se3_from_matrix_roundtrip(rng):
    g = lie.se3_exp(random_tangents(rng, 32, 6, 2.0))
    g2 = lie.se3_from_matrix(lie.se3_matrix(g))
    np.testing.assert_allclose(lie.se3_matrix(g2), lie.se3_matrix(g), atol=ATOL)


# --------------------------------------------------------------------- Sim3

def test_sim3_exp_log_roundtrip(rng):
    for scale in [1e-8, 1e-3, 0.7]:
        t = random_tangents(rng, 64, 7, scale)
        t = t.at[:, 3:6].multiply(
            2.9 / jnp.maximum(2.9, jnp.linalg.norm(t[:, 3:6], axis=-1, keepdims=True))
        )
        back = lie.sim3_log(lie.sim3_exp(t))
        # sigma goes through exp()+log(): TPU-class transcendentals carry
        # ~1e-4 relative error, so the tolerance is looser than SE3's.
        np.testing.assert_allclose(back, t, atol=3e-5, rtol=3e-4)


def test_sim3_exp_matches_expm(rng):
    """exp agrees with the 4x4 matrix exponential of the sim3 generator."""
    t = np.asarray(random_tangents(rng, 8, 7, 0.6), dtype=np.float64)
    for ti in t:
        xi = np.zeros((4, 4))
        xi[:3, :3] = (
            np.asarray(lie.hat(jnp.asarray(ti[3:6])), dtype=np.float64)
            + ti[6] * np.eye(3)
        )
        xi[:3, 3] = ti[0:3]
        expected = scipy.linalg.expm(xi)
        got = np.asarray(lie.sim3_matrix(lie.sim3_exp(jnp.asarray(ti, jnp.float32))))
        np.testing.assert_allclose(got, expected, atol=2e-5)


def test_sim3_group_axioms(rng):
    a = lie.sim3_exp(random_tangents(rng, 32, 7, 0.5))
    b = lie.sim3_exp(random_tangents(rng, 32, 7, 0.5))
    np.testing.assert_allclose(
        lie.sim3_matrix(lie.sim3_mul(a, lie.sim3_inverse(a))),
        np.broadcast_to(np.eye(4), (32, 4, 4)),
        atol=ATOL,
    )
    # composition matches matrix product
    np.testing.assert_allclose(
        lie.sim3_matrix(lie.sim3_mul(a, b)),
        np.einsum("nij,njk->nik", lie.sim3_matrix(a), lie.sim3_matrix(b)),
        atol=ATOL,
    )


def test_sim3_action(rng):
    g = lie.sim3_exp(random_tangents(rng, 16, 7, 0.5))
    p = random_tangents(rng, 16, 3, 2.0)
    m = lie.sim3_matrix(g)
    np.testing.assert_allclose(
        lie.sim3_apply(g, p),
        np.einsum("nij,nj->ni", m[:, :3, :3], p) + m[:, :3, 3],
        atol=ATOL,
    )


def test_sim3_adjoint_identity(rng):
    g = lie.sim3_exp(random_tangents(rng, 16, 7, 0.5))
    x = random_tangents(rng, 16, 7, 1e-3)
    lhs = jnp.einsum("nij,nj->ni", lie.sim3_adjoint(g), x)
    rhs = lie.sim3_log(
        lie.sim3_mul(lie.sim3_mul(g, lie.sim3_exp(x)), lie.sim3_inverse(g))
    )
    np.testing.assert_allclose(lhs, rhs, atol=1e-5, rtol=1e-3)


def test_se3_sim3_converters(rng):
    g = lie.se3_exp(random_tangents(rng, 8, 6))
    s = lie.sim3_from_se3(g, 2.5)
    assert s.shape == (8, 8)
    np.testing.assert_allclose(s[:, 7], 2.5, atol=0)
    back = lie.se3_from_sim3(s)
    np.testing.assert_allclose(back, g, atol=0)
