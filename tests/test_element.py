"""Element-core tests: quadrature exactness, shape functions, element
integrals vs the NumPy oracle, mechanical invariants (symmetry, rigid-body
nullspace, mass/force totals)."""

import numpy as np
import jax.numpy as jnp
import pytest

from savtpu.ops.quadrature import tet_quadrature
from savtpu.ops.shape import shape_function, shape_derivative
from savtpu.ops.element import (
    batch_element_k,
    batch_element_mkf,
    element_mkf,
)
from savtpu.ops.material import LinearElastic

import oracle


def _material():
    return LinearElastic.from_engineering(
        E=1e6, nu=0.3, rho=1.0, fz=0.5, ramped=False
    )


def _random_tets(n, seed=0):
    rng = np.random.default_rng(seed)
    tets = []
    while len(tets) < n:
        P = rng.uniform(-1, 1, size=(4, 3))
        J = P.T @ oracle.P1_DERI
        if np.linalg.det(J) > 0.05:  # positively oriented, non-degenerate
            tets.append(P)
    return np.array(tets)


# ---------------- quadrature ----------------

@pytest.mark.parametrize("n,npts", [(2, 4), (3, 5), (4, 14)])
def test_quadrature_weight_sum(n, npts):
    nodes, w = tet_quadrature(n)
    assert nodes.shape == (npts, 3)
    assert abs(w.sum() - 1.0 / 6.0) < 1e-15


@pytest.mark.parametrize("n,deg", [(2, 2), (3, 3), (4, 4)])
def test_quadrature_polynomial_exactness(n, deg):
    nodes, w = tet_quadrature(n)
    # exact integrals of x^a y^b z^c over the reference tet:
    # a! b! c! / (a+b+c+3)!
    from math import factorial

    for a in range(deg + 1):
        for b in range(deg + 1 - a):
            c = deg - a - b
            exact = (
                factorial(a)
                * factorial(b)
                * factorial(c)
                / factorial(a + b + c + 3)
            )
            approx = (
                w * nodes[:, 0] ** a * nodes[:, 1] ** b * nodes[:, 2] ** c
            ).sum()
            assert abs(approx - exact) < 1e-14, (a, b, c)


# ---------------- shape functions ----------------

@pytest.mark.parametrize("deg", [1, 2])
def test_partition_of_unity(deg):
    rng = np.random.default_rng(1)
    for _ in range(5):
        xi = jnp.asarray(rng.dirichlet(np.ones(4))[:3])
        N = shape_function(deg, xi)
        dN = shape_derivative(deg, xi)
        assert abs(float(N.sum()) - 1.0) < 1e-14
        assert np.abs(np.asarray(dN).sum(axis=0)).max() < 1e-13


@pytest.mark.parametrize("deg", [1, 2])
def test_kronecker_at_nodes(deg):
    # P1 vertices; P2 vertices + edge midpoints (gmsh tet10 ordering)
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float
    )
    if deg == 1:
        nodes = verts
    else:
        edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]
        mids = np.array([(verts[a] + verts[b]) / 2 for a, b in edges])
        nodes = np.vstack([verts, mids])
    vals = np.array(
        [np.asarray(shape_function(deg, jnp.asarray(x))) for x in nodes]
    )
    assert np.allclose(vals, np.eye(len(nodes)), atol=1e-14)


# ---------------- element integrals ----------------

def test_element_mkf_matches_oracle():
    mat = _material()
    for P in _random_tets(6):
        M, K, F = element_mkf(1, 2, mat, 0.0, jnp.asarray(P))
        fvec = np.array([0.0, -mat.fz, -mat.fz])
        Mo, Ko, Fo = oracle.element_mkf(P, mat.lmd, mat.mu, mat.rho, fvec)
        assert np.allclose(np.asarray(K), Ko, rtol=1e-12, atol=1e-9)
        assert np.allclose(np.asarray(M), Mo, rtol=1e-12, atol=1e-14)
        assert np.allclose(np.asarray(F), Fo, rtol=1e-12, atol=1e-14)


def test_element_k_rigid_body_nullspace():
    mat = _material()
    for P in _random_tets(4, seed=3):
        K = np.asarray(element_mkf(1, 2, mat, 0.0, jnp.asarray(P))[1])
        assert np.allclose(K, K.T, atol=1e-9)
        # translations
        for c in range(3):
            mode = np.zeros(12)
            mode[c::3] = 1.0
            assert np.abs(K @ mode).max() < 1e-8
        # infinitesimal rotations: u = w x X
        for w in np.eye(3):
            mode = np.cross(np.broadcast_to(w, (4, 3)), P).reshape(-1)
            assert np.abs(K @ mode).max() < 1e-7


def test_element_mass_and_force_totals():
    mat = _material()
    for P in _random_tets(4, seed=5):
        M, K, F = element_mkf(1, 2, mat, 0.0, jnp.asarray(P))
        vol = np.linalg.det(P.T @ oracle.P1_DERI) / 6.0
        assert abs(float(jnp.sum(M)) - 3 * mat.rho * vol) < 1e-10
        # total force = volume * f per component
        tot = np.asarray(F).reshape(4, 3).sum(axis=0)
        assert np.allclose(tot, vol * np.array([0, -mat.fz, -mat.fz]), atol=1e-12)


def test_batch_matches_single():
    mat = _material()
    Ps = _random_tets(8, seed=7)
    Mb, Kb, Fb = batch_element_mkf(1, 2, mat, 0.0, jnp.asarray(Ps))
    Kb2 = batch_element_k(1, 2, mat, jnp.asarray(Ps))
    for e in range(8):
        M, K, F = element_mkf(1, 2, mat, 0.0, jnp.asarray(Ps[e]))
        assert np.allclose(Kb[e], K)
        assert np.allclose(Kb2[e], K)
        assert np.allclose(Mb[e], M)
        assert np.allclose(Fb[e], F)
