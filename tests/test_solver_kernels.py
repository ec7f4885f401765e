"""Property-based tests for the numpy solver kernels against naive
per-ID reference implementations (hypothesis-driven)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from collective_als_spark.cmf import solver as S


@st.composite
def grouped_data(draw):
    k = draw(st.integers(2, 6))
    n_groups = draw(st.integers(1, 5))
    rows = []
    for g in range(n_groups):
        n = draw(st.integers(1, 6))
        rows.extend([g * 7] * n)
    ids = np.array(rows, dtype=np.int64)
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    X = rng.normal(size=(len(ids), k))
    r = rng.normal(size=len(ids))
    return ids, X, r


@given(grouped_data())
@settings(max_examples=30, deadline=None)
def test_normal_equations_match_naive(data):
    ids, X, r = data
    uids, AtA, Atb, counts = S.build_normal_equations(ids, X, r)
    for gi, uid in enumerate(uids):
        mask = ids == uid
        Xg, rg = X[mask], r[mask]
        np.testing.assert_allclose(AtA[gi], Xg.T @ Xg, atol=1e-9)
        np.testing.assert_allclose(Atb[gi], Xg.T @ rg, atol=1e-9)
        assert counts[gi] == mask.sum()


@given(grouped_data())
@settings(max_examples=30, deadline=None)
def test_cholesky_solves_ridge(data):
    ids, X, r = data
    uids, AtA, Atb, counts = S.build_normal_equations(ids, X, r)
    lam = counts * 0.1
    sol = S.solve_cholesky(AtA, Atb, lam)
    k = X.shape[1]
    for gi in range(len(uids)):
        expect = np.linalg.solve(AtA[gi] + lam[gi] * np.eye(k), Atb[gi])
        np.testing.assert_allclose(sol[gi], expect, atol=1e-7)


@given(grouped_data())
@settings(max_examples=20, deadline=None)
def test_nnls_kkt_conditions(data):
    ids, X, r = data
    uids, AtA, Atb, counts = S.build_normal_equations(ids, X, r)
    lam = counts * 0.1 + 0.05
    sol = S.solve_nnls(AtA, Atb, lam, iters=500)
    k = X.shape[1]
    assert (sol >= 0).all()
    for gi in range(len(uids)):
        A = AtA[gi] + lam[gi] * np.eye(k)
        grad = A @ sol[gi] - Atb[gi]
        # KKT: gradient ~0 where x>0, gradient >= 0 where x == 0
        active = sol[gi] > 1e-10
        np.testing.assert_allclose(grad[active], 0.0, atol=1e-5)
        assert (grad[~active] >= -1e-6).all()


def test_init_factors_deterministic_and_unit_norm():
    ids = np.array([1, 5, 99, 2**31 - 1], dtype=np.int64)
    a = S.init_factors_for_ids(ids, 8, seed=3, entity_index=0)
    b = S.init_factors_for_ids(ids, 8, seed=3, entity_index=0)
    c = S.init_factors_for_ids(ids, 8, seed=3, entity_index=1)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)  # different entity -> different stream
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
    # distinct ids get distinct vectors (fixes reference quirk Q1)
    assert not np.allclose(a[0], a[1])
