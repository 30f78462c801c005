"""Math layer oracle tests (SVD vs numpy.linalg, sparse vs dense, solvers
vs direct solve; reference test strategy SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zpc_tpu import math as zm


class TestSVD:
    def test_svd3x3_random(self, rng):
        A = rng.standard_normal((64, 3, 3)).astype(np.float32)
        U, s, V = jax.jit(zm.svd3x3)(jnp.asarray(A))
        U, s, V = map(np.asarray, (U, s, V))
        # reconstruction
        rec = U @ (s[..., :, None] * np.swapaxes(V, -1, -2))
        np.testing.assert_allclose(rec, A, atol=2e-5)
        # rotations
        np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=1e-4)
        np.testing.assert_allclose(U @ np.swapaxes(U, -1, -2),
                                   np.broadcast_to(np.eye(3), U.shape),
                                   atol=1e-5)
        # singular value magnitudes match numpy
        ref = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(np.abs(s), ref, atol=1e-4, rtol=1e-4)

    def test_svd3x3_special(self):
        mats = np.stack([
            np.eye(3),
            np.zeros((3, 3)),
            np.diag([1.0, 1.0, -1.0]),          # reflection
            np.diag([5.0, 5.0, 5.0]),
            np.array([[1, 2, 3], [2, 4, 6], [3, 6, 9.0]]),  # rank 1
            np.diag([1.0, 1e-8, 1e-8]),          # near rank 1
        ]).astype(np.float32)
        U, s, V = zm.svd3x3(jnp.asarray(mats))
        U, s, V = map(np.asarray, (U, s, V))
        rec = U @ (s[..., :, None] * np.swapaxes(V, -1, -2))
        np.testing.assert_allclose(rec, mats, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-4)

    def test_svd3x3_custom_jvp(self, rng):
        """Analytic svd3x3 tangent vs central finite differences.

        The closed-form custom_jvp (svd.py) is what the implicit MPM CG
        operator differentiates through; checked on the well-conditioned
        outputs s and R = U V^T, in the near-identity regime elasticity
        lives in (repeated singular values — U, V individually are
        non-differentiable there, R stays smooth).
        """
        F = jnp.asarray(np.eye(3, dtype=np.float32) +
                        0.05 * rng.standard_normal((32, 3, 3)).astype(
                            np.float32))
        dA = jnp.asarray(rng.standard_normal((32, 3, 3)).astype(np.float32))
        (U, s, V), (dU, ds, dV) = jax.jvp(
            lambda X: zm.svd3x3(X), (F,), (dA,))
        # exact identity: d(U diag(s) V^T) = dA (robust to the sorted-order
        # branch crossings that break a finite-difference check on ds)
        U_, s_, V_, dU_, ds_, dV_ = map(
            np.asarray, (U, s, V, dU, ds, dV))
        dRec = (np.einsum("nij,nj,nkj->nik", dU_, s_, V_) +
                np.einsum("nij,nj,nkj->nik", U_, ds_, V_) +
                np.einsum("nij,nj,nkj->nik", U_, s_, dV_))
        assert np.isfinite(dRec).all()
        # the clamped inverses intentionally bias dU/dV where singular
        # values (nearly) coincide; check the identity away from that set
        gap = np.min(np.abs(s_[:, :, None] - s_[:, None, :]) +
                     10.0 * np.eye(3), axis=(1, 2))
        ok = gap > 0.02
        assert ok.sum() >= 8    # the 0.05-spread batch has plenty
        np.testing.assert_allclose(dRec[ok], np.asarray(dA)[ok], atol=1e-3)
        h = 1e-3
        Up, sp, Vp = zm.svd3x3(F + h * dA)
        Um, sm, Vm = zm.svd3x3(F - h * dA)
        dR = np.einsum("nij,nkj->nik", np.asarray(dU), np.asarray(V)) + \
            np.einsum("nij,nkj->nik", np.asarray(U), np.asarray(dV))
        dR_fd = (np.einsum("nij,nkj->nik", np.asarray(Up), np.asarray(Vp)) -
                 np.einsum("nij,nkj->nik", np.asarray(Um), np.asarray(Vm))
                 ) / (2 * h)
        np.testing.assert_allclose(dR, dR_fd, atol=5e-3)

    def test_svd2x2(self, rng):
        A = rng.standard_normal((32, 2, 2)).astype(np.float32)
        U, s, V = zm.svd2x2(jnp.asarray(A))
        U, s, V = map(np.asarray, (U, s, V))
        rec = U @ (s[..., :, None] * np.swapaxes(V, -1, -2))
        np.testing.assert_allclose(rec, A, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-5)

    def test_polar(self, rng):
        A = rng.standard_normal((16, 3, 3)).astype(np.float32)
        # bias away from singular
        A += 2.0 * np.eye(3)
        R, S = zm.polar_decomposition(jnp.asarray(A))
        R, S = np.asarray(R), np.asarray(S)
        np.testing.assert_allclose(R @ S, A, atol=2e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
        np.testing.assert_allclose(S, np.swapaxes(S, -1, -2), atol=1e-5)

    def test_polar_newton(self, rng):
        """Newton polar factor matches the SVD polar factor (det > 0) and
        stays finite for degenerate/inverted inputs."""
        A = rng.standard_normal((64, 3, 3)).astype(np.float32) * 0.2
        A += np.eye(3)                       # MPM regime: F near identity
        A = A[np.linalg.det(A) > 0.05]
        R = np.asarray(zm.polar_newton3x3(jnp.asarray(A)))
        Rref, _ = zm.polar_decomposition(jnp.asarray(A))
        np.testing.assert_allclose(R, np.asarray(Rref), atol=2e-5)
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3), R.shape),
                                   atol=1e-5)
        # degenerate + inverted: finite orthogonal output, no NaN
        bad = np.stack([np.zeros((3, 3), np.float32),
                        np.diag([-1.0, 1.0, 1.0]).astype(np.float32)])
        Rb = np.asarray(zm.polar_newton3x3(jnp.asarray(bad), iters=8))
        assert np.all(np.isfinite(Rb))
        np.testing.assert_allclose(Rb[1] @ Rb[1].T, np.eye(3), atol=1e-5)

    def test_eigh3x3(self, rng):
        A = rng.standard_normal((32, 3, 3)).astype(np.float32)
        A = 0.5 * (A + np.swapaxes(A, -1, -2))
        w, V = zm.eigh3x3(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        ref = np.sort(np.linalg.eigvalsh(A), axis=-1)[..., ::-1]
        np.testing.assert_allclose(w, ref, atol=1e-4)
        # A V = V diag(w)
        np.testing.assert_allclose(A @ V, V * w[..., None, :], atol=1e-4)


class TestInterpolation:
    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_partition_of_unity(self, order, rng):
        x = rng.uniform(2.0, 30.0, 256).astype(np.float32)
        base, w, dw = zm.bspline_weights(jnp.asarray(x), order)
        w, dw = np.asarray(w), np.asarray(dw)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(dw.sum(-1), 0.0, atol=1e-5)
        assert (w >= -1e-6).all()

    @pytest.mark.parametrize("order", [1, 2, 3])
    def test_linear_reproduction(self, order, rng):
        # interpolating node positions reproduces x exactly
        x = rng.uniform(2.0, 30.0, 128).astype(np.float32)
        base, w, dw = zm.bspline_weights(jnp.asarray(x), order)
        base, w = np.asarray(base), np.asarray(w)
        nodes = base[:, None] + np.arange(zm.stencil_size(order))[None, :]
        np.testing.assert_allclose((w * nodes).sum(-1), x, rtol=1e-5,
                                   atol=1e-4)
        # gradient of x interpolation = 1
        dw = np.asarray(dw)
        np.testing.assert_allclose((dw * nodes).sum(-1), 1.0, atol=1e-3)

    def test_base_node_window(self, rng):
        x = rng.uniform(2.0, 30.0, 256).astype(np.float32)
        for order in (1, 2, 3):
            base = np.asarray(zm.base_node(jnp.asarray(x), order))
            S = zm.stencil_size(order)
            assert ((x - base) >= 0).all()
            assert ((base + S - x) > 0).all()


class TestSparse:
    def _random_coo(self, rng, nrows, ncols, nnz):
        r = rng.integers(0, nrows, nnz).astype(np.int32)
        c = rng.integers(0, ncols, nnz).astype(np.int32)
        v = rng.standard_normal(nnz).astype(np.float32)
        return r, c, v

    def test_build_matches_dense(self, rng):
        r, c, v = self._random_coo(rng, 20, 30, 200)
        A = zm.csr_from_coo(jnp.asarray(r), jnp.asarray(c), jnp.asarray(v),
                            20, 30)
        dense = np.zeros((20, 30), np.float32)
        np.add.at(dense, (r, c), v)
        np.testing.assert_allclose(np.asarray(A.todense()), dense, atol=1e-5)

    def test_spmv(self, rng):
        r, c, v = self._random_coo(rng, 50, 40, 500)
        A = zm.csr_from_coo(jnp.asarray(r), jnp.asarray(c), jnp.asarray(v),
                            50, 40)
        x = rng.standard_normal(40).astype(np.float32)
        dense = np.zeros((50, 40), np.float32)
        np.add.at(dense, (r, c), v)
        got = np.asarray(zm.spmv(A, jnp.asarray(x)))
        np.testing.assert_allclose(got, dense @ x, atol=1e-4, rtol=1e-4)

    def test_transpose(self, rng):
        r, c, v = self._random_coo(rng, 15, 25, 100)
        A = zm.csr_from_coo(jnp.asarray(r), jnp.asarray(c), jnp.asarray(v),
                            15, 25)
        At = zm.csr_transpose(A)
        np.testing.assert_allclose(np.asarray(At.todense()),
                                   np.asarray(A.todense()).T, atol=1e-5)

    def test_min_plus_semiring(self, rng):
        # shortest-path relaxation step oracle
        n = 12
        r, c, _ = self._random_coo(rng, n, n, 40)
        w = rng.uniform(0.1, 2.0, 40).astype(np.float32)
        A = zm.csr_from_coo(jnp.asarray(r), jnp.asarray(c), jnp.asarray(w),
                            n, n, combine="max")  # dedupe by max weight
        dense = np.full((n, n), np.inf, np.float32)
        for ri, ci, wi in zip(r, c, w):
            dense[ri, ci] = max(dense[ri, ci], wi) if np.isfinite(dense[ri, ci]) else wi
        x = rng.uniform(0, 5, n).astype(np.float32)
        got = np.asarray(zm.spmv_semiring(A, jnp.asarray(x), "min_plus"))
        ref = np.min(dense + x[None, :], axis=1)
        # rows with no entries -> inf in both
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_spmv_under_jit(self, rng):
        r, c, v = self._random_coo(rng, 30, 30, 150)
        x = rng.standard_normal(30).astype(np.float32)

        @jax.jit
        def go(r, c, v, x):
            A = zm.csr_from_coo(r, c, v, 30, 30)
            return zm.spmv(A, x)

        dense = np.zeros((30, 30), np.float32)
        np.add.at(dense, (r, c), v)
        got = np.asarray(go(jnp.asarray(r), jnp.asarray(c), jnp.asarray(v),
                            jnp.asarray(x)))
        np.testing.assert_allclose(got, dense @ x, atol=1e-4, rtol=1e-4)


class TestSolvers:
    def _spd_system(self, rng, n=40):
        M = rng.standard_normal((n, n)).astype(np.float32)
        A = M @ M.T + n * np.eye(n, dtype=np.float32)
        b = rng.standard_normal(n).astype(np.float32)
        return A, b

    def test_cg(self, rng):
        A, b = self._spd_system(rng)
        res = zm.cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                    max_iters=200, rel_tol=1e-6)
        ref = np.linalg.solve(A, b)
        np.testing.assert_allclose(np.asarray(res.x), ref, atol=1e-3,
                                   rtol=1e-3)
        assert bool(res.converged)

    def test_cg_preconditioned(self, rng):
        A, b = self._spd_system(rng)
        dinv = 1.0 / np.diag(A)
        res = zm.cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                    precondition=lambda r: jnp.asarray(dinv) * r,
                    max_iters=200, rel_tol=1e-6)
        np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                                   atol=1e-3, rtol=1e-3)

    def test_cg_projected(self, rng):
        # Dirichlet: freeze dof 0 at 0
        A, b = self._spd_system(rng, 20)
        mask = np.ones(20, np.float32)
        mask[0] = 0.0
        proj = lambda v: jnp.asarray(mask) * v
        res = zm.cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                    project=proj, max_iters=200, rel_tol=1e-6)
        x = np.asarray(res.x)
        assert abs(x[0]) < 1e-6
        # solves the reduced system
        Ar = A[1:, 1:]
        np.testing.assert_allclose(x[1:], np.linalg.solve(Ar, b[1:]),
                                   atol=1e-3, rtol=1e-3)

    def test_cg_pytree(self, rng):
        A, b = self._spd_system(rng, 16)
        bt = {"a": jnp.asarray(b[:8]), "b": jnp.asarray(b[8:])}

        def mul(x):
            xv = jnp.concatenate([x["a"], x["b"]])
            y = jnp.asarray(A) @ xv
            return {"a": y[:8], "b": y[8:]}

        res = zm.cg(mul, bt, max_iters=100, rel_tol=1e-6)
        x = np.concatenate([np.asarray(res.x["a"]), np.asarray(res.x["b"])])
        np.testing.assert_allclose(x, np.linalg.solve(A, b), atol=1e-3,
                                   rtol=1e-3)

    def test_cr_minres_indefinite(self, rng):
        n = 24
        M = rng.standard_normal((n, n)).astype(np.float32)
        A = 0.5 * (M + M.T)  # symmetric indefinite
        A += np.sign(np.trace(A)) * 0.0  # keep as-is
        b = rng.standard_normal(n).astype(np.float32)
        ref = np.linalg.solve(A, b)
        res_mr = zm.minres(lambda x: jnp.asarray(A) @ x, jnp.asarray(b),
                           max_iters=300, rel_tol=1e-6)
        np.testing.assert_allclose(np.asarray(res_mr.x), ref, atol=5e-2,
                                   rtol=5e-2)

    def test_cr_spd(self, rng):
        A, b = self._spd_system(rng, 24)
        res = zm.conjugate_residual(lambda x: jnp.asarray(A) @ x,
                                    jnp.asarray(b), max_iters=200,
                                    rel_tol=1e-6)
        np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                                   atol=1e-3, rtol=1e-3)


class TestTransformQuat:
    def test_quat_matrix_roundtrip(self, rng):
        axis = rng.standard_normal((32, 3)).astype(np.float32)
        ang = rng.uniform(-3, 3, 32).astype(np.float32)
        q = zm.quat_from_axis_angle(jnp.asarray(axis), jnp.asarray(ang))
        R = zm.quat_to_matrix(q)
        q2 = zm.quat_from_matrix(R)
        # q and -q are the same rotation
        d = np.abs(np.sum(np.asarray(q) * np.asarray(q2), -1))
        np.testing.assert_allclose(d, 1.0, atol=1e-4)

    def test_quat_rotate_matches_matrix(self, rng):
        axis = rng.standard_normal((16, 3)).astype(np.float32)
        ang = rng.uniform(-3, 3, 16).astype(np.float32)
        v = rng.standard_normal((16, 3)).astype(np.float32)
        q = zm.quat_from_axis_angle(jnp.asarray(axis), jnp.asarray(ang))
        R = np.asarray(zm.quat_to_matrix(q))
        got = np.asarray(zm.quat_rotate(q, jnp.asarray(v)))
        ref = np.einsum("bij,bj->bi", R, v)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_transform(self, rng):
        T = zm.translation([1.0, 2.0, 3.0]).compose(zm.scaling(2.0))
        p = rng.standard_normal((8, 3)).astype(np.float32)
        got = np.asarray(T.apply(jnp.asarray(p)))
        np.testing.assert_allclose(got, 2.0 * p + np.array([1, 2, 3]),
                                   atol=1e-5)
        back = np.asarray(T.inverse().apply(jnp.asarray(got)))
        np.testing.assert_allclose(back, p, atol=1e-5)


class TestBits:
    def test_morton3d_order(self):
        # morton of (1,0,0) > (0,1,0) > (0,0,1)
        q = jnp.asarray([[0, 0, 1], [0, 1, 0], [1, 0, 0]], jnp.int32)
        m = np.asarray(zm.morton3d(q))
        assert m[0] < m[1] < m[2]

    def test_morton3d_roundtrip_vs_python(self, rng):
        pts = rng.integers(0, 1024, (100, 3)).astype(np.int32)

        def py_morton(p):
            out = 0
            for b in range(10):
                for d in range(3):
                    out |= ((p[d] >> b) & 1) << (3 * b + (2 - d))
            return out

        ref = np.array([py_morton(p) for p in pts], np.int32)
        got = np.asarray(zm.morton3d(jnp.asarray(pts)))
        np.testing.assert_array_equal(got, ref)

    def test_clz(self):
        x = jnp.asarray([0, 1, 2, 255, 1 << 30, -1], jnp.int32)
        got = np.asarray(zm.clz32(x))
        np.testing.assert_array_equal(got, [32, 31, 30, 24, 1, 0])

    def test_next_pow2(self):
        x = jnp.asarray([1, 2, 3, 5, 17, 1024, 1025], jnp.int32)
        got = np.asarray(zm.next_pow2(x))
        np.testing.assert_array_equal(got, [1, 2, 4, 8, 32, 1024, 2048])


class TestSpGEMM:
    def _dense(self, C):
        import numpy as np
        D = np.zeros((C.nrows, C.ncols), np.float32)
        cols = np.asarray(C.cols)
        vals = np.asarray(C.vals)
        rid = np.asarray(C.row_ids)
        for r, c, v in zip(rid, cols, vals):
            if r < C.nrows and c >= 0:
                D[r, c] += v
        return D

    def test_matches_dense_oracle(self, rng):
        from zpc_tpu.math.sparse import csr_from_coo, spgemm
        n = 24
        DA = (rng.random((n, n)) < 0.15) * rng.standard_normal((n, n))
        DB = (rng.random((n, n)) < 0.15) * rng.standard_normal((n, n))
        def to_csr(D, cap):
            r, c = np.nonzero(D)
            pad = cap - r.size
            rows = jnp.asarray(np.concatenate([r, np.zeros(pad, int)]),
                               jnp.int32)
            cols = jnp.asarray(np.concatenate([c, np.zeros(pad, int)]),
                               jnp.int32)
            vals = jnp.asarray(np.concatenate(
                [D[r, c], np.zeros(pad)]), jnp.float32)
            valid = jnp.arange(cap) < r.size
            return csr_from_coo(rows, cols, vals, n, n, valid=valid)
        A = to_csr(DA, 160)
        B = to_csr(DB, 160)
        C, ovf = spgemm(A, B, max_row_nnz_b=16)
        assert not bool(ovf)
        np.testing.assert_allclose(self._dense(C),
                                   (DA @ DB).astype(np.float32),
                                   atol=1e-5)

    def test_overflow_flagged_on_truncation(self, rng):
        from zpc_tpu.math.sparse import csr_from_coo, spgemm
        n = 8
        # B row 0 has 6 nonzeros; bound of 4 must flag
        DB = np.zeros((n, n)); DB[0, :6] = 1.0
        DA = np.zeros((n, n)); DA[2, 0] = 3.0
        def to_csr(D, cap=32):
            r, c = np.nonzero(D)
            pad = cap - r.size
            rows = jnp.asarray(np.concatenate([r, np.zeros(pad, int)]),
                               jnp.int32)
            cols = jnp.asarray(np.concatenate([c, np.zeros(pad, int)]),
                               jnp.int32)
            vals = jnp.asarray(np.concatenate(
                [D[r, c], np.zeros(pad)]), jnp.float32)
            valid = jnp.arange(cap) < r.size
            return csr_from_coo(rows, cols, vals, n, n, valid=valid)
        _, ovf = spgemm(to_csr(DA), to_csr(DB), max_row_nnz_b=4)
        assert bool(ovf)
        _, ok = spgemm(to_csr(DA), to_csr(DB), max_row_nnz_b=6)
        assert not bool(ok)
