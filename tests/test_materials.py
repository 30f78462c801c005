"""Material-family smoke: every constitutive/plasticity pairing runs stably
through the MPM pipeline (small short rollouts on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from examples.materials import build
from zpc_tpu.sim.mpm import explicit_step


@pytest.mark.parametrize("material", ["jello", "snow", "sand", "fluid"])
def test_material_rollout(material):
    sim, st, dt = build(material, n=512, dx=1.0 / 32)
    step = jax.jit(lambda s: explicit_step(sim, s, jnp.float32(dt)))
    for _ in range(10):
        st = step(st)
    x = np.asarray(st.particles["x"])
    v = np.asarray(st.particles["v"])
    assert np.isfinite(x).all() and np.isfinite(v).all()
    assert np.abs(v).max() < 50.0
    # nothing fell through the ground by more than a couple cells
    assert x[:, 1].min() > 0.1 - 3.0 / 32


def test_snow_hardens_Jp():
    sim, st, dt = build("snow", n=512, dx=1.0 / 32)
    # pre-compressed state beyond the critical compression threshold
    F0 = jnp.broadcast_to(jnp.diag(jnp.asarray([0.9, 0.9, 0.9])),
                          (512, 3, 3))
    st = type(st)(st.particles.update(F=F0), st.grid, st.max_vel)
    step = jax.jit(lambda s: explicit_step(sim, s, jnp.float32(dt)))
    st = step(st)
    Jp = np.asarray(st.particles["Jp"])
    F = np.asarray(st.particles["F"])
    assert np.isfinite(Jp).all()
    assert (np.abs(Jp - 1.0) > 1e-3).all()    # volume moved to plastic part
    s_min = np.linalg.svd(F, compute_uv=False).min()
    assert s_min > 0.97                       # elastic part clamped


def test_anisotropic_arap_piola_matches_fd(rng):
    from zpc_tpu.models.constitutive import AnisotropicArap
    m = AnisotropicArap(jnp.float32(1e3), jnp.float32(1e3),
                        mu_fiber=jnp.float32(5e2))
    F = np.eye(3) + 0.1 * rng.standard_normal((3, 3)).astype(np.float32)
    P = np.asarray(m.first_piola(jnp.asarray(F[None], jnp.float32)))[0]
    eps = 1e-3
    for i in range(3):
        for j in range(3):
            Fp = F.copy(); Fp[i, j] += eps
            Fm = F.copy(); Fm[i, j] -= eps
            fd = (float(m.psi(jnp.asarray(Fp[None], jnp.float32))[0]) -
                  float(m.psi(jnp.asarray(Fm[None], jnp.float32))[0])) / \
                (2 * eps)
            assert abs(P[i, j] - fd) < 0.15, (i, j, P[i, j], fd)


def test_fixed_corotated_kirchhoff_newton_matches_svd(rng):
    """FixedCorotated.kirchhoff (Newton polar fast path) agrees with the
    SVD-based P F^T to fp32 tolerance in the det>0 regime, including
    per-particle (hardened) Lame parameters."""
    from zpc_tpu.math.vecmat import mm
    from zpc_tpu.models.constitutive import FixedCorotated

    F = (np.eye(3) + 0.2 * rng.standard_normal((256, 3, 3))
         ).astype(np.float32)
    F = F[np.linalg.det(F) > 0.05]
    n = F.shape[0]
    mu = jnp.asarray(1e3 * (1.0 + rng.random(n)), jnp.float32)
    lam = jnp.asarray(5e3 * (1.0 + rng.random(n)), jnp.float32)
    model = FixedCorotated(mu, lam)
    Fj = jnp.asarray(F)
    tau = np.asarray(model.kirchhoff(Fj))
    ref = np.asarray(mm(model.first_piola(Fj), jnp.swapaxes(Fj, -1, -2)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(tau, ref, atol=2e-5 * scale)


def _rng():
    return np.random.default_rng(7)


def test_nonassociative_von_mises_return_map():
    """Ziran-style return map (NonAssociativeVonMises.hpp:1-61): trial
    states inside the surface pass through; yielded states land ON the
    surface with tr(b_hat) preserved (the shift is deviatoric)."""
    from zpc_tpu.models.plasticity import NonAssociativeVonMises

    rng = _rng()
    amp = np.where(np.arange(128) % 2 == 0, 0.4, 0.003)
    F = (np.eye(3) + amp[:, None, None] *
         rng.standard_normal((128, 3, 3))).astype(np.float32)
    F = F[np.linalg.det(F) > 0.2]
    mu = 1e5
    pl = NonAssociativeVonMises(tau_y=jnp.float32(2e3),
                                mu=jnp.float32(mu))
    Fp, _ = jax.jit(pl.project)(jnp.asarray(F))
    s_t = np.linalg.svd(F, compute_uv=False)
    s_p = np.linalg.svd(np.asarray(Fp), compute_uv=False)

    def vm(s):
        b = s * s
        smu = mu * np.prod(s, -1) ** (-2.0 / 3.0)
        dev = b - b.mean(-1, keepdims=True)
        return np.linalg.norm(smu[..., None] * dev, axis=-1)

    scaled_tau = np.sqrt(2.0 / 3.0) * 2e3
    yielded = vm(s_t) - scaled_tau >= 1e-4
    assert yielded.any() and not yielded.all()
    # pass-through inside the surface
    np.testing.assert_allclose(np.asarray(Fp)[~yielded], F[~yielded],
                               atol=2e-5)
    # projected states sit on (or within round-off of) the surface
    assert (vm(s_p)[yielded] <= scaled_tau * 1.02 + 1.0).all()
    # deviatoric shift preserves tr(b_hat)
    np.testing.assert_allclose((s_p ** 2).sum(-1)[yielded],
                               (s_t ** 2).sum(-1)[yielded], rtol=3e-3)


def test_associative_von_mises_newton():
    """Associative return (AssociativeVonMises.hpp:1-129, debugged):
    yielded principal stresses converge onto the von Mises surface of
    the elastic model's principal Cauchy stress."""
    from zpc_tpu.models.constitutive import NeoHookean
    from zpc_tpu.models.plasticity import AssociativeVonMises

    rng = _rng()
    amp = np.where(np.arange(64) % 2 == 0, 0.25, 0.002)
    F = (np.eye(3) + amp[:, None, None] *
         rng.standard_normal((64, 3, 3))).astype(np.float32)
    F = F[np.linalg.det(F) > 0.3]
    model = NeoHookean.from_young_poisson(3e5, 0.3)
    ys = 4e3
    pl = AssociativeVonMises(initial_stress=jnp.float32(ys))
    Fp, _ = jax.jit(lambda f: pl.project(f, model))(jnp.asarray(F))
    assert np.isfinite(np.asarray(Fp)).all()

    P = 3.0 * np.eye(3) - np.ones((3, 3))

    def vm_of(Fm):
        def one(f):
            s = jnp.linalg.svd(f, compute_uv=False)
            c = jax.grad(lambda x: model.psi(jnp.diag(x)))(s) * s / \
                jnp.prod(s)
            return jnp.sqrt(0.5 * c @ (jnp.asarray(P, jnp.float32) @ c))
        return np.asarray(jax.vmap(one)(jnp.asarray(Fm)))

    vm_t = vm_of(F)
    vm_p = vm_of(np.asarray(Fp))
    yielded = vm_t > ys
    assert yielded.any() and not yielded.all()
    np.testing.assert_allclose(np.asarray(Fp)[~yielded], F[~yielded],
                               atol=2e-5)
    # Newton landed on the yield surface
    np.testing.assert_allclose(vm_p[yielded], ys, rtol=2e-2)
    # and never hardened outward
    assert (vm_p <= vm_t * 1.001 + 1.0).all()


def test_von_mises_capped_trace_caps_and_rate():
    """VonMisesCapped.hpp:47-51 volumetric caps: tr(eps) is projected
    back to +-k1/(d lam + 2 mu) by a uniform rescale; Cowper-Symonds
    rate scaling raises the deviatoric limit."""
    from zpc_tpu.models.plasticity import VonMisesCapped

    rng = _rng()
    # volumetric stretch/compression dominated trials
    grow = (np.eye(3)[None] * np.array([1.3, 0.7])[:, None, None]
            ).astype(np.float32)
    F = np.concatenate([grow,
                        (np.eye(3) + 0.001 * rng.standard_normal((4, 3, 3))
                         ).astype(np.float32)])
    mu, lam = 1e5, 2e5
    k1 = 1e4
    pl = VonMisesCapped(yield_stress=jnp.float32(1e9),  # no dev yield
                        mu=jnp.float32(mu), lam=jnp.float32(lam),
                        k1_compress=jnp.float32(k1),
                        k1_stretch=jnp.float32(k1))
    Fp, _ = jax.jit(pl.project)(jnp.asarray(F))
    s = np.linalg.svd(np.asarray(Fp), compute_uv=False)
    tr = np.log(s).sum(-1)
    cap = k1 / (3 * lam + 2 * mu)
    assert np.all(tr <= cap + 1e-5) and np.all(tr >= -cap - 1e-5)
    # the 1.3x uniform stretch hit the cap exactly; small trials didn't
    np.testing.assert_allclose(tr[0], cap, rtol=1e-4)
    np.testing.assert_allclose(tr[1], -cap, rtol=1e-4)
    tr_in = np.log(np.linalg.svd(F[2:], compute_uv=False)).sum(-1)
    np.testing.assert_allclose(tr[2:], tr_in, atol=1e-5)

    # rate hardening: higher strain rate -> less deviatoric projection
    shear = np.eye(3, dtype=np.float32)[None].repeat(1, 0)
    shear[0, 0, 1] = 0.8
    pl2 = VonMisesCapped(yield_stress=jnp.float32(2e3),
                         mu=jnp.float32(mu), rate_c=jnp.float32(10.0),
                         rate_p=jnp.float32(1.0))
    F_slow, _ = pl2.project(jnp.asarray(shear))
    F_fast, _ = pl2.project(jnp.asarray(shear),
                            strain_rate=jnp.float32(1e3))

    def devnorm(Fm):
        s = np.linalg.svd(np.asarray(Fm), compute_uv=False)
        e = np.log(s)
        return np.linalg.norm(e - e.mean(-1, keepdims=True), axis=-1)

    assert devnorm(F_fast)[0] > devnorm(F_slow)[0] * 5
