"""Pallas fused-step kernel vs the XLA reference formula (interpreter mode
on CPU; the compiled path is exercised by bench.py on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from savtpu.ops import pallas_step


def test_fused_dense_step_interpret_matches_formula(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(pallas_step.pl, "pallas_call", interp)

    DL = pallas_step.TILE * 2
    rng = np.random.default_rng(0)
    K = jnp.asarray(rng.normal(size=(DL, DL)).astype(np.float32))
    d0, dn, Fp, lM, bc = (
        jnp.asarray(rng.normal(size=(DL,)).astype(np.float32))
        for _ in range(5)
    )
    lM = jnp.abs(lM) + 1.0
    dt, alpha, ramp = 2.5e-4, 0.5, 0.7

    out = pallas_step.fused_dense_step(
        K, d0, dn, Fp, lM, bc, jnp.float32(ramp), dt, alpha
    )
    f_int = K @ d0
    ref = (
        dt * dt * (Fp * ramp - f_int)
        + 2 * lM * d0
        - lM * dn
        + 0.5 * dt * alpha * lM * dn
    ) / (lM + 0.5 * alpha * dt * lM) * bc
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
