"""arch="expfit" — matrix-pencil system identification of the interface
motion (models/expfit.py). Unit tests on synthetic exponential-sum
signals, the end-to-end pipeline smoke, and fused-path agreement under a
real device mesh (the expfit coefficient feed adds a scan-input argument
to the shard_map body)."""

import numpy as np
import pytest

from savtpu.config import Config
from savtpu.io.artifacts import ArtifactStore, load_displacement
from savtpu.models.expfit import (
    eval_expfit,
    fit_expfit,
    init_expfit,
    matrix_pencil,
)
from savtpu.pipeline import run_all

from test_pipeline import _smoke_cfg


def _two_segment_signal(T, ramp_end, rng):
    """Synthetic signal obeying the exact expfit model: in-ramp
    a + b*t/ramp + modes, post-ramp c + SAME-pole modes."""
    t = np.arange(T, dtype=np.float64)
    z = np.array(
        [0.9995 * np.exp(1j * 0.21), 0.9999 * np.exp(1j * 0.043)]
    )
    y = np.empty(T)
    inA = t < ramp_end
    tA = t[inA]
    y[inA] = (
        0.3 + 1.7 * tA / ramp_end
        + (np.real(0.5 * z[0] ** tA) + np.real(0.2j * z[1] ** tA))
    )
    tB = t[~inA] - ramp_end
    y[~inA] = (
        2.0
        + np.real((0.4 - 0.1j) * z[0] ** tB)
        + np.real(0.25 * z[1] ** tB)
    )
    return y


def test_matrix_pencil_recovers_poles():
    t = np.arange(600, dtype=np.float64)
    z_true = np.array([0.999 * np.exp(1j * 0.3), 0.995 * np.exp(1j * 0.07)])
    y = np.real(1.3 * z_true[0] ** t) + np.real((0.2 + 0.5j) * z_true[1] ** t)
    z = matrix_pencil(y, 8)
    # each true pole (and conjugate) appears within 1e-6
    for zt in list(z_true) + list(z_true.conj()):
        assert np.min(np.abs(z - zt)) < 1e-6


def test_expfit_two_segment_extrapolation():
    """Fit on the first 60% (covering the ramp boundary), extrapolate the
    rest to near machine precision — the zero-drift property the arch is
    built on."""
    rng = np.random.default_rng(0)
    T, ramp = 2000, 700.0
    y = np.stack(
        [_two_segment_signal(T, ramp, rng),
         0.5 * _two_segment_signal(T, ramp, rng) - 1.0],
        axis=1,
    )
    cut = int(0.6 * T)
    params, info = fit_expfit(y[:cut], ramp, order=8)
    assert info["has_post_segment"]
    pred = eval_expfit(params, np.arange(T, dtype=float), ramp)
    rel = np.linalg.norm(pred[cut:] - y[cut:]) / np.linalg.norm(y[cut:])
    assert rel < 1e-6


def test_expfit_in_ramp_only_fallback():
    """Training rows that end before the ramp does: single-segment fit,
    finite continuation beyond (has_post_segment False)."""
    rng = np.random.default_rng(1)
    y = _two_segment_signal(1000, 700.0, rng)[:400, None]
    params, info = fit_expfit(y, 700.0, order=6)
    assert not info["has_post_segment"]
    pred = eval_expfit(params, np.arange(900, dtype=float), 700.0)
    assert np.isfinite(pred).all()
    # in-sample reconstruction is tight even without the post segment
    rel = np.linalg.norm(pred[:400, 0] - y[:400, 0]) / np.linalg.norm(y)
    assert rel < 1e-6


def test_advance_and_device_eval_match_host():
    """The on-device closed-form feed (advance_expfit +
    eval_expfit_device, the stage-4 pack path) must reproduce the host
    f64 eval_expfit to f32 accuracy on every segment topology: fully
    in-ramp, straddling the ramp end, and deep post-ramp
    extrapolation."""
    import jax.numpy as jnp

    from savtpu.models.expfit import advance_expfit, eval_expfit_device

    rng = np.random.default_rng(3)
    T, ramp = 1200, 400.0
    ys = np.stack(
        [_two_segment_signal(T, ramp, rng) * s for s in (1.0, -0.3, 2.5)],
        axis=1,
    )
    params, _ = fit_expfit(ys[:900], ramp, order=6)
    se = 50.0
    block = 3000
    for step0 in (0, int(380 * se), 45000, 52500):
        rows = (step0 + np.arange(block)) / se
        ref = eval_expfit(params, rows, ramp)
        adv = advance_expfit(params, step0 / se, ramp)
        pack = {
            k: jnp.asarray(np.asarray(v)[None], jnp.float32)
            for k, v in adv.items()
        }
        dev = np.asarray(eval_expfit_device(
            pack,
            jnp.asarray(params["z_re"][None], jnp.float32),
            jnp.asarray(params["z_im"][None], jnp.float32),
            jnp.asarray([se], jnp.float32),
            block,
        ))[0]
        err = np.abs(dev - ref).max() / np.abs(ref).max()
        assert err < 1e-4, (step0, err)


def test_expfit_params_roundtrip(tmp_path):
    from savtpu.io.artifacts import load_params, save_params

    rng = np.random.default_rng(2)
    y = _two_segment_signal(1200, 500.0, rng)[:, None]
    params, info = fit_expfit(y[:800], 500.0, order=6)
    f = tmp_path / "m.msgpack"
    save_params(f, params, meta={"arch": "expfit"})
    loaded = load_params(f, init_expfit(info["n_modes"], 1))
    a = eval_expfit(params, np.arange(1200, dtype=float), 500.0)
    b = eval_expfit(
        {k: np.asarray(v) for k, v in loaded.items()},
        np.arange(1200, dtype=float), 500.0,
    )
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


@pytest.mark.parametrize("modal", [3, 0])
def test_pipeline_expfit(tmp_path, modal):
    """End-to-end 5-stage pipeline with the expfit surrogate (modal and
    raw-channel feeds)."""
    import json

    cfg = _smoke_cfg(tmp_path)
    cfg.surrogate.arch = "expfit"
    cfg.surrogate.modal_dim = modal
    cfg.surrogate.expfit_order = 8
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        meta = json.loads(store.model_file(r).with_suffix(".json").read_text())
        assert meta["arch"] == "expfit"
        assert (meta.get("modal_dim") or 0) == modal


def test_stage4_expfit_under_device_mesh(tmp_path):
    """The expfit coefficient feed rides into the fused shard_map body as
    a scan input ((nb, P, block, K), parts sharded): mesh run must match
    the single-device emulation bit-for-bit."""
    import jax

    from savtpu.parallel import make_device_mesh
    from savtpu.pipeline import online_predictor
    from savtpu.pipeline.common import build_context

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    cfg = _smoke_cfg(tmp_path)
    cfg.partition.n_parts = 4
    cfg.beam_cells = (8, 1, 1)
    cfg.beam_extent = (8.0, 1.0, 1.0)
    cfg.surrogate.arch = "expfit"
    cfg.surrogate.modal_dim = 3
    cfg.surrogate.expfit_order = 8
    cfg.surrogate.pred_consensus = True
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    emu = [np.array(load_displacement(store.modeled_h5(r)))
           for r in range(4)]

    ctx2 = build_context(cfg, device_mesh=make_device_mesh(4))
    assert ctx2.solver.mesh is not None
    online_predictor.run(cfg, ctx=ctx2, verbose=False)
    for r in range(4):
        mesh_out = load_displacement(store.modeled_h5(r))
        assert np.allclose(mesh_out, emu[r], atol=1e-12), r
