"""arch="hybrid": expfit base + residual LSTM (savtpu extension).

The drift-breaking surrogate for nonlinear plants: the matrix-pencil LTI
fit carries the bulk of the interface motion open-loop in time, the
stacked LSTM trains on (and feeds back) only the residual mode
coefficients. Pins the 5-stage pipeline on both materials plus the
expfit-degeneracy property (zero residual model => hybrid == expfit).
"""

import numpy as np
import pytest

from savtpu.io.artifacts import ArtifactStore, load_displacement
from savtpu.pipeline import run_all
from test_pipeline import _smoke_cfg


def _hybrid_cfg(tmp_path, material="linear"):
    cfg = _smoke_cfg(tmp_path, num_steps=200)
    cfg.material.model = material
    s = cfg.surrogate
    s.arch = "hybrid"
    s.modal_dim = 2
    s.expfit_order = 6
    s.num_epochs = 30
    return cfg


@pytest.mark.parametrize("material", ["linear", "neo_hookean"])
def test_hybrid_pipeline_end_to_end(tmp_path, material):
    cfg = _hybrid_cfg(tmp_path, material)
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = min(cfg.surrogate.i_cri + 1, cfg.solver.num_steps)
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        # warm-up is exchanged — bit-level equality with the exact run
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        assert np.abs(pred).max() < 10 * max(np.abs(data).max(), 1e-12)
        # sidecar carries both segments
        import json

        meta = json.loads(
            store.model_file(r).with_suffix(".json").read_text()
        )
        assert meta["arch"] == "hybrid"
        assert meta["expfit_modes"] >= 1
        assert meta["modal_dim"] >= 1


def test_hybrid_zero_residual_degenerates_to_expfit(tmp_path, monkeypatch):
    """With the residual prediction forced to zero, the hybrid online
    run must reproduce the pure-expfit online run step for step — the
    base path, history plumbing and consensus are then identical."""
    from savtpu.pipeline import (
        data_prepare,
        model_training,
        online_predictor,
        shared_extraction,
    )
    from savtpu.pipeline.common import build_context

    outs = {}
    for arch in ("expfit", "hybrid"):
        cfg = _smoke_cfg(tmp_path / arch, num_steps=200)
        cfg.surrogate.arch = arch
        cfg.surrogate.modal_dim = 2
        cfg.surrogate.expfit_order = 6
        cfg.surrogate.num_epochs = 5
        ctx = build_context(cfg)
        data_prepare.run(cfg, ctx=ctx)
        shared_extraction.run(cfg)
        model_training.run(cfg, verbose=False)
        if arch == "hybrid":
            real = online_predictor.modal_predict_stacked
            monkeypatch.setattr(
                online_predictor, "modal_predict_stacked",
                lambda *a, **k: real(*a, **k) * 0.0,
            )
        online_predictor.run(cfg, ctx=ctx, verbose=False)
        monkeypatch.undo()
        store = ArtifactStore(
            cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag()
        )
        outs[arch] = np.stack(
            [load_displacement(store.modeled_h5(r)) for r in range(2)]
        )
    scale = max(np.abs(outs["expfit"]).max(), 1e-30)
    err = np.abs(outs["expfit"] - outs["hybrid"]).max() / scale
    assert err < 1e-6, err
