"""Chunked setup-time element pass (solvers/problem.py ELEMENT_CHUNK).

The one-shot vmapped element kernel materializes (E, 12, 12) tensors plus
fused intermediates; past ~1M elements that exceeds a 16 GB chip's HBM
(measured 18.75 GB at 512x20x20 = 1.23M tets), so setup_problem chunks
the pass and accumulates the assembled vectors. The chunked path must be
numerically identical to the one-shot path.
"""

import numpy as np
import jax.numpy as jnp

from savtpu.config import Config
import savtpu.solvers.problem as pm
from savtpu.solvers import setup_problem


def _cfg():
    cfg = Config()
    cfg.beam_cells = (12, 2, 2)
    cfg.beam_extent = (6.0, 1.0, 1.0)
    return cfg


def test_chunked_element_pass_matches_oneshot(monkeypatch):
    a = setup_problem(_cfg(), dtype=jnp.float64)
    monkeypatch.setattr(pm, "ELEMENT_CHUNK", 40)  # 288 tets -> 8 chunks
    b = setup_problem(_cfg(), dtype=jnp.float64)
    for name in ("Ke", "lumped_M", "F_pre", "dn"):
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        scale = max(float(np.max(np.abs(x))), 1.0)
        assert float(np.max(np.abs(x - y))) <= 1e-12 * scale, name


def test_chunked_unramped_ghost_step(monkeypatch):
    """The unramped branch keeps the chunked Me for the ghost-step solve."""
    cfg = _cfg()
    cfg.material.ramped = False
    a = setup_problem(cfg, dtype=jnp.float64)
    monkeypatch.setattr(pm, "ELEMENT_CHUNK", 40)
    cfg2 = _cfg()
    cfg2.material.ramped = False
    b = setup_problem(cfg2, dtype=jnp.float64)
    assert float(np.max(np.abs(np.asarray(a.dn) - np.asarray(b.dn)))) <= 1e-12
