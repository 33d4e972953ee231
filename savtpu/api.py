"""High-level facade: the whole pipeline behind one object.

The reference exposes its workflow as four scripts run in order under
mpirun (README.md:31-38). ``Simulation`` wraps the same stages behind a
single object for programmatic use:

    from savtpu import api
    sim = api.Simulation(cfg)
    sim.generate_data()      # stage 1 (+ steady solve artifact)
    sim.extract_shared()     # stage 2
    sim.train()              # stage 3
    sim.run_online()         # stage 4 (sync-avoiding hybrid)
    metrics = sim.compare()  # stage 5 (plot + rel-L2 metrics)
    # or: metrics = sim.run_all()

Stages are restartable from artifacts exactly like the scripts.
"""

from __future__ import annotations

from typing import Dict, Optional

from .config import Config
from .pipeline import (
    data_prepare,
    model_training,
    online_predictor,
    plotter,
    shared_extraction,
)
from .pipeline.common import StageContext, build_context


class Simulation:
    def __init__(
        self,
        cfg: Optional[Config] = None,
        device_mesh=None,
        dtype=None,
        verbose: bool = True,
    ):
        self.cfg = cfg or Config()
        self.verbose = verbose
        self._device_mesh = device_mesh
        self._dtype = dtype
        self._ctx: Optional[StageContext] = None

    @property
    def ctx(self) -> StageContext:
        if self._ctx is None:
            import jax.numpy as jnp

            self._ctx = build_context(
                self.cfg,
                device_mesh=self._device_mesh,
                dtype=self._dtype or jnp.float64,
            )
        return self._ctx

    # ---- stages ----
    def generate_data(self):
        data_prepare.run(self.cfg, ctx=self.ctx, verbose=self.verbose)
        return self

    def extract_shared(self):
        shared_extraction.run(self.cfg)
        return self

    def train(self):
        model_training.run(self.cfg, verbose=self.verbose)
        return self

    def run_online(self):
        online_predictor.run(self.cfg, ctx=self.ctx, verbose=self.verbose)
        return self

    def compare(self) -> Dict:
        return plotter.run(self.cfg, verbose=self.verbose)

    def run_all(self) -> Dict:
        return (
            self.generate_data()
            .extract_shared()
            .train()
            .run_online()
            .compare()
        )

    # ---- direct solver access ----
    def solver(self):
        """The underlying ShardedSolver (exchanged / sync-avoiding runs)."""
        return self.ctx.solver

    def steady(self):
        """Steady displacement vector (K d = F with the clamped face).
        Supports deg=1 and the steady-only deg=2 path (which has no
        sharded context)."""
        import numpy as np

        from .solvers import setup_problem, steady_displacement

        if self.cfg.solver.deg == 2:
            prob = setup_problem(self.cfg)
        else:
            prob = self.ctx.prob
        return np.asarray(steady_displacement(prob))
