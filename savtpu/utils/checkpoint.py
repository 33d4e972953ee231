"""Solver-state checkpoint / resume.

The reference never checkpoints mid-run — a crash loses the whole 1e5-step
solve and stages restart only from complete artifacts (SURVEY.md §5). Here
the explicit runner can persist its scan carry (d0, dn, tn, step index;
serial or stacked/sharded) every N steps and resume bit-exactly: the
update is a pure function of the carry, so restarting from a saved carry
reproduces the remaining trajectory exactly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def save_solver_state(
    path: str | Path, d0, dn, tn: float, step: int, extra: Optional[dict] = None
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(
        tmp,
        d0=np.asarray(d0),
        dn=np.asarray(dn),
        tn=np.asarray(tn),
        step=np.asarray(step),
        **(extra or {}),
    )
    tmp.replace(path)


def load_solver_state(path: str | Path) -> Tuple[np.ndarray, np.ndarray, float, int]:
    with np.load(Path(path)) as z:
        return z["d0"], z["dn"], float(z["tn"]), int(z["step"])


def run_with_checkpoints(
    solver,
    d0,
    dn,
    t0: float,
    num_steps: int,
    ckpt_path: str | Path,
    ckpt_every: int,
    resume: bool = True,
    **run_kwargs,
):
    """Drive ShardedSolver.run in ckpt_every-step chunks, persisting the
    carry after each chunk; resumes from an existing checkpoint file.
    Returns (list of per-chunk (traj, shared) outputs, final carry,
    start_step actually computed from)."""
    import jax.numpy as jnp

    ckpt_path = Path(ckpt_path)
    start = 0
    if resume and ckpt_path.exists():
        d0_np, dn_np, t0, start = load_solver_state(ckpt_path)
        d0 = jnp.asarray(d0_np, dtype=d0.dtype)
        dn = jnp.asarray(dn_np, dtype=dn.dtype)

    outputs = []
    carry = (d0, dn, t0)
    i = start
    while i < num_steps:
        n = min(ckpt_every, num_steps - i)
        d0c, dnc, tc = carry
        outs, carry = solver.run(d0c, dnc, tc, n, **run_kwargs)
        outputs.append(outs)
        i += n
        save_solver_state(
            ckpt_path, carry[0], carry[1], float(carry[2]), i
        )
    return outputs, carry, start
