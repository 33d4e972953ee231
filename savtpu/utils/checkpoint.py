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


class TrajStore:
    """Disk-backed (memmap) recorded-output buffers for a checkpointed
    run: the carry state plus every recorded row written so far live in
    ``ckpt_dir``, so a killed process resumes with its outputs intact."""

    def __init__(self, ckpt_dir, P, DL, S3, n_rec, n_shared, dtype,
                 want_traj, want_shared):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.state_f = self.dir / "state.npz"
        self.dtype = np.dtype(dtype)
        self.shapes = {
            "traj": (P, n_rec, DL) if want_traj else None,
            "shared": (P, n_shared, S3) if want_shared else None,
        }
        self.mm = {}

    def resume_step(self, expect: dict, resume: bool) -> tuple:
        """(start_step, extras dict) — 0/{} unless a matching state file
        exists. ``expect`` keys must match the stored values exactly (a
        changed config invalidates the checkpoint)."""
        if resume and self.state_f.exists():
            try:
                with np.load(self.state_f) as z:
                    if all(
                        k in z and np.array_equal(z[k], v)
                        for k, v in expect.items()
                    ):
                        return int(z["step"]), {
                            k: np.array(z[k]) for k in z.files
                        }
            except Exception:
                pass
        return 0, {}

    def _map(self, name, fresh):
        shape = self.shapes[name]
        if shape is None:
            return None
        mm = self.mm.get(name)
        if mm is None:
            f = self.dir / f"{name}.dat"
            mode = "w+" if (fresh or not f.exists()) else "r+"
            mm = np.memmap(f, dtype=self.dtype, mode=mode, shape=shape)
            self.mm[name] = mm
        return mm

    def open(self, fresh: bool):
        for name in ("traj", "shared"):
            self._map(name, fresh)
        return self

    def write(self, name, lo, arr):
        mm = self.mm.get(name)
        if mm is not None:
            n = arr.shape[1]
            mm[:, lo : lo + n] = np.asarray(arr)

    def save_state(self, carry, step: int, expect: dict,
                   extras: Optional[dict] = None) -> None:
        for mm in self.mm.values():
            if mm is not None:
                mm.flush()
        d0, dn, tn = carry[0], carry[1], carry[2]
        save_solver_state(
            self.state_f, d0, dn, float(tn), step,
            extra={**expect, **(extras or {})},
        )

    def result(self, name):
        mm = self.mm.get(name)
        return None if mm is None else np.asarray(mm)

    def cleanup(self):
        import shutil

        shutil.rmtree(self.dir, ignore_errors=True)


def run_streamed_ckpt(
    solver,
    d0,
    dn,
    t0: float,
    num_steps: int,
    *,
    sync: bool = True,
    record: str = "traj",
    save_every: int = 1,
    ckpt_dir,
    ckpt_every: int,
    resume: bool = True,
    preds=None,
    verbose: bool = False,
):
    """``ShardedSolver.run_streamed`` with carry + recorded-trajectory
    persistence at every ``ckpt_every``-step chunk boundary. A killed run
    re-invoked with ``resume=True`` continues from the last completed
    chunk and produces bit-identical outputs (the chunk boundaries are
    fixed by ``ckpt_every``, so the re-entry points — the only place the
    compensated integrator's lo word is folded — are identical between an
    interrupted and a straight-through run)."""
    import jax.numpy as jnp

    sp = solver.sp
    if ckpt_every % save_every:
        raise ValueError("ckpt_every must be a multiple of save_every")
    P, DL, S3 = sp.n_parts, sp.DL, sp.sld.shape[1]
    want_traj = record in ("all", "traj")
    want_shared = record in ("all", "shared")
    store = TrajStore(
        ckpt_dir, P, DL, S3, num_steps // save_every, num_steps,
        sp.lM.dtype, want_traj, want_shared,
    )
    expect = {
        "num_steps": num_steps, "save_every": save_every,
        "ckpt_every": ckpt_every, "P": P, "DL": DL, "sync": sync,
    }
    start, extras = store.resume_step(expect, resume)
    store.open(fresh=start == 0)
    carry = (d0, dn, jnp.asarray(t0))
    if start:
        dtype = sp.lM.dtype
        carry = (
            jnp.asarray(extras["d0"], dtype),
            jnp.asarray(extras["dn"], dtype),
            jnp.asarray(float(extras["tn"])),
        )
        if verbose:
            print(f"[checkpoint] resuming at step {start}/{num_steps}")

    i = start
    while i < num_steps:
        n = min(ckpt_every, num_steps - i)
        pc = None if preds is None else preds[:, i : i + n]
        d0c, dnc, tc = carry
        (traj_c, shared_c), carry = solver.run(
            d0c, dnc, tc, n,
            sync=sync, preds=pc, record=record, save_every=save_every,
        )
        if want_traj:
            store.write("traj", i // save_every, np.asarray(traj_c))
        if want_shared:
            store.write("shared", i, np.asarray(shared_c))
        i += n
        store.save_state(carry, i, expect)
    return (store.result("traj"), store.result("shared")), carry


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
