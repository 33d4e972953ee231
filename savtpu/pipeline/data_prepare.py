"""Stage 1: distributed explicit solve producing training data.

TPU-native equivalent of Data_prepare.py — mesh, partition, label CSVs,
steady solve + VTK, and the full exchanged-mode explicit run saved as
per-rank HDF5 displacement histories.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from ..config import Config
from ..io.artifacts import save_displacement
from ..mesh import write_vtk
from ..solvers.steady import steady_displacement
from .common import StageContext, build_context, rank_trajectory, save_partition_labels


def run(cfg: Config, ctx: StageContext | None = None, verbose: bool = True,
        resume: bool = True):
    if cfg.solver.deg == 2:
        # steady-only P2 path driven straight from config (the reference's
        # 'p=2 only works for steady case', Data_prepare.py:42): solve and
        # write the steady VTK, no dynamic stage.
        from ..io.artifacts import ArtifactStore
        from ..solvers import setup_problem

        prob = setup_problem(cfg)
        store = ArtifactStore(
            cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag()
        )
        d_steady = np.asarray(steady_displacement(prob))
        write_vtk(
            store.steady_vtk(),
            prob.mesh,
            point_data={
                "displacement-x": d_steady[0::3],
                "displacement-y": d_steady[1::3],
                "displacement-z": d_steady[2::3],
            },
        )
        if verbose:
            print(
                f"[data_prepare] deg=2 steady-only solve "
                f"({prob.ndof} DOFs) -> {store.steady_vtk()}"
            )
        return prob

    if ctx is None:
        ctx = build_context(cfg)
    prob, sp, solver, store = ctx.prob, ctx.sp, ctx.solver, ctx.store

    save_partition_labels(ctx)

    # steady solve + VTK (Data_prepare.py:158-168); the element force Fe is
    # the unramped steady load (F_pre was assembled from it).
    d_steady = np.asarray(steady_displacement(prob))
    write_vtk(
        store.steady_vtk(),
        prob.mesh,
        point_data={
            "displacement-x": d_steady[0::3],
            "displacement-y": d_steady[1::3],
            "displacement-z": d_steady[2::3],
        },
    )

    num_steps = cfg.solver.num_steps
    save_every = cfg.solver.save_every
    if verbose:
        print(f"[data_prepare] dt={prob.dt:.16e}, {num_steps} steps, "
              f"{sp.n_parts} parts, fint={sp.fint_mode}")

    d0 = sp.localize(prob.d0)
    dn = sp.localize(prob.dn)
    ctx.join_warm()  # don't let a stalled first D2H fetch skew the timing
    t_start = time.perf_counter()
    if num_steps % save_every:
        raise ValueError(
            f"num_steps ({num_steps}) must be divisible by save_every "
            f"({save_every})"
        )
    # in-scan save_every stride + chunked host offload: device memory for
    # the history stays O(P * chunk * DL) however long the run is.
    # record="traj": stage 1 never consumes the shared trace (stage 2
    # re-derives it from the stored displacement), so don't transfer it.
    ckpt_every = cfg.solver.ckpt_every
    if ckpt_every:
        from ..utils.checkpoint import run_streamed_ckpt

        (traj, _), carry = run_streamed_ckpt(
            solver, d0, dn, 0.0, num_steps, sync=True, record="traj",
            save_every=save_every, ckpt_dir=store.ckpt_dir("stage1"),
            ckpt_every=ckpt_every, resume=resume, verbose=verbose,
        )
    else:
        (traj, _), carry = solver.run_streamed(
            d0, dn, 0.0, num_steps, sync=True, record="traj",
            save_every=save_every,
        )
    elapsed = time.perf_counter() - t_start
    if verbose:
        print(f"[data_prepare] {num_steps} steps in {elapsed:.2f}s "
              f"({num_steps/elapsed:.0f} steps/s)")
    from ..utils import stage_log

    stage_log(cfg).log(
        "stage1_solve",
        steps=num_steps,
        seconds=round(elapsed, 3),
        steps_per_sec=round(num_steps / elapsed, 1),
        elem_updates_per_sec=round(
            num_steps / elapsed * len(prob.mesh.tetra), 1
        ),
        n_parts=sp.n_parts,
        fint_mode=sp.fint_mode,
        exchange_mode=sp.exchange_mode,
        save_every=save_every,
        dt=prob.dt,
    )
    for r in range(sp.n_parts):
        save_displacement(store.dynamics_h5(r), rank_trajectory(ctx, traj, r))
    if ckpt_every:
        import shutil

        # artifacts complete — drop the mid-run checkpoint
        del traj
        shutil.rmtree(store.ckpt_dir("stage1"), ignore_errors=True)
    return ctx


def main(argv=None):
    ap = argparse.ArgumentParser(description="savtpu stage 1: data prepare")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--parts", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=None,
                    help="checkpoint the carry + trajectory every N steps")
    ap.add_argument("--resume", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="resume from an existing stage-1 checkpoint "
                         "(--no-resume starts fresh)")
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config) if args.config else Config()
    if args.steps:
        cfg.solver.num_steps = args.steps
    if args.parts:
        cfg.partition.n_parts = args.parts
    if args.ckpt_every is not None:
        cfg.solver.ckpt_every = args.ckpt_every
    run(cfg, resume=args.resume)


if __name__ == "__main__":
    main()
