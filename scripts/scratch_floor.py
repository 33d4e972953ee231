"""Scratch: which f32 source dominates the compensated-mode residual?

Runs the 8x1x1 / 2-part problem 20k steps and compares f32-compensated
variants against the f64 trajectory, selectively promoting one piece at a
time to f64 (CPU only; diagnostic, not shipped)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.parallel import (
    ShardedProblem, build_partition_maps, partition_elements,
)
from savtpu.solvers import setup_problem
from savtpu.ops.material import linear_ramp

STEPS = 20_000
NX = 8


def build(dtype):
    cfg = Config()
    cfg.beam_cells = (NX, 1, 1)
    cfg.beam_extent = (float(NX), 1.0, 1.0)
    prob = setup_problem(cfg, dtype=dtype)
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 2, "rcb")
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(prob.mesh.tetra, epart,
                                prob.mesh.num_points, dn_nodes)
    sp = ShardedProblem.build(prob, maps, fint_mode="dense", dtype=dtype)
    return prob, sp


def run_variant(sp64, sp32, mode):
    """Hand-rolled compensated scan with selectable f64 promotions."""
    dt = sp32.dt
    beta = 0.5 * sp32.alpha * dt
    c1 = jnp.float32((1 - beta) / (1 + beta))
    c2 = jnp.float32(dt * dt / (1 + beta))
    K32, K64 = sp32.denseK, sp64.denseK
    lM32, lM64 = sp32.lM, sp64.lM
    Fp32, Fp64 = sp32.F_pre, sp64.F_pre
    bc = sp32.bc_mask
    sld, sgi, smask = sp32.sld, sp32.sgi, sp32.smask
    SD = sp32.SD

    def exchange(F):
        def scatter(F, sld, sgi, smask):
            return jnp.zeros((SD,), F.dtype).at[sgi].add(F[sld] * smask)
        contrib = jax.vmap(scatter)(F, sld, sgi, smask)
        tot = contrib.sum(axis=0)
        return jax.vmap(lambda F, s, g: F.at[s].set(tot[g]))(F, sld, sgi)

    def fint(d):
        if mode == "matvec64":
            F = jax.vmap(jnp.dot)(K64, d.astype(jnp.float64))
            return exchange(F).astype(jnp.float32)
        from savtpu.ops.precision import HIGHEST
        F = jax.vmap(lambda K, x: jnp.dot(K, x, precision=HIGHEST))(K32, d)
        if mode == "meansub":
            # subtract per-part per-component mean before the product
            mask = sp32.dof_mask
            dm = d * mask
            n = mask.reshape(sp32.n_parts, -1, 1)[:, :-1].reshape(
                sp32.n_parts, -1, 3).sum(axis=1)
            comp = dm[:, :-1].reshape(sp32.n_parts, -1, 3)
            mean = comp.sum(axis=1) / jnp.maximum(n, 1)
            tbar = jnp.concatenate([
                jnp.tile(mean, (1, comp.shape[1])),
                jnp.zeros((sp32.n_parts, 1), jnp.float32)], axis=1) * mask
            F = jax.vmap(lambda K, x: jnp.dot(K, x, precision=HIGHEST))(
                K32, d - tbar)
        return exchange(F)

    def step(carry, _):
        hi, lo, v, i = carry
        tn = jnp.float32(0.0) + jnp.float32(dt) * i
        if mode == "fext64":
            Fe = (Fp64 * linear_ramp(tn.astype(jnp.float64))).astype(
                jnp.float32)
        else:
            Fe = Fp32 * linear_ramp(tn)
        F = fint(hi)
        if mode == "delta64":
            beta64 = 0.5 * sp64.alpha * sp64.dt
            delta = ((
                (1 - beta64) / (1 + beta64) * v.astype(jnp.float64)
                + sp64.dt ** 2 / (1 + beta64)
                * ((Fe.astype(jnp.float64) - F.astype(jnp.float64)) / lM64)
            ) * bc.astype(jnp.float64)).astype(jnp.float32)
        else:
            delta = (c1 * v + c2 * ((Fe - F) / lM32)) * bc
        s = hi + delta
        z = s - hi
        e = (hi - (s - z)) + (delta - z)
        lo = lo + e
        hi2 = s + lo
        lo2 = lo - (hi2 - s)
        return (hi2, lo2, delta, i + 1), None

    return step


def main():
    prob64, sp64 = build(jnp.float64)
    prob32, sp32 = build(jnp.float32)

    # f64 truth
    from savtpu.parallel.sharded import ShardedSolver
    sol64 = ShardedSolver(sp64)
    d064, dn64 = sp64.localize(prob64.d0), sp64.localize(prob64.dn)
    _, carry64 = sol64.run(d064, dn64, 0.0, STEPS, sync=True, record="none")
    ref = np.asarray(carry64[0])

    d032, dn32 = sp32.localize(prob32.d0), sp32.localize(prob32.dn)
    for mode in ["base", "matvec64", "fext64", "delta64", "meansub"]:
        step = run_variant(sp64, sp32, mode)
        carry0 = (d032, jnp.zeros_like(d032), d032 - dn32,
                  jnp.zeros((), jnp.float32))
        carry, _ = jax.lax.scan(jax.jit(step), carry0, None, length=STEPS)
        d = np.asarray(carry[0], np.float64) + np.asarray(carry[1], np.float64)
        err = np.linalg.norm(d - ref) / np.linalg.norm(ref)
        print(f"{mode:10s} relL2 vs f64 = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
