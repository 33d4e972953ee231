"""Device-resident boundary-noise transfer study for large meshes.

scripts/noise_transfer.py generates noise on host and ships full
(P, T, S3) prediction arrays to the device per run — ~10 GB of H2D per
comm-free run at 96x8x8/16, hopeless over the remote TPU link. Here
everything stays on the device: the true shared trace is device-resident,
noise is generated with the TPU PRNG per time-chunk (keys folded on the
chunk index), the comm-free scans run chunk-by-chunk, and only scalar
error reductions come back to the host.

Spectra (see noise_transfer.py for definitions): white, lowpass(151)
(in-chunk cumsum moving average; chunk boundaries are 151/24000 edge
effects), interleave (per-slot constant through each 3000-step block).

Usage: python scripts/noise_transfer_device.py --mesh fine
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

CHUNK = 24_000          # multiple of the 3000-step interleave block
BLOCK = 3_000
LP_WIN = 151


@functools.partial(jax.jit, static_argnames=("shape", "spectrum", "n_s"))
def noise_chunk(key, shape, std, smask, spectrum: str, n_s: int):
    """(P, C, S3) noise chunk of the given spectrum, zero off-mask."""
    P, C, S3 = shape
    if spectrum == "white":
        z = jax.random.normal(key, shape, jnp.float32) * std
    elif spectrum == "low":
        z = jax.random.normal(key, shape, jnp.float32) * std
        pad = LP_WIN // 2
        w = 2 * pad + 1
        zp = jnp.concatenate(
            [z[:, 1 : pad + 1][:, ::-1], z, z[:, -pad - 1 : -1][:, ::-1]],
            axis=1,
        )
        cs = jnp.cumsum(zp, axis=1)
        cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
        z = (cs[:, w:] - cs[:, :-w]) / w
        # renormalize to the white-noise energy (moving average shrinks
        # the std by ~sqrt(w))
        z = z * (std / jnp.maximum(jnp.std(z), 1e-30))
    elif spectrum == "interleave":
        n_b = C // BLOCK
        reps = BLOCK // n_s
        c = jax.random.normal(key, (P, n_b, 1, n_s, S3), jnp.float32) * std
        z = jnp.broadcast_to(c, (P, n_b, reps, n_s, S3)).reshape(P, C, S3)
    else:
        raise ValueError(spectrum)
    return z * smask[:, None, :]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=96_000)  # CHUNK multiple
    ap.add_argument("--mesh", type=str, default="fine",
                    choices=["coarse", "fine"])
    ap.add_argument("--eps", type=float, nargs="*", default=[0.0025, 0.01])
    ap.add_argument("--out", type=str, default="runs/noise_transfer")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from scripts.noise_transfer import build_case, interior_mask

    cases = {
        "coarse": ((48, 4, 4), (12.0, 1.0, 1.0), 8),
        "fine": ((96, 8, 8), (12.0, 1.0, 1.0), 16),
    }
    cells, extent, parts = cases[args.mesh]
    name = f"{args.mesh}_dev"
    T = args.steps - args.steps % CHUNK
    n_s = 150
    se = 50

    prob, sp, solver = build_case(cells, extent, parts)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    S3 = sp.sld.shape[1]
    P = sp.n_parts

    interior = jnp.asarray(interior_mask(sp))
    smask = jnp.asarray(sp.smask, jnp.float32)

    # ---- exchanged reference, device-resident outputs per chunk --------
    # truth trajectory (strided) and the true shared rows stay on device.
    t0 = time.time()
    truth_chunks, shared_chunks = [], []
    carry = (d0, dnl, jnp.float32(0.0))
    for lo in range(0, T, CHUNK):
        c0, c1, tc = carry
        (tr, sh), carry = solver.run(
            c0, c1, tc, CHUNK, sync=True, record="all", save_every=se
        )
        truth_chunks.append(tr)
        shared_chunks.append(sh)
    jax.block_until_ready(carry)
    print(f"[{name}] exchanged ref: {time.time()-t0:.1f}s", flush=True)

    sq = jax.jit(lambda a, b: jnp.sum(
        jnp.where(interior[:, None, :], (a - b) ** 2, 0.0)
    ))
    tnorm2 = float(sum(sq(tr, jnp.zeros((), jnp.float32))
                       for tr in truth_chunks))

    # ||shared||^2 and size for the std that gives ||noise|| = eps*||shared||
    sh_norm2 = float(sum(jnp.sum(s.astype(jnp.float64) ** 2)
                         for s in shared_chunks))
    sh_size = float(sum(np.prod(s.shape) for s in shared_chunks))
    sh_rms = np.sqrt(sh_norm2 / sh_size)

    def commfree_err(spectrum, eps, seed):
        std = jnp.float32(eps * sh_rms) if spectrum else None
        carry = (d0, dnl, jnp.float32(0.0))
        err2 = 0.0
        key = jax.random.PRNGKey(seed)
        for ci, lo in enumerate(range(0, T, CHUNK)):
            preds = shared_chunks[ci]
            if spectrum:
                z = noise_chunk(
                    jax.random.fold_in(key, ci),
                    (P, CHUNK, S3), std, smask, spectrum, n_s,
                )
                preds = preds + z
            c0, c1, tc = carry
            (tr, _), carry = solver.run(
                c0, c1, tc, CHUNK, sync=False, preds=preds,
                record="traj", save_every=se,
            )
            err2 += float(sq(tr, truth_chunks[ci]))
        return float(np.sqrt(err2 / tnorm2))

    res = {
        "mesh": name, "parts": parts, "steps": T,
        "elements": len(prob.mesh.tetra), "ndof": prob.ndof,
        "dt": prob.dt, "device": str(jax.devices()[0]),
        "exact": commfree_err(None, 0.0, 0),
        "noise": [],
    }
    print(f"[{name}] exact (closed-loop floor): {res['exact']*100:.3f}%",
          flush=True)

    # ---- intrinsic band-limit floor: preds = lowpass(truth) ------------
    # The n_s-strided surrogate can at best represent the coarse band; the
    # high-frequency residual of the TRUE interface motion is then an
    # unavoidable "error" whose amplification sets the method's floor for
    # any band-limited predictor (pred_smooth included).
    @jax.jit
    def lp_chunk(sh):
        pad = LP_WIN // 2
        w = 2 * pad + 1
        zp = jnp.concatenate(
            [sh[:, 1 : pad + 1][:, ::-1], sh,
             sh[:, -pad - 1 : -1][:, ::-1]], axis=1,
        )
        cs = jnp.cumsum(zp, axis=1)
        cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
        return (cs[:, w:] - cs[:, :-w]) / w

    hp2 = 0.0
    carry = (d0, dnl, jnp.float32(0.0))
    err2 = 0.0
    for ci in range(len(shared_chunks)):
        lp = lp_chunk(shared_chunks[ci])
        hp2 += float(jnp.sum((shared_chunks[ci] - lp) ** 2))
        c0, c1, tc = carry
        (tr, _), carry = solver.run(
            c0, c1, tc, CHUNK, sync=False, preds=lp,
            record="traj", save_every=se,
        )
        err2 += float(sq(tr, truth_chunks[ci]))
    res["hp_truth_rel"] = round(float(np.sqrt(hp2 / sh_norm2)), 6)
    res["lp_truth_err"] = round(float(np.sqrt(err2 / tnorm2)), 6)
    res["lp_truth_gain"] = round(
        res["lp_truth_err"] / max(res["hp_truth_rel"], 1e-30), 3
    )
    print(
        f"[{name}] lowpass(truth) preds: hp-residual="
        f"{res['hp_truth_rel']*100:.3f}% -> interior err="
        f"{res['lp_truth_err']*100:.3f}% (gain {res['lp_truth_gain']:.1f})",
        flush=True,
    )
    for eps in args.eps:
        for spec in ("white", "low", "interleave"):
            t0 = time.time()
            err = commfree_err(spec, eps, hash((spec, eps)) % 2**31)
            res["noise"].append(
                {"eps": eps, "spectrum": spec,
                 "interior_relL2": round(err, 6),
                 "gain": round(err / eps, 3)}
            )
            print(f"[{name}] eps={eps:g} {spec}: err={err*100:.3f}% "
                  f"gain={err/eps:.2f} ({time.time()-t0:.0f}s)",
                  flush=True)
            (out / f"{name}.json").write_text(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
