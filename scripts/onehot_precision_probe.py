"""Is a one-hot f32 matmul EXACT on the MXU below HIGHEST precision?

The fused online kernel scatters/gathers shared rows through one-hot
selector matmuls at precision=HIGHEST (6 bf16 passes). A one-hot product
is value * 1.0 summed with zeros, so the only rounding is the operand
decomposition: HIGH (3 passes, bf16x3) represents a 24-bit f32 mantissa
exactly in three 8-bit chunks and should reproduce the value bit-for-bit;
DEFAULT (1 pass) truncates to bf16 and must not be used. This probe
verifies that on the real device before the kernel switches to HIGH.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    S3p, DLB = 768, 1792
    sld = rng.choice(DLB, size=S3p, replace=False).astype(np.int32)
    sel_np = np.zeros((S3p, DLB), np.float32)
    sel_np[np.arange(S3p), sld] = 1.0
    sel = jnp.asarray(sel_np)
    # values spanning many exponents incl. denormal-ish and huge
    vals = jnp.asarray(
        (rng.standard_normal(S3p) * 10.0 ** rng.uniform(-30, 30, S3p))
        .astype(np.float32)
    )
    state = jnp.asarray(rng.standard_normal(DLB).astype(np.float32))

    for prec in ["DEFAULT", "HIGH", "HIGHEST"]:
        p = getattr(jax.lax.Precision, prec)
        scat = jax.jit(
            lambda v: jnp.dot(v[None, :], sel, precision=p,
                              preferred_element_type=jnp.float32)[0]
        )(vals)
        gath = jax.jit(
            lambda s: jax.lax.dot_general(
                s[None, :], sel, (((1,), (1,)), ((), ())), precision=p,
                preferred_element_type=jnp.float32)[0]
        )(state)
        scat_exact = bool((np.asarray(scat)[sld] == np.asarray(vals)).all())
        off = np.setdiff1d(np.arange(DLB), sld)
        zeros_ok = bool((np.asarray(scat)[off] == 0).all())
        gath_exact = bool(
            (np.asarray(gath) == np.asarray(state)[sld]).all()
        )
        print(f"{prec:8s} scatter bit-exact={scat_exact} "
              f"off-slots-zero={zeros_ok} gather bit-exact={gath_exact}")


if __name__ == "__main__":
    main()
