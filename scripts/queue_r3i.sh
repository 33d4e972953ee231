#!/bin/bash
# Round-3 queue I: nh TPU fault probe — bisect dispatch length.
set -u
cd /root/repo
while ! grep -q 'QUEUE DONE' /tmp/queue_r3h.log 2>/dev/null; do sleep 30; done
probe() {
  echo "=== $(date +%H:%M:%S) nh probe steps=$1 chunk=$2 ===" >> /tmp/queue_r3i.log
  timeout 1200 python - "$1" "$2" >> /tmp/queue_r3i.log 2>&1 <<'PY'
import sys, time
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/savtpu_jax_cache")
import jax.numpy as jnp
from savtpu.config import Config
from savtpu.pipeline.common import build_context
steps, chunk = int(sys.argv[1]), int(sys.argv[2])
cfg = Config(); cfg.beam_cells=(48,4,4); cfg.beam_extent=(12.,1.,1.)
cfg.workdir='/tmp/nh_probe/Results'; cfg.model_dir='/tmp/nh_probe/models'
cfg.partition.n_parts=8; cfg.solver.num_steps=steps
cfg.material.model='neo_hookean'; cfg.solver.save_every=50
ctx = build_context(cfg, dtype=jnp.float32)
sp, solver = ctx.sp, ctx.solver
d0 = sp.localize(ctx.prob.d0); dn = sp.localize(ctx.prob.dn)
t0 = time.time()
(traj, sh), carry = solver.run_streamed(
    d0, dn, 0.0, steps, sync=True, record="all", save_every=50,
    chunk_steps=chunk)
import numpy as np
print(f"OK steps={steps} chunk={chunk} {time.time()-t0:.1f}s "
      f"finite={np.isfinite(traj).all()}", flush=True)
PY
  echo "=== exit $? ===" >> /tmp/queue_r3i.log
}
probe 20000 20000
probe 100000 20000
probe 100000 100000
echo "QUEUE DONE" >> /tmp/queue_r3i.log
