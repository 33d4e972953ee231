"""Surrogate training throughput: savtpu (JAX, one jitted scan per epoch)
vs a reference-style PyTorch loop (per-batch Python dispatch, CPU — the
reference trains on CPU or a single GPU; this image has CPU torch).

Same architecture (2-layer bi-dir LSTM encoder H=50, decoder 2H, linear
head), same data (reference-shaped windows: 221 train samples of
20->20 @ D=27), same batch size 10, same Adam 5e-4.

Usage: python benchmarks/train_bench.py [--epochs 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_data(G=295, n_past=20, n_future=20, D=27, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 40, (G + n_past + n_future) * 2)
    base = np.stack(
        [np.sin(0.5 * t + 0.2 * d) + 0.1 * rng.normal(size=t.shape)
         for d in range(D)],
        axis=1,
    )
    idx = np.arange(G)
    X = base[idx[:, None] + np.arange(n_past)[None, :]]
    Y = base[idx[:, None] + n_past + np.arange(n_future)[None, :]]
    return X.astype(np.float32), Y.astype(np.float32)


def bench_savtpu(X, Y, epochs):
    """Two-point measurement: fit() is ONE jitted program whose compile
    time is epoch-count-independent; (t(N+M) - t(N))/M isolates the
    steady-state per-epoch cost (what a 3450-epoch production run pays)."""
    from savtpu.config import SurrogateConfig
    from savtpu.models import fit

    def run(n):
        cfg = SurrogateConfig(
            hidden_size=50, n_past=20, n_future=20, batch_size=10,
            learning_rate=5e-4, num_epochs=n, seed=0,
        )
        n_train = int(0.75 * len(X))
        t0 = time.perf_counter()
        params, hist = fit(cfg, X[:n_train], Y[:n_train], log_every=0)
        return time.perf_counter() - t0, hist["train_loss"][-1]

    t_cold, _ = run(epochs)          # pays the (persistent-cacheable) compile
    t_warm, loss = run(epochs)       # compile served from cache
    steady = t_warm / epochs
    return t_cold, loss, steady


def bench_torch(X, Y, epochs):
    import torch
    import torch.nn as nn

    D, H = X.shape[-1], 50
    enc = nn.LSTM(D, H, num_layers=2, batch_first=True, bidirectional=True)
    dec = nn.LSTM(D, 2 * H, num_layers=1, batch_first=True)
    fc = nn.Linear(2 * H, D)
    params = (
        list(enc.parameters()) + list(dec.parameters()) + list(fc.parameters())
    )
    opt = torch.optim.Adam(params, lr=5e-4)
    crit = nn.MSELoss()
    n_train = int(0.75 * len(X))
    Xt = torch.tensor(X[:n_train])
    Yt = torch.tensor(Y[:n_train])
    n_future = Y.shape[1]
    bs = 10
    t0 = time.perf_counter()
    last = None
    B_total = Xt.shape[0]
    for ep in range(epochs):
        perm = torch.randperm(B_total)
        for s in range(0, B_total, bs):
            xb = Xt[perm[s : s + bs]]
            yb = Yt[perm[s : s + bs]]
            opt.zero_grad()
            _, (hn, cn) = enc(xb)
            h = torch.cat((hn.view(2, 2, len(xb), H)[-1][0],
                           hn.view(2, 2, len(xb), H)[-1][1]), 1).unsqueeze(0)
            c = torch.cat((cn.view(2, 2, len(xb), H)[-1][0],
                           cn.view(2, 2, len(xb), H)[-1][1]), 1).unsqueeze(0)
            xi = xb[:, -1, :]
            outs = []
            for _ in range(n_future):
                o, (h, c) = dec(xi.unsqueeze(1), (h, c))
                y = fc(o.squeeze(1))
                outs.append(y)
                xi = y
            out = torch.stack(outs, dim=1)
            loss = crit(out, yb)
            loss.backward()
            opt.step()
            last = float(loss.detach())
    return time.perf_counter() - t0, last


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()
    X, Y = make_data()

    jax_s, jax_loss, jax_steady = bench_savtpu(X, Y, args.epochs)
    torch_s, torch_loss = bench_torch(X, Y, args.epochs)
    import jax as _jax

    torch_per_epoch = torch_s / args.epochs
    out = {
        "epochs": args.epochs,
        "device_savtpu": str(_jax.devices()[0]),
        "savtpu_seconds_incl_compile": jax_s,
        "savtpu_steady_sec_per_epoch": jax_steady,
        "savtpu_steady_epochs_per_sec": 1.0 / jax_steady,
        "torch_cpu_sec_per_epoch": torch_per_epoch,
        "torch_cpu_epochs_per_sec": 1.0 / torch_per_epoch,
        "steady_speedup_vs_torch_cpu": torch_per_epoch / jax_steady,
        "reference_3450_epochs_projection_s": {
            "savtpu": jax_steady * 3450 + (jax_s - jax_steady * args.epochs),
            "torch_cpu": torch_per_epoch * 3450,
        },
        "final_losses": {"savtpu": jax_loss, "torch": torch_loss},
    }
    Path(__file__).parent.joinpath("train_results.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
