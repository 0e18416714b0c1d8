"""Fit MLPotential weights to EMT Cu data (energies + forces).

VERDICT r3 item 8: the MLFF contract must carry NON-placeholder
weights. No trained foundation checkpoint can be downloaded in this
image (zero egress), so this script distills the in-repo EMT Cu
physics into the message-passing potential and commits the result:

* data: rattled (sigma in {0.03, 0.07, 0.12}) and +-1.5%-strained
  4x4x4 fcc-Cu supercells (256 atoms; heights satisfy the binned-path
  3*rc validity bound at rc=4.5), labeled with the jitted EMT
  energy/forces;
* loss: mean squared force error + 0.1 * (per-atom energy error)^2,
  full-batch Adam;
* output: ``sella_tpu/potentials/weights/mlff_cu_emt.npz`` (a few kB)
  plus train/val force RMSE vs the random-init baseline printed as one
  JSON line (paste into the weights README / test thresholds).

Usage:  python tools/fit_mlff.py [steps] [out.npz]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default to host CPU; FIT_PLATFORM=axon trains on the TPU chip (the
# bench host has ONE core, so CPU training contends with everything)
_plat = os.environ.get("FIT_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat

import jax                              # noqa: E402

# beat the axon sitecustomize (it force-sets jax_platforms)
try:
    jax.config.update("jax_platforms", _plat)
except RuntimeError:
    pass

print("platform:", jax.default_backend(), file=sys.stderr, flush=True)

import jax.numpy as jnp                 # noqa: E402

from sella_tpu.potentials.emt import EMT, fcc_bulk   # noqa: E402
from sella_tpu.potentials.mlff import MLPotential    # noqa: E402


def make_dataset(n_train=48, n_val=12, seed=0):
    # 4x4x4 (256 atoms): heights 14.36 >= 3*rc for rc=4.5 — the
    # binned-path validity bound (CellBins)
    atoms = fcc_bulk("Cu", 3.59, reps=(4, 4, 4))
    nat = len(atoms)
    cell0 = np.asarray(atoms.cell)
    rng = np.random.RandomState(seed)
    xs, cells = [], []
    sigmas = [0.03, 0.07, 0.12]
    for i in range(n_train + n_val):
        sig = sigmas[i % len(sigmas)]
        strain = 1.0 + 0.015 * rng.uniform(-1, 1)
        cell = cell0 * strain
        pos = atoms.positions * strain + sig * rng.normal(
            size=atoms.positions.shape
        )
        xs.append(pos.ravel())
        cells.append(cell)
    xs = jnp.asarray(np.stack(xs))
    cells = jnp.asarray(np.stack(cells))
    emt = EMT(np.asarray(atoms.numbers), pbc=True)

    @jax.jit
    def label(x, cell):
        e, g = jax.value_and_grad(emt.energy)(x, cell)
        return e, -g

    E, F = jax.vmap(label)(xs, cells)
    return (atoms, nat, (xs[:n_train], cells[:n_train],
                         E[:n_train], F[:n_train]),
            (xs[n_train:], cells[n_train:], E[n_train:], F[n_train:]))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sella_tpu", "potentials", "weights", "mlff_cu_emt.npz",
    )
    import optax

    atoms, nat, train, val = make_dataset()
    xs, cells, E, F = train
    pot = MLPotential(np.asarray(atoms.numbers), np.asarray(xs[0]),
                      cell=np.asarray(cells[0]), rc=4.5)

    def predict(params, x, cell):
        e, g = jax.value_and_grad(
            lambda xx: pot.energy_with_params(params, xx, cell)
        )(x)
        return e, -g

    def loss_fn(params, x, cell, e_ref, f_ref):
        e, f = predict(params, x, cell)
        return (jnp.mean((f - f_ref) ** 2)
                + 0.1 * ((e - e_ref) / nat) ** 2)

    def batch_loss(params):
        # scan (not vmap) over systems: the full-batch force-loss
        # gradient through 48 message-passing graphs materializes
        # ~0.5 GB temps PER dot_general under vmap (OOMs the 16 GB
        # chip); the scan evaluates one system's forward+backward at a
        # time, compiled once
        def body(acc, xcef):
            x, c, e, f = xcef
            return acc + loss_fn(params, x, c, e, f), None

        total, _ = jax.lax.scan(body, jnp.zeros(()), (xs, cells, E, F))
        return total / xs.shape[0]

    opt = optax.adam(2e-3)
    params = pot.params
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        l, grads = jax.value_and_grad(batch_loss)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, l

    @jax.jit
    def _sqerr_sum(params, x, c, f):
        def body(acc, xcf):
            xx, cc, ff = xcf
            _, fp = predict(params, xx, cc)
            return acc + jnp.sum((fp - ff) ** 2), None

        total, _ = jax.lax.scan(body, jnp.zeros(()), (x, c, f))
        return total

    def frmse(params, data):
        x, c, e, f = data
        return float(jnp.sqrt(_sqerr_sum(params, x, c, f) / f.size))

    rmse0 = frmse(params, val)
    for i in range(steps):
        params, state, l = step(params, state)
        if i % 200 == 0:
            print(f"step {i}: loss {float(l):.5f}", file=sys.stderr,
                  flush=True)

    os.makedirs(os.path.dirname(out), exist_ok=True)
    pot.params = params
    pot.save_params(out)
    result = {
        "out": out,
        "val_force_rmse_fitted": round(frmse(params, val), 5),
        "val_force_rmse_random_init": round(rmse0, 5),
        "train_force_rmse_fitted": round(frmse(params, train), 5),
        "nat": nat,
        "steps": steps,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
