"""Simulated-annealing molecular dynamics (C15 equivalent).

The reference ships standalone velocity-Verlet annealing integrators
with three thermostats (``/root/reference/sella/samd.py``: BDP
stochastic rescaling, plain velocity rescaling, CSVR). Here the whole
trajectory is one ``lax.scan`` over a jitted velocity-Verlet step —
jittable, vmappable over an ensemble of replicas, and runnable on TPU.

API: ``samd(potential, atoms, ...)`` host convenience, or the pure
``make_md_step``/``anneal`` functions for composition with the batched
ensemble machinery.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.units import fs, kB


class MDState(NamedTuple):
    x: jnp.ndarray        # (d,) positions
    v: jnp.ndarray        # (d,) velocities
    f: jnp.ndarray        # (d,) forces (= -gradient)
    e_pot: jnp.ndarray    # ()
    key: jnp.ndarray


def _kinetic(v, masses3):
    return 0.5 * jnp.sum(masses3 * v * v)


def _thermostat_factor(kind: str, ekin, target_ekin, ndof, taut_steps,
                       key):
    """Velocity-scaling factor per step.

    * ``rescale``: deterministic exponential relaxation toward the
      target kinetic energy (``samd.py:48-77``).
    * ``bdp``/``csvr``: Bussi–Donadio–Parrinello stochastic velocity
      rescaling (``samd.py:14-46, 79-108``) — canonical sampling with
      the correct kinetic-energy fluctuations. The Wiener increment of
      the BDP SDE is integrated per step.
    """
    c = jnp.exp(-1.0 / taut_steps)
    if kind == "rescale":
        new_ekin = ekin + (1.0 - c) * (target_ekin - ekin)
        return jnp.sqrt(jnp.maximum(new_ekin, 1e-12) / ekin)
    # BDP / CSVR: dK = (K0 - K) dt/tau + 2 sqrt(K K0 / ndof / tau) dW
    k1, k2 = jax.random.split(key)
    r1 = jax.random.normal(k1, ())
    # sum of (ndof - 1) squared gaussians ~ chi2; use Gamma sampling
    rsum = 2.0 * jax.random.gamma(k2, (ndof - 1) / 2.0)
    kt = target_ekin / (0.5 * ndof)  # = kB T
    new_ekin = (
        ekin * c
        + (1.0 - c) * 0.5 * kt * (r1**2 + rsum)
        + 2.0 * r1 * jnp.sqrt(c * (1.0 - c) * ekin * 0.5 * kt)
    )
    return jnp.sqrt(jnp.maximum(new_ekin, 1e-12) / ekin)


def make_md_step(potential, masses: np.ndarray, cell=None,
                 dt_fs: float = 1.0, thermostat: str = "bdp",
                 taut_steps: float = 100.0, fixed_temp: bool = False):
    """Build a jitted velocity-Verlet + thermostat step.

    Returns ``step(state, target_temp) -> state``; scan it with a
    temperature schedule to anneal.
    """
    masses3 = jnp.asarray(np.repeat(np.asarray(masses), 3))
    dt = dt_fs * fs
    ndof = 3 * len(masses)
    if cell is None:
        cell = jnp.zeros((3, 3))

    def step(state: MDState, temp) -> MDState:
        v = state.v + 0.5 * dt * state.f / masses3
        x = state.x + dt * v
        e_pot, g = jax.value_and_grad(potential.energy)(x, cell)
        f = -g
        v = v + 0.5 * dt * f / masses3

        ekin = _kinetic(v, masses3)
        target = 0.5 * ndof * kB * temp
        key, sub = jax.random.split(state.key)
        scale = _thermostat_factor(
            thermostat, jnp.maximum(ekin, 1e-12), target, ndof,
            taut_steps, sub,
        )
        return MDState(x, v * scale, f, e_pot, key)

    return step


def anneal(potential, x0, masses, t_start: float, t_end: float,
           nsteps: int, cell=None, dt_fs: float = 1.0,
           thermostat: str = "bdp", taut_steps: float = 100.0,
           seed: int = 0):
    """Run an annealing trajectory as one lax.scan; returns the final
    MDState and the per-step (e_pot, e_kin) record."""
    x0 = jnp.asarray(x0)
    masses3 = jnp.asarray(np.repeat(np.asarray(masses), 3))
    if cell is None:
        cell = jnp.zeros((3, 3))
    key = jax.random.PRNGKey(seed)
    key, vkey = jax.random.split(key)
    # Maxwell-Boltzmann initialization at t_start
    v0 = (
        jax.random.normal(vkey, x0.shape, x0.dtype)
        * jnp.sqrt(kB * t_start / masses3)
    )
    e0, g0 = jax.value_and_grad(potential.energy)(x0, cell)
    state = MDState(x0, v0, -g0, e0, key)

    temps = jnp.linspace(t_start, t_end, nsteps)
    step = make_md_step(potential, masses, cell, dt_fs, thermostat,
                        taut_steps)

    def body(st, temp):
        st = step(st, temp)
        return st, (st.e_pot, _kinetic(st.v, masses3))

    state, record = jax.lax.scan(body, state, temps)
    return state, record


def samd(atoms, t_start: float, t_end: float, nsteps: int, **kwargs):
    """Host convenience: anneal an Atoms object in place."""
    from ..potentials.base import get_potential

    pot = get_potential(atoms)
    if pot is None:
        raise ValueError("samd requires a jax-native Potential")
    state, record = anneal(
        pot, atoms.positions.ravel(), atoms.get_masses(),
        t_start, t_end, nsteps, cell=jnp.asarray(atoms.cell), **kwargs
    )
    atoms.positions = np.asarray(state.x).reshape(-1, 3)
    return record
