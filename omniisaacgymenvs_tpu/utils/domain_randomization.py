"""Domain randomization subsystem.

Reference: utils/domain_randomization/randomize.py — YAML-driven DR over
observations/actions (direct noise, :212-263) and simulation/articulation
parameters (via the replicator graph, :126-174), with on_reset /
on_interval / on_startup gates, gaussian/uniform/loguniform distributions,
additive/scaling operations, and runtime-schedulable distribution
parameters (:461-510).

Here the *semantics* are kept and the mechanism is replaced (SURVEY.md
§7.4): observation/action noise is applied inside the jitted step
(correlated per-episode draws held in the task carry + uncorrelated
per-step draws), and simulation parameters become a per-env `overlay`
pytree of scale factors consumed by the physics engine (mass, drive
stiffness/damping, contact friction, gravity) — traced parameter
perturbation over the env axis instead of a replicator OmniGraph.

Config schema (mirrors reference task yaml):

    domain_randomization:
      randomize: True
      min_frequency: 720
      randomization_params:
        observations:
          on_reset:    {operation: additive, distribution: gaussian,
                        distribution_parameters: [0, 0.002]}
          on_interval: {frequency_interval: 1, operation: additive,
                        distribution: gaussian,
                        distribution_parameters: [0, 0.002]}
        actions:
          on_reset:    {...}
          on_interval: {...}
        simulation:
          gravity: {on_reset: {operation: additive,
                               distribution: gaussian,
                               distribution_parameters: [[0,0,0], [0,0,0.4]]}}
        articulation_views:
          robot_view:
            stiffness: {on_reset: {operation: scaling,
                                   distribution: uniform,
                                   distribution_parameters: [0.75, 1.5]}}
            damping:   {...}
            mass:      {...}
            material_properties: {...}   # -> contact friction scale
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _sample(rng, spec: dict, shape):
    dist = spec.get("distribution", "gaussian")
    p = spec.get("distribution_parameters", [0.0, 1.0])
    lo = jnp.broadcast_to(jnp.asarray(p[0], jnp.float32), shape)
    hi = jnp.broadcast_to(jnp.asarray(p[1], jnp.float32), shape)
    if dist == "gaussian":
        return lo + hi * jax.random.normal(rng, shape)
    if dist == "uniform":
        return jax.random.uniform(rng, shape, minval=lo, maxval=hi)
    if dist == "loguniform":
        return jnp.exp(
            jax.random.uniform(
                rng, shape, minval=jnp.log(lo), maxval=jnp.log(hi)
            )
        )
    raise ValueError(f"unknown distribution {dist!r}")


def _apply(x, noise, spec: dict):
    if spec.get("operation", "additive") == "scaling":
        return x * noise
    return x + noise


class Randomizer:
    """Parses the reference-schema DR config and provides pure functions
    used inside the jitted step. Distribution parameters are plain Python
    state: `set_dr_distribution_parameters` mutates them and the next jit
    trace picks them up (reference Randomizer
    set/get_dr_distribution_parameters :461-510)."""

    def __init__(self, dr_cfg: Optional[dict]):
        dr_cfg = dr_cfg or {}
        self.randomize = bool(dr_cfg.get("randomize", False))
        self.params = dr_cfg.get("randomization_params", {}) or {}

    # ------------------------------------------------------------------
    def _spec(self, *path):
        d = self.params
        for p in path:
            if not isinstance(d, dict) or p not in d:
                return None
            d = d[p]
        return d

    def get_dr_distribution_parameters(self, *path):
        spec = self._spec(*path)
        return None if spec is None else spec.get("distribution_parameters")

    def set_dr_distribution_parameters(self, parameters, *path):
        spec = self._spec(*path)
        if spec is None:
            raise KeyError(f"no DR spec at {path}")
        spec["distribution_parameters"] = list(parameters)

    # ------------------------------------------------------------------
    # observation / action noise (reference :212-263)
    def sample_correlated(self, rng, num_obs: int, num_actions: int) -> dict:
        """Per-episode (on_reset) correlated noise draws -> carry entries."""
        out = {}
        k1, k2 = jax.random.split(rng)
        spec = self._spec("observations", "on_reset")
        if spec:
            out["obs_corr"] = _sample(k1, spec, (num_obs,))
        spec = self._spec("actions", "on_reset")
        if spec:
            out["act_corr"] = _sample(k2, spec, (num_actions,))
        return out

    def randomize_observations(self, obs, rng, corr: dict, progress=None):
        spec = self._spec("observations", "on_reset")
        if spec and "obs_corr" in corr:
            obs = _apply(obs, corr["obs_corr"], spec)
        spec = self._spec("observations", "on_interval")
        if spec:
            noised = _apply(obs, _sample(rng, spec, obs.shape), spec)
            obs = self._gate_interval(spec, progress, noised, obs)
        return obs

    def randomize_actions(self, action, rng, corr: dict, progress=None):
        spec = self._spec("actions", "on_reset")
        if spec and "act_corr" in corr:
            action = _apply(action, corr["act_corr"], spec)
        spec = self._spec("actions", "on_interval")
        if spec:
            noised = _apply(action, _sample(rng, spec, action.shape), spec)
            action = self._gate_interval(spec, progress, noised, action)
        return action

    @staticmethod
    def _gate_interval(spec, progress, noised, clean):
        """Apply on_interval noise every `frequency_interval` steps
        (reference randomize.py frequency gating)."""
        freq = int(spec.get("frequency_interval", 1))
        if freq <= 1 or progress is None:
            return noised
        return jnp.where(progress % freq == 0, noised, clean)

    # ------------------------------------------------------------------
    # simulation / articulation parameter overlay (reference :126-174,
    # :525-578 — semantics; engine consumes the overlay per env)
    def sample_overlay(self, rng, model) -> Optional[dict]:
        """Per-env physics parameter overlay sampled at reset."""
        views = {}
        for group in ("articulation_views", "rigid_prim_views"):
            for _, v in (self._spec(group) or {}).items():
                views.update(v or {})
        sim = self._spec("simulation") or {}
        if not views and not sim:
            return None
        ks = jax.random.split(rng, 5)
        overlay = {}
        spec = (views.get("stiffness") or {}).get("on_reset")
        if spec:
            overlay["stiffness_scale"] = _sample(ks[0], spec, (model.njd,))
        spec = (views.get("damping") or {}).get("on_reset")
        if spec:
            overlay["damping_scale"] = _sample(ks[1], spec, (model.njd,))
        spec = (views.get("mass") or {}).get("on_reset")
        if spec:
            overlay["mass_scale"] = _sample(ks[2], spec, (model.nb,))
        spec = (views.get("material_properties") or {}).get("on_reset")
        if spec:
            overlay["friction_scale"] = _sample(ks[3], spec, ())
        spec = (sim.get("gravity") or {}).get("on_reset")
        if spec:
            overlay["gravity_delta"] = _sample(ks[4], spec, (3,))
        return overlay or None
