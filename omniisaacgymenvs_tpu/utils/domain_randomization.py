"""Domain randomization subsystem.

Reference: utils/domain_randomization/randomize.py — YAML-driven DR over
observations/actions (direct noise, :212-263) and simulation/rigid-prim/
articulation parameters (via the replicator graph, :126-174), with
on_startup / on_reset / on_interval gates (:58-124, :344-430),
gaussian/uniform/loguniform distributions, additive/scaling operations,
and runtime-schedulable distribution parameters (:461-510).

Here the *semantics* are kept and the mechanism is replaced (SURVEY.md
§7.4): observation/action noise is applied inside the jitted step
(correlated per-episode draws held in the task carry + uncorrelated
per-step draws), and simulation parameters become a per-env `overlay`
pytree consumed by the physics engine — traced parameter perturbation over
the env axis instead of a replicator OmniGraph.

Overlay keys (canonical, consumed by physics/engine.py and the fused
kernel):
  stiffness_scale/damping_scale (njd,)      drive gains
  mass_scale (nb,)                          mass+inertia (mass & density DR)
  geom_scale (nb,)                          collision geometry (scale DR)
  friction_scale (nb,)                      per-body contact friction
                                            (material_properties DR)
  gravity_delta (3,)                        simulation.gravity
  limit_lower_delta/limit_upper_delta (njd,)  dof limit shifts
  tendon_stiffness_scale/tendon_damping_scale (nt,)

Gates:
  on_startup  — sampled once per env, persists across episode resets
                (reference randomize_scale/mass/density_on_startup
                :525-578)
  on_reset    — re-sampled at every episode reset
  on_interval — re-sampled every `frequency_interval` env steps
                (reference _generate_on_interval_properties)

Views: tasks may expose `dr_views` mapping the yaml's view names (e.g.
shadow_hand_view, object_view) to index sets {dofs, bodies, tendons};
properties randomize only the view's indices, others stay neutral. Without
a view map every index is randomized.

Config schema mirrors the reference task yaml (e.g.
cfg/task/ShadowHand.yaml:135-221) — see tests/test_domain_randomization.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sample(rng, spec: dict, shape):
    dist = spec.get("distribution", "gaussian")
    p = spec.get("distribution_parameters", [0.0, 1.0])
    p0, p1 = np.asarray(p[0], np.float32), np.asarray(p[1], np.float32)
    if p0.ndim > 0 and p0.shape != tuple(shape):
        # material_properties carries (static_friction, dynamic_friction,
        # restitution) triplets (reference randomize.py num_buckets blocks);
        # the compliant contact model has ONE friction coefficient — use the
        # static-friction component
        p0, p1 = p0.reshape(-1)[0], p1.reshape(-1)[0]
    lo = jnp.broadcast_to(jnp.asarray(p0), shape)
    hi = jnp.broadcast_to(jnp.asarray(p1), shape)
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


# property -> (overlay key, kind, view index set, model size attribute)
_PROP_MAP = {
    "stiffness": ("stiffness_scale", "scale", "dofs", "njd"),
    "damping": ("damping_scale", "scale", "dofs", "njd"),
    "mass": ("mass_scale", "scale", "bodies", "nb"),
    "density": ("mass_scale", "scale", "bodies", "nb"),
    "scale": ("geom_scale", "scale", "bodies", "nb"),
    "material_properties": ("friction_scale", "scale", "bodies", "nb"),
    "lower_dof_limits": ("limit_lower_delta", "delta", "dofs", "njd"),
    "upper_dof_limits": ("limit_upper_delta", "delta", "dofs", "njd"),
    "tendon_stiffnesses": ("tendon_stiffness_scale", "scale", "tendons",
                           "nt"),
    "tendon_dampings": ("tendon_damping_scale", "scale", "tendons", "nt"),
}

_GATES = ("on_startup", "on_reset", "on_interval")


def combine_overlays(a: Optional[dict], b: Optional[dict]) -> Optional[dict]:
    """Merge two overlay dicts: *_scale keys multiply, *_delta keys add."""
    if not a:
        return b
    if not b:
        return a
    out = dict(a)
    for k, v in b.items():
        if k not in out:
            out[k] = v
        elif k.endswith("_scale"):
            out[k] = out[k] * v
        else:
            out[k] = out[k] + v
    return out


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
        self._warn_unknown()

    def _warn_unknown(self):
        import warnings

        known_groups = {"observations", "actions", "simulation",
                        "articulation_views", "rigid_prim_views"}
        for g in self.params:
            if g not in known_groups:
                warnings.warn(f"unknown DR group {g!r} ignored")
        for group in ("articulation_views", "rigid_prim_views"):
            for view, props in (self.params.get(group) or {}).items():
                for prop in props or {}:
                    if prop not in _PROP_MAP:
                        warnings.warn(
                            f"unknown DR property {group}.{view}.{prop!r} "
                            "ignored"
                        )

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
    # simulation / articulation / rigid-prim parameter overlays
    def _entries(self, model, views, gate):
        """All (overlay_key, kind, mask_indices|None, size, spec) for one
        gate across the view groups + simulation block. `views` maps the
        yaml's view names to model index sets; with no map every index is
        randomized; with a map, unknown view names are skipped (e.g. the
        reference's goal_view, a visual-only prim)."""
        out = []
        for group in ("articulation_views", "rigid_prim_views"):
            for view_name, props in (self._spec(group) or {}).items():
                if views is not None and view_name not in views:
                    continue
                vmap = (views or {}).get(view_name, {})
                for prop, gates in (props or {}).items():
                    if prop not in _PROP_MAP:
                        continue
                    spec = (gates or {}).get(gate)
                    if not spec:
                        continue
                    key, kind, idx_field, size_attr = _PROP_MAP[prop]
                    size = getattr(model, size_attr)
                    if size == 0:
                        continue
                    mask = vmap.get(idx_field)
                    if mask is not None:
                        mask = np.asarray(mask, np.int32)
                    out.append((key, kind, mask, size, spec))
        grav = (self._spec("simulation", "gravity") or {}).get(gate)
        if grav:
            out.append(("gravity_delta", "delta", None, 3, grav))
        return out

    def _sample_entry(self, rng, key, kind, mask, size, spec):
        op = spec.get("operation", "scaling" if kind == "scale" else
                      "additive")
        n = size if mask is None else len(mask)
        sample = _sample(rng, spec, (n,))
        if kind == "scale":
            if op == "additive":
                # additive op on a scale-typed property: perturb around 1
                sample = 1.0 + sample
        else:
            if op == "scaling":
                raise ValueError(
                    f"scaling operation unsupported for delta property "
                    f"{key!r}"
                )
        neutral = 1.0 if kind == "scale" else 0.0
        if mask is None:
            return sample
        return jnp.full((size,), neutral).at[jnp.asarray(mask)].set(sample)

    def _sample_gate(self, rng, model, views, gate) -> Optional[dict]:
        entries = self._entries(model, views, gate)
        if not entries:
            return None
        out: dict = {}
        for i, (key, kind, mask, size, spec) in enumerate(entries):
            val = self._sample_entry(
                jax.random.fold_in(rng, i), key, kind, mask, size, spec
            )
            out = combine_overlays(out, {key: val})
        return out

    def sample_overlay(self, rng, model, views=None) -> Optional[dict]:
        """Per-episode (on_reset) physics parameter overlay. Keys that are
        only on_interval-gated get NEUTRAL initial values so the carry
        pytree structure is identical on every step (lax.scan requires it —
        update_interval_overlay where-merges into these)."""
        out = self._sample_gate(rng, model, views, "on_reset")
        ientries = self._entries(model, views, "on_interval")
        if ientries:
            out = dict(out or {})
            for key, kind, mask, size, spec in ientries:
                if key not in out:
                    out[key] = (
                        jnp.ones(size) if kind == "scale" else jnp.zeros(size)
                    )
        return out or None

    def sample_startup_overlay(self, rng, model, views=None) -> Optional[dict]:
        """Once-per-env (on_startup) overlay — persisted across resets by
        the task base (reference randomize_scale/mass/density_on_startup,
        randomize.py:525-578)."""
        return self._sample_gate(rng, model, views, "on_startup")

    def has_interval_overlays(self) -> bool:
        return bool(self._entries_cache_interval)

    def update_interval_overlay(self, overlay, rng, model, progress,
                                views=None) -> Optional[dict]:
        """Re-sample on_interval physics parameters every
        `frequency_interval` env steps; other steps keep the current values
        (reference on_interval gating via randomization_buf)."""
        entries = self._entries(model, views, "on_interval")
        if not entries:
            return overlay
        overlay = dict(overlay or {})
        for i, (key, kind, mask, size, spec) in enumerate(entries):
            fresh = self._sample_entry(
                jax.random.fold_in(rng, 101 + i), key, kind, mask, size, spec
            )
            freq = int(spec.get("frequency_interval", 1))
            neutral = jnp.ones(size) if kind == "scale" else jnp.zeros(size)
            cur = overlay.get(key, neutral)
            overlay[key] = jnp.where(progress % freq == 0, fresh, cur)
        return overlay

    @property
    def _entries_cache_interval(self):
        # cheap structural check (no model sizes needed): any on_interval
        # gate under the view groups or simulation?
        for group in ("articulation_views", "rigid_prim_views"):
            for props in (self._spec(group) or {}).values():
                for gates in (props or {}).values():
                    if isinstance(gates, dict) and "on_interval" in gates:
                        return True
        g = self._spec("simulation", "gravity") or {}
        return "on_interval" in g
