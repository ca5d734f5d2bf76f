"""ANYmal rough-terrain locomotion with curriculum.

Reference: tasks/anymal_terrain.py — 188-dim obs [base_lin_vel*2,
base_ang_vel*0.25, projected_gravity, commands*scale(3), dof_pos, dof_vel
*0.05, 140 height measurements, last actions] with additive uniform
observation noise (:158-182, :421-432); explicit in-loop PD torque control
tau = clip(Kp(0.5a + q_def - q) - Kd qd, +-80) at decimation 4 x dt 0.005
(:309-316); procedural terrain curriculum with per-env level/type and
origin update on reset (:203-209, :289-298); random base pushes every 15 s
(:355-357); termination on base/knee proximity to ground (:359-367);
per-term episode reward sums exposed via extras (:282-287, :409-419).
This task overrides the step pipeline entirely (like the reference
overriding post_physics_step :318-353).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.models.anymal import build_anymal
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.physics.engine import (
    PhysicsEngine,
    sim_params_from_cfg,
)
from omniisaacgymenvs_tpu.tasks.base import EnvState, RLTask
from omniisaacgymenvs_tpu.utils.terrain import Terrain

_REW_KEYS = (
    "lin_vel_xy", "lin_vel_z", "ang_vel_z", "ang_vel_xy", "orient",
    "torques", "joint_acc", "base_height", "action_rate", "hip",
)


def _wrap_to_pi(x):
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


class AnymalTerrainTask(RLTask):
    name = "AnymalTerrain"
    num_obs = 188
    num_states = 0
    num_actions = 12
    num_height_points = 140

    def __init__(self, cfg: dict | None = None):
        cfg = cfg or {}
        env_cfg = cfg.get("env", {})
        learn = env_cfg.get("learn", {})
        control = env_cfg.get("control", {})
        ranges = env_cfg.get("randomCommandVelocityRanges", {})
        terrain_cfg = env_cfg.get("terrain", {})
        sim_cfg = cfg.get("sim", {})

        self.lin_vel_scale = learn.get("linearVelocityScale", 2.0)
        self.ang_vel_scale = learn.get("angularVelocityScale", 0.25)
        self.dof_pos_scale = learn.get("dofPositionScale", 1.0)
        self.dof_vel_scale = learn.get("dofVelocityScale", 0.05)
        self.height_meas_scale = learn.get("heightMeasurementScale", 5.0)
        self.action_scale = control.get("actionScale", 0.5)
        self.Kp = control.get("stiffness", 80.0)
        self.Kd = control.get("damping", 2.0)
        self.decimation = control.get("decimation", 4)
        self.sim_dt = sim_cfg.get("dt", 0.005)
        self.dt = self.decimation * self.sim_dt
        self.max_episode_length_s = learn.get("episodeLength_s", 20.0)
        self.max_episode_length = int(self.max_episode_length_s / self.dt + 0.5)
        self.push_interval = int(learn.get("pushInterval_s", 15.0) / self.dt + 0.5)
        self.base_threshold = 0.2
        self.knee_threshold = 0.1
        self.command_x_range = ranges.get("linear_x", (-1.0, 1.0))
        self.command_y_range = ranges.get("linear_y", (-1.0, 1.0))
        self.command_yaw_range = ranges.get("yaw", (-3.14, 3.14))
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)
        self.add_noise = learn.get("addNoise", True)
        nl = learn.get("noiseLevel", 1.0)
        self.noise_vec = np.zeros(188, np.float32)
        self.noise_vec[0:3] = learn.get("linearVelocityNoise", 0.1) * nl * self.lin_vel_scale
        self.noise_vec[3:6] = learn.get("angularVelocityNoise", 0.2) * nl * self.ang_vel_scale
        self.noise_vec[6:9] = learn.get("gravityNoise", 0.05) * nl
        self.noise_vec[12:24] = learn.get("dofPositionNoise", 0.01) * nl * self.dof_pos_scale
        self.noise_vec[24:36] = learn.get("dofVelocityNoise", 1.5) * nl * self.dof_vel_scale
        self.noise_vec[36:176] = learn.get("heightMeasurementNoise", 0.06) * nl * self.height_meas_scale
        self.noise_vec = jnp.asarray(self.noise_vec)

        self.rew_scales = {
            "termination": learn.get("terminalReward", 0.0),
            "lin_vel_xy": learn.get("linearVelocityXYRewardScale", 1.0),
            "lin_vel_z": learn.get("linearVelocityZRewardScale", -4.0),
            "ang_vel_z": learn.get("angularVelocityZRewardScale", 0.5),
            "ang_vel_xy": learn.get("angularVelocityXYRewardScale", -0.05),
            "orient": learn.get("orientationRewardScale", -0.0),
            "torques": learn.get("torqueRewardScale", -0.00002),
            "joint_acc": learn.get("jointAccRewardScale", -0.0005),
            "base_height": learn.get("baseHeightRewardScale", -0.0),
            "action_rate": learn.get("actionRateRewardScale", -0.01),
            "hip": learn.get("hipRewardScale", -0.0),
            "fallen_over": learn.get("fallenOverRewardScale", -1.0),
        }
        for k in self.rew_scales:
            if k != "termination":
                self.rew_scales[k] *= self.dt

        # ---- terrain ----
        self.terrain = Terrain(terrain_cfg, seed=terrain_cfg.get("seed", 7))
        self.curriculum = self.terrain.curriculum
        self.max_init_level = (
            terrain_cfg.get("maxInitMapLevel", 0)
            if self.curriculum else self.terrain.env_rows - 1
        )
        self._hf = (
            jnp.asarray(self.terrain.height_field_raw, jnp.float32)
            * self.terrain.vertical_scale
        )
        # the reference's min-of-two-cells lookup (get_heights :462-480) is
        # precomputed into one table so each height sample is ONE gather —
        # the height scan (num_envs x 140 points) is the dominant op of this
        # task on TPU (gathers run on the scalar pipeline), so the flat
        # 1-gather form doubles task throughput
        hf_min = jnp.minimum(self._hf[:-1, :-1], self._hf[1:, 1:])
        self._hf_min = hf_min.ravel()
        self._hf_cols = self._hf.shape[1] - 1
        # the contact table below packs tread + neighbor heights so the
        # contact-plane lookup (_contact_plane_fn) is ONE 7-wide gather.
        # CONTACT uses the RAW cell height with a SLOPE-LIMITED gradient:
        # the reference collides against a trimesh whose near-vertical
        # faces are slope-corrected to true walls
        # (terrain_utils.py convert_heightfield_to_trimesh slope_threshold),
        # so stair treads are flat planes. Building the contact gradient
        # from min-table differences instead turned every 19 cm riser into
        # a 62-degree pseudo-ramp one cell wide that feet cannot grip
        # (mu=1 holds 45 degrees) — the round-2 curriculum plateau at
        # terrain_level ~4. Where the cell-to-cell slope exceeds
        # the configured slopeTreshold (reference AnymalTerrain.yaml:21,
        # the same value that wall-corrects the reference trimesh), the
        # tread is treated as flat at the sampled height; gentler real
        # slopes keep their gradient.
        hf_raw = self._hf[:-1, :-1]
        dxs = jnp.concatenate([hf_raw[1:], hf_raw[-1:]], axis=0) - hf_raw
        dys = jnp.concatenate([hf_raw[:, 1:], hf_raw[:, -1:]], axis=1) - hf_raw
        slope_lim = (
            terrain_cfg.get("slopeTreshold", 0.5)
            * self.terrain.horizontal_scale
        )
        dxs_t = jnp.where(jnp.abs(dxs) > slope_lim, 0.0, dxs)
        dys_t = jnp.where(jnp.abs(dys) > slope_lim, 0.0, dys)
        # packed per-cell contact table [h, h+gx*hs, h+gy*hs (slope-limited
        # tread plane), hxp, hxn, hyp, hyn (raw 4-neighbor heights for the
        # riser walls)] — one 7-wide gather per contact point
        hxp = jnp.concatenate([hf_raw[1:], hf_raw[-1:]], axis=0)
        hxn = jnp.concatenate([hf_raw[:1], hf_raw[:-1]], axis=0)
        hyp = jnp.concatenate([hf_raw[:, 1:], hf_raw[:, -1:]], axis=1)
        hyn = jnp.concatenate([hf_raw[:, :1], hf_raw[:, :-1]], axis=1)
        self._hf_pack = jnp.stack(
            [hf_raw, hf_raw + dxs_t, hf_raw + dys_t, hxp, hxn, hyp, hyn],
            axis=-1,
        ).reshape(-1, 7)
        self._slope_lim_h = slope_lim
        # riser walls ON by default (r5): vertical riser faces with
        # corner-capture edge contacts are physically faithful to the
        # reference trimesh (terrain_utils.py:301-365 wall correction).
        # They COST score vs the walls-off tread-jump assist (5.58,
        # results/AnymalTerrain_treadonly): with the r5 wedge-contact fix
        # below the faithful model reaches 4.90 at budget (5.06 saturated
        # at 2x, results/AnymalTerrain_wedge_extension; the pre-wedge
        # single-contact walls managed 4.41/4.81,
        # results/AnymalTerrain_walls_singlecontact{,_extension}). The
        # shipped default honors the physics.
        self._riser_walls = bool(terrain_cfg.get("riserWalls", True))
        # wall-top grazing margin in meters; None/'auto' = per-point
        # contact radius (see _contact_plane_fn edge contacts)
        wm = terrain_cfg.get("riserWallMargin", None)
        self._wall_margin = None if wm in (None, "auto") else float(wm)
        # per-substep contact-plane refresh (engine plane_refresh): follows
        # riserWalls by default — the stale-plane error is what makes
        # frozen walls harsh at edges
        self._plane_refresh = bool(
            terrain_cfg.get("planeRefresh", self._riser_walls)
        )
        # two-feature foot contacts (r5): a foot wedged at a step corner
        # physically touches BOTH the tread (support) and the riser
        # (horizontal block); nearest-feature-only selection drops
        # whichever is farther, so a foot grazing a wall lost its ground
        # support for the substep — the per-type level breakdown of the
        # faithful-walls runs shows stairs capped at ~2.4 mean level while
        # slopes/obstacles/stones reach 7-9. The reference trimesh
        # (terrain_utils.py:301-365) yields a multi-point manifold here.
        # Each foot gets a SECOND model contact point routed to the
        # own-cell tread whenever the primary resolved to a riser feature
        # (gated so the cell-crossing "19 cm instant penetration" launcher
        # stays excluded). Defaults to follow riserWalls.
        self._foot_wedge = bool(
            terrain_cfg.get("footWedgeContacts", self._riser_walls)
        )
        self._hs = self.terrain.horizontal_scale
        self._border = self.terrain.border_size
        self._origins = jnp.asarray(self.terrain.env_origins, jnp.float32)

        # author the explicit PD law tau = clip(Kp(targets - q) - Kd qd,
        # +-80) (reference :309-316) as the model's joint drives: the engine
        # re-evaluates drives at EVERY substep (Stable-PD discretization of
        # the same law), which matches the reference's fresh-torque-per-
        # inner-step control at decimation x dt and lets the scene run in
        # the fused whole-step kernel (heightfield local planes included)
        self.model = build_anymal(
            spawn_height=0.62,
            drive=dict(stiffness=self.Kp, drive_damping=self.Kd,
                       max_effort=80.0),
            dual_foot_contacts=self._foot_wedge,
        )
        ncp = int(self.model.cp_body.shape[0])
        # secondary foot points are the LAST 4 by build_anymal contract
        self._secondary_mask = (
            jnp.zeros(ncp, bool).at[ncp - 4:].set(True)
            if self._foot_wedge else None
        )
        self.engine = PhysicsEngine(
            self.model,
            sim_params_from_cfg(
                dict(sim_cfg, dt=self.sim_dt), substeps=1,
                gravity=(0.0, 0.0, -9.81),
            ),
            contact_plane_fn=self._contact_plane_fn,
            plane_refresh=self._plane_refresh,
        )
        self.default_dof_pos = self.model.default_q[self.model.jq0:]
        self._knee_bodies = jnp.asarray(
            [self.model.body_index(f"{l}_KFE") for l in ("LF", "LH", "RF", "RH")]
        )
        # 14x10 height-scan grid (reference init_height_points :172-182)
        y = 0.1 * np.array([-5, -4, -3, -2, -1, 1, 2, 3, 4, 5])
        x = 0.1 * np.array([-8, -7, -6, -5, -4, -3, -2, 2, 3, 4, 5, 6, 7, 8])
        gx, gy = np.meshgrid(x, y, indexing="ij")
        self._height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1),
            jnp.float32,
        )

    # ------------------------------------------------------------------
    def _sample_height(self, x, y):
        """Min-of-two-samples heightfield lookup (reference get_heights,
        tasks/anymal_terrain.py:462-480)."""
        px = jnp.clip(
            ((x + self._border) / self._hs).astype(jnp.int32),
            0, self._hf.shape[0] - 2,
        )
        py = jnp.clip(
            ((y + self._border) / self._hs).astype(jnp.int32),
            0, self._hf.shape[1] - 2,
        )
        return jnp.take(self._hf_min, px * self._hf_cols + py)

    def _contact_plane_fn(self, pt, radius):
        """Nearest-local-feature contact plane per point: stair TREAD
        (slope-limited cell plane, as before) or vertical RISER wall at a
        cell boundary whose neighbor differs by more than slopeTreshold*hs.
        The reference collides a trimesh whose near-vertical faces are
        wall-corrected (terrain_utils.py convert_heightfield_to_trimesh
        slope_threshold): feet meeting a step edge get pushed BACK
        horizontally, not launched vertically. The round-3 single-plane
        model turned risers into vertical launchers (a foot crossing into
        the high cell saw instant 19 cm tread penetration) — the suspected
        blocker at curriculum levels 6+ (VERDICT r3 #4). Selection: among
        {tread, 8 riser candidates} pick the ACTIVE feature with the
        smallest positive penetration (nearest surface of the solid)."""
        x, y, z = pt[..., 0], pt[..., 1], pt[..., 2]
        fx = (x + self._border) / self._hs
        fy = (y + self._border) / self._hs
        px = jnp.clip(fx.astype(jnp.int32), 0, self._hf.shape[0] - 2)
        py = jnp.clip(fy.astype(jnp.int32), 0, self._hf.shape[1] - 2)
        vals = jnp.take(self._hf_pack, px * self._hf_cols + py, axis=0)
        h, hx, hy = vals[..., 0], vals[..., 1], vals[..., 2]
        hxp, hxn, hyp, hyn = (vals[..., 3], vals[..., 4],
                              vals[..., 5], vals[..., 6])
        # tread plane anchored at (x, y, h) with the slope-limited gradient
        n_t = jnp.stack(
            [-(hx - h) / self._hs, -(hy - h) / self._hs, jnp.ones_like(h)],
            axis=-1,
        )
        n_t = n_t / jnp.linalg.norm(n_t, axis=-1, keepdims=True)
        d_t = n_t[..., 0] * x + n_t[..., 1] * y + n_t[..., 2] * h
        best_pen = radius - (jnp.sum(pt * n_t, axis=-1) - d_t)
        best_n, best_d = n_t, d_t

        lim = self._slope_lim_h
        bx1 = (px + 1).astype(jnp.float32) * self._hs - self._border
        bx0 = px.astype(jnp.float32) * self._hs - self._border
        by1 = (py + 1).astype(jnp.float32) * self._hs - self._border
        by0 = py.astype(jnp.float32) * self._hs - self._border
        zero = jnp.zeros_like(h)
        one = jnp.ones_like(h)

        def fold(best, cand):
            (bp, bn, bd, bt) = best
            pen, n, d, act = cand
            sel = act & (pen > 0.0) & ((pen < bp) | (bp <= 0.0))
            return (
                jnp.where(sel, pen, bp),
                jnp.where(sel[..., None], n, bn),
                jnp.where(sel, d, bd),
                bt & ~sel,   # every fold candidate is a riser feature
            )

        # wall-top grazing margin: within `mg` of the riser TOP the contact
        # resolves to the step EDGE (rounded corner), not the wall face —
        # the r4 walls pushed a foot placed on the very edge straight back
        # horizontally, which un-learned edge stepping (terrain_level 4.46
        # walls vs 5.58 tread-only). The reference trimesh's corner vertex
        # produces exactly this corner reaction. Default margin = contact
        # radius (the geometric capture range of a sphere on the corner).
        mg = (
            radius
            if self._wall_margin is None
            else jnp.full_like(h, self._wall_margin)
        )
        # (neighbor height, boundary coord, wall normal, coordinate value)
        walls = [
            # higher-neighbor walls: push back toward own (low) cell,
            # active below the neighbor's tread level minus the margin
            (hxp, bx1, (-one, zero, zero), x, hxp - h > lim, z < hxp - mg),
            (hxn, bx0, (one, zero, zero), x, hxn - h > lim, z < hxn - mg),
            (hyp, by1, (zero, -one, zero), y, hyp - h > lim, z < hyp - mg),
            (hyn, by0, (zero, one, zero), y, hyn - h > lim, z < hyn - mg),
            # drop-edge walls: a point burrowed under its OWN tread next to
            # a lower neighbor crossed the riser from the low side — push it
            # back out toward the low side
            (hxp, bx1, (one, zero, zero), x, h - hxp > lim,
             (z < h) & (z > hxp)),
            (hxn, bx0, (-one, zero, zero), x, h - hxn > lim,
             (z < h) & (z > hxn)),
            (hyp, by1, (zero, one, zero), y, h - hyp > lim,
             (z < h) & (z > hyp)),
            (hyn, by0, (zero, -one, zero), y, h - hyn > lim,
             (z < h) & (z > hyn)),
        ]
        # step-edge (corner) contacts: sphere-vs-horizontal-edge along the
        # riser top, active in the grazing band z > h_neighbor - mg. The
        # normal tilts from horizontal (low on the face) to vertical (on
        # the tread) exactly like a trimesh corner, so a climbing foot gets
        # SUPPORT it can load instead of a flat push-back.
        edges = [
            (hxp, bx1, x, 0, hxp - h > lim),
            (hxn, bx0, x, 0, hxn - h > lim),
            (hyp, by1, y, 1, hyp - h > lim),
            (hyn, by0, y, 1, hyn - h > lim),
        ]
        pen_tread = best_pen
        best = (best_pen, best_n, best_d,
                jnp.ones_like(best_pen, dtype=bool))
        if not self._riser_walls:
            walls = []
            edges = []
        for _, b, nw, coord, is_wall, in_span in walls:
            n = jnp.stack(nw, axis=-1)
            # plane: n . p = d with d = +-b along the wall axis
            d = n[..., 0] * b + n[..., 1] * b  # one term is zero
            pen = radius - (jnp.sum(pt * n, axis=-1) - d)
            best = fold(best, (pen, n, d, is_wall & in_span))
        for hn, b, coord, axis, is_wall in edges:
            dc = coord - b            # horizontal offset from the edge line
            dz = z - hn               # vertical offset from the riser top
            dist = jnp.maximum(jnp.sqrt(dc * dc + dz * dz), 1e-6)
            nc = dc / dist
            nz = dz / dist
            if axis == 0:
                n = jnp.stack([nc, zero, nz], axis=-1)
            else:
                n = jnp.stack([zero, nc, nz], axis=-1)
            d = n[..., axis] * b + n[..., 2] * hn
            pen = radius - dist
            best = fold(best, (pen, n, d, is_wall & (z > hn - mg)))
        _, n, d, is_tread = best
        if (self._secondary_mask is not None
                and d.shape[-1] == self._secondary_mask.shape[0]):
            # (shape guard: diagnostic callers probe arbitrary point sets;
            # the engine always passes the model's full cp set)
            # secondary (wedge) foot points: own-cell TREAD support while
            # the primary is on a riser feature — the two-plane corner
            # manifold. Gate pen_tread <= 2*radius keeps the cell-crossing
            # launcher excluded (a foot that just crossed into the high
            # cell sees its "own" tread ~a step-height above; a genuine
            # corner wedge overlaps the tread by at most ~the radius).
            sec_ok = (~is_tread) & (pen_tread <= 2.0 * radius)
            d_far = jnp.sum(pt * n_t, axis=-1) - radius - 1.0
            d_sec = jnp.where(sec_ok, d_t, d_far)
            m2 = self._secondary_mask
            n = jnp.where(m2[..., None], n_t, n)
            d = jnp.where(m2, d_sec, d)
        return n, d

    # ------------------------------------------------------------------
    def initial_carry(self):
        return dict(
            commands=jnp.zeros(4),        # x, y, yaw_rate (computed), yaw_target
            last_actions=jnp.zeros(12),
            last_dof_vel=jnp.zeros(12),
            torques=jnp.zeros(12),
            targets=self.default_dof_pos,
            noise_key=jax.random.PRNGKey(0),
            level=jnp.zeros((), jnp.int32),
            ttype=jnp.zeros((), jnp.int32),
            origin=jnp.zeros(3),
            episode_sums={k: jnp.zeros(()) for k in _REW_KEYS},
        )

    def initial_metrics(self):
        m = {"episode/rew_" + k: jnp.zeros(()) for k in _REW_KEYS}
        m["episode/terrain_level"] = jnp.zeros(())
        return m

    def _sample_commands(self, rng):
        kx, ky, kw = jax.random.split(rng, 3)
        cx = jax.random.uniform(kx, minval=self.command_x_range[0],
                                maxval=self.command_x_range[1])
        cy = jax.random.uniform(ky, minval=self.command_y_range[0],
                                maxval=self.command_y_range[1])
        cyaw = jax.random.uniform(kw, minval=self.command_yaw_range[0],
                                  maxval=self.command_yaw_range[1])
        keep = jnp.linalg.norm(jnp.stack([cx, cy])) > 0.25
        return jnp.stack([cx * keep, cy * keep, 0.0, cyaw])

    def _reset_at(self, rng, level, ttype):
        m = self.model
        k1, k2, k3 = jax.random.split(rng, 3)
        origin = self._origins[level, ttype]
        offset = jax.random.uniform(k1, (2,), minval=-0.5, maxval=0.5)
        q = m.default_q
        q = q.at[0:2].set(origin[0:2] + offset)
        q = q.at[2].set(origin[2] + 0.62)
        qd = jnp.zeros(m.nv)
        carry = self.initial_carry()
        carry["commands"] = self._sample_commands(k2)
        carry["noise_key"] = k3
        carry["level"] = level
        carry["ttype"] = ttype
        carry["origin"] = origin
        return q, qd, carry

    def _fresh_state(self, q, qd, carry, rng):
        phys = self.engine.init_state(q, qd)
        obs, states, carry = self.observe(phys, carry, jnp.zeros(12))
        return EnvState(
            phys=phys, carry=carry, obs=obs, states=states,
            reward=jnp.zeros(()), done=jnp.zeros((), bool),
            timeout=jnp.zeros((), bool),
            progress=jnp.zeros((), jnp.int32), rng=rng,
            metrics=self.initial_metrics(),
        )

    def reset(self, rng):
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        level = jax.random.randint(k1, (), 0, self.max_init_level + 1)
        ttype = jax.random.randint(k2, (), 0, self.terrain.env_cols)
        q, qd, carry = self._reset_at(k3, level, ttype)
        return self._fresh_state(q, qd, carry, rng)

    # -- base-pipeline hooks (the step itself is RLTask.step) ----------
    def resample_reset(self, key, es):
        """Curriculum-aware respawn: walked distance vs command promotes or
        demotes the terrain level (reference update_terrain_level
        :203-209, 289-298); the terrain column is kept."""
        carry = es.carry
        distance = jnp.linalg.norm(es.phys.q[0:2] - carry["origin"][0:2])
        cmd_norm = jnp.linalg.norm(carry["commands"][0:2])
        level = carry["level"]
        if self.curriculum:
            level = level - (
                distance < cmd_norm * self.max_episode_length_s * 0.25
            ).astype(jnp.int32)
            level = level + (distance > self.terrain.env_length / 2).astype(
                jnp.int32
            )
            level = jnp.clip(level, 0) % self.terrain.env_rows
        q, qd, carry = self._reset_at(key, level, es.carry["ttype"])
        return self._fresh_state(q, qd, carry, jax.random.fold_in(key, 99))

    def pre_physics(self, es, key):
        """Random robot pushes every push_interval steps (reference
        :327-328, :355-357) + per-step observation-noise key."""
        push = (es.progress % self.push_interval) == (self.push_interval - 1)
        quat = es.phys.q[3:7]
        v_world = rot.quat_rotate(quat, es.phys.qd[3:6])
        push_v = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0)
        v_world = v_world.at[0:2].set(jnp.where(push, push_v, v_world[0:2]))
        qd = es.phys.qd.at[3:6].set(rot.quat_rotate_inverse(quat, v_world))
        es.carry["noise_key"] = jax.random.fold_in(key, 3)
        return es.replace(phys=es.phys.replace(qd=qd))

    def control(self, action, es):
        """Position targets for the in-model PD drives (reference explicit
        PD torque loop :309-316 — here the drive law lives in the model and
        the engine re-evaluates it every substep; eligible scenes run the
        whole control step in one fused kernel)."""
        targets = self.action_scale * action + self.default_dof_pos
        es.carry["targets"] = targets
        return self.engine.default_control().replace(pos_target=targets)

    # ------------------------------------------------------------------
    def observe(self, phys, carry, action):
        m = self.model
        quat = phys.q[3:7]
        base_lin_vel = rot.quat_rotate_inverse(quat, phys.body_lvel[0])
        base_ang_vel = rot.quat_rotate_inverse(quat, phys.body_avel[0])
        projected_gravity = rot.quat_rotate_inverse(
            quat, jnp.array([0.0, 0.0, -1.0])
        )
        dof_pos = phys.q[m.jq_idx]
        dof_vel = phys.qd[m.jv_idx]
        # heading-based yaw command from the POST-step pose (reference
        # :334-336)
        forward = rot.quat_rotate(quat, jnp.array([1.0, 0.0, 0.0]))
        heading = jnp.arctan2(forward[1], forward[0])
        cmds = carry["commands"]
        cmds = cmds.at[2].set(
            jnp.clip(0.5 * _wrap_to_pi(cmds[3] - heading), -1.0, 1.0)
        )
        carry["commands"] = cmds
        # applied PD torque re-evaluated at the post-step state (feeds the
        # torque penalty, reference :389)
        h = self.sim_dt / self.engine.params.substeps
        carry["torques"] = jnp.clip(
            self.Kp * (carry["targets"] - dof_pos - h * dof_vel)
            - self.Kd * dof_vel,
            -80.0, 80.0,
        )
        # yaw-only rotation of the scan grid (reference quat_apply_yaw)
        qy = quat * jnp.array([1.0, 0.0, 0.0, 1.0])
        qy = rot.quat_normalize(qy)
        pts = rot.quat_rotate(
            jnp.broadcast_to(qy, (self.num_height_points, 4)),
            self._height_points,
        ) + phys.q[0:3]
        measured = self._sample_height(pts[:, 0], pts[:, 1])
        heights = (
            jnp.clip(phys.q[2] - 0.5 - measured, -1.0, 1.0)
            * self.height_meas_scale
        )
        cmd_scale = jnp.array(
            [self.lin_vel_scale, self.lin_vel_scale, self.ang_vel_scale]
        )
        obs = jnp.concatenate(
            [
                base_lin_vel * self.lin_vel_scale,
                base_ang_vel * self.ang_vel_scale,
                projected_gravity,
                carry["commands"][0:3] * cmd_scale,
                dof_pos * self.dof_pos_scale,
                dof_vel * self.dof_vel_scale,
                heights,
                action,
            ]
        )
        if self.add_noise:
            # per-step uniform noise vector (reference :158-170, applied in
            # get_observations)
            noise = (
                2.0 * jax.random.uniform(carry["noise_key"], (188,)) - 1.0
            ) * self.noise_vec
            obs = obs + noise
        return obs, jnp.zeros(0), carry

    def reward_done(self, obs, action, phys, carry, progress):
        m = self.model
        quat = phys.q[3:7]
        base_lin_vel = rot.quat_rotate_inverse(quat, phys.body_lvel[0])
        base_ang_vel = rot.quat_rotate_inverse(quat, phys.body_avel[0])
        projected_gravity = rot.quat_rotate_inverse(
            quat, jnp.array([0.0, 0.0, -1.0])
        )
        dof_pos = phys.q[m.jq_idx]
        dof_vel = phys.qd[m.jv_idx]
        cmds = carry["commands"]

        # termination (reference check_termination :359-367)
        ground_base = self._sample_height(phys.q[0], phys.q[1])
        base_fallen = (phys.q[2] - ground_base) < self.base_threshold
        knee_pos = phys.body_pos[self._knee_bodies]
        ground_knee = self._sample_height(knee_pos[:, 0], knee_pos[:, 1])
        knees_fallen = jnp.any(
            (knee_pos[:, 2] - ground_knee) < self.knee_threshold
        )
        has_fallen = base_fallen | knees_fallen
        timeout = progress >= self.max_episode_length - 1
        done = has_fallen | timeout

        rs = self.rew_scales
        lin_vel_error = jnp.sum(jnp.square(cmds[0:2] - base_lin_vel[0:2]))
        ang_vel_error = jnp.square(cmds[2] - base_ang_vel[2])
        terms = {
            "lin_vel_xy": jnp.exp(-lin_vel_error / 0.25) * rs["lin_vel_xy"],
            "ang_vel_z": jnp.exp(-ang_vel_error / 0.25) * rs["ang_vel_z"],
            "lin_vel_z": jnp.square(base_lin_vel[2]) * rs["lin_vel_z"],
            "ang_vel_xy": jnp.sum(jnp.square(base_ang_vel[0:2])) * rs["ang_vel_xy"],
            "orient": jnp.sum(jnp.square(projected_gravity[0:2])) * rs["orient"],
            "base_height": jnp.square(phys.q[2] - 0.52) * rs["base_height"],
            "torques": jnp.sum(jnp.square(carry["torques"])) * rs["torques"],
            "joint_acc": jnp.sum(jnp.square(carry["last_dof_vel"] - dof_vel)) * rs["joint_acc"],
            "action_rate": jnp.sum(jnp.square(carry["last_actions"] - action)) * rs["action_rate"],
            "hip": jnp.sum(jnp.abs(dof_pos[0:4] - self.default_dof_pos[0:4])) * rs["hip"],
        }
        reward = jnp.clip(sum(terms.values()), 0.0, None)
        reward = reward + has_fallen * rs["fallen_over"] * self.dt
        reward = reward + rs["termination"] * (done & ~timeout)

        sums = {
            k: carry["episode_sums"][k] + terms[k] for k in _REW_KEYS
        }
        carry = dict(
            carry, last_actions=action, last_dof_vel=dof_vel,
            episode_sums=sums,
        )
        metrics = {
            "episode/rew_" + k: sums[k] / self.max_episode_length_s
            for k in _REW_KEYS
        }
        metrics["episode/terrain_level"] = carry["level"].astype(jnp.float32)
        return reward, done, carry, metrics
