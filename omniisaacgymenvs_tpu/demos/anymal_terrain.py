"""AnymalTerrain demo: scripted command sequences over rough terrain.

Reference: demos/anymal_terrain.py — an interactive Omniverse demo
(keyboard robot control, camera follow, click-to-select) subclassing
AnymalTerrainTask and overriding post_physics_step (:143-183). The
viewport/keyboard parts are Kit-only and deliberately not ported
(SURVEY.md §7.4); this headless stand-in drives one robot through a
scripted velocity-command sequence (the demo's W/A/S/D bindings) and
records the trajectory to .npz for offline viewing.

Usage:
    python -m omniisaacgymenvs_tpu.demos.anymal_terrain \
        [checkpoint=runs/AnymalTerrain/nn/best] [out=anymal_demo.npz]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.config import (
    load_config,
    parse_cli,
    ppo_config_kwargs,
)

# the reference demo's key bindings as a timed command script:
# (seconds, [vx, vy, yaw_rate]) — forward, turn left, forward, turn right...
COMMAND_SCRIPT = [
    (3.0, [1.0, 0.0, 0.0]),    # UP: forward
    (2.0, [0.0, 0.0, 1.0]),    # LEFT: spin left
    (3.0, [1.0, 0.0, 0.0]),
    (2.0, [0.0, 0.0, -1.0]),   # RIGHT: spin right
    (2.0, [-1.0, 0.0, 0.0]),   # DOWN: backward
    (2.0, [0.0, 0.0, 0.0]),    # stop
]


def main(argv=None):
    overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    out = overrides.pop("out", "anymal_demo.npz")
    overrides["task"] = "AnymalTerrain"
    cfg = load_config(overrides)
    task = get_task("AnymalTerrain", cfg["task"])
    env = VecEnv(task, 4)
    trainer = PPOTrainer(
        env, PPOConfig(**ppo_config_kwargs(cfg["train"])), seed=42
    )
    if cfg.get("checkpoint"):
        trainer.load(cfg["checkpoint"])
        print(f"loaded {cfg['checkpoint']}")
    ts = trainer.state
    es = env.reset(seed=0)

    @jax.jit
    def step(es, command):
        # pin the scripted command into every env's carry (the demo's
        # keyboard override of self.commands)
        carry = dict(es.carry)
        cmds = jnp.broadcast_to(
            jnp.concatenate([command[:2], jnp.zeros(1), command[2:3]]),
            (env.num_envs, 4),
        )
        carry["commands"] = cmds
        es = es.replace(carry=carry)
        mu, *_ = trainer._policy(ts.params, ts, es.obs, es.states, ())
        return env._step_fn(es, jnp.clip(mu, -1, 1))

    dt = task.dt
    traj, commands = [], []
    for seconds, cmd in COMMAND_SCRIPT:
        command = jnp.asarray(cmd, jnp.float32)
        for _ in range(int(seconds / dt)):
            es = step(es, command)
            traj.append(np.asarray(es.phys.q[0]))
            commands.append(cmd)
    traj = np.stack(traj)
    np.savez(out, q=traj, commands=np.asarray(commands),
             dof_names=np.asarray(task.model.dof_names))
    d = np.linalg.norm(traj[-1, 0:2] - traj[0, 0:2])
    print(
        f"demo: {len(traj)} steps recorded to {out}; net base displacement "
        f"{d:.2f} m, final height {traj[-1, 2]:.2f} m"
    )


if __name__ == "__main__":
    main()
