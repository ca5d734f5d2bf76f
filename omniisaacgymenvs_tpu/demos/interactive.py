"""Interactive terminal demo: drive a trained Anymal with the keyboard.

Reference: demos/anymal_terrain.py (:44-183) — an Omniverse Kit demo with
keyboard robot control and a follow camera. The Kit viewport cannot be
ported; this is the TPU-framework equivalent for a terminal: WASD sets
the velocity command fed to the policy each control step, and an ANSI
top-down map (robot trail, heading arrow, telemetry) is redrawn in place,
so the robot is actually driven live rather than scripted.

Keys: w/s forward/backward, a/d yaw left/right, x stop, q quit.

Usage:
    python -m omniisaacgymenvs_tpu.demos.interactive \
        [task=Anymal|AnymalTerrain] [checkpoint=runs/Anymal/nn/best] \
        [pipeline=cpu] [steps=2000]

`selftest=1` replays a fixed key script without a tty (used by tests and
headless smoke runs).
"""

from __future__ import annotations

import select
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
from omniisaacgymenvs_tpu.scripts.common import build_env_from_cli
from omniisaacgymenvs_tpu.utils.config import parse_cli, ppo_config_kwargs

W, H = 49, 21                    # map cells (odd: robot-centered)
SCALE = 0.35                     # metres per cell
HEADING = "→↗↑↖←↙↓↘"             # arrow per 45° of yaw


class _RawKeys:
    """Nonblocking single-key reads from a raw tty."""

    def __enter__(self):
        import termios
        import tty

        self.fd = sys.stdin.fileno()
        self.saved = termios.tcgetattr(self.fd)
        tty.setcbreak(self.fd)
        return self

    def __exit__(self, *exc):
        import termios

        termios.tcsetattr(self.fd, termios.TCSADRAIN, self.saved)

    def poll(self):
        keys = []
        while select.select([sys.stdin], [], [], 0)[0]:
            keys.append(sys.stdin.read(1))
        return keys


def _draw(base_xy, yaw, trail, cmd, height, vel, step_i, hz):
    grid = [[" "] * W for _ in range(H)]
    cx, cy = W // 2, H // 2
    for tx, ty in trail:
        dx = int(round((tx - base_xy[0]) / SCALE))
        dy = int(round((ty - base_xy[1]) / SCALE))
        if abs(dx) < cx and abs(dy) < cy:
            grid[cy - dy][cx + dx] = "·"
    grid[cy][cx] = HEADING[int(((yaw + np.pi / 8) % (2 * np.pi)) // (np.pi / 4)) % 8]
    border = "+" + "-" * W + "+"
    rows = [border] + ["|" + "".join(r) + "|" for r in grid] + [border]
    status = (
        f" cmd vx={cmd[0]:+.1f} yaw={cmd[2]:+.1f} | "
        f"h={height:.2f} m  v={vel:.2f} m/s | step {step_i} @ {hz:.0f} Hz "
        f"| w/s a/d x q"
    )
    sys.stdout.write("\x1b[H\x1b[J" + "\n".join(rows) + "\n" + status + "\n")
    sys.stdout.flush()


def main(argv=None):
    overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    selftest = bool(int(overrides.pop("selftest", 0)))
    max_steps = int(overrides.pop("steps", 2000))
    overrides.setdefault("task", "Anymal")
    overrides.setdefault("num_envs", 1)
    cfg, task, env = build_env_from_cli(
        [f"{k}={v}" for k, v in overrides.items()]
    )
    trainer = PPOTrainer(
        env, PPOConfig(**ppo_config_kwargs(cfg["train"])), seed=42
    )
    if cfg.get("checkpoint"):
        trainer.load(cfg["checkpoint"])
    ts = trainer.state
    es = env.reset(seed=0)

    @jax.jit
    def step(es, command):
        carry = dict(es.carry)
        if "commands" in carry:   # keyboard overrides the command sampler
            w = carry["commands"].shape[1]
            if w == 4:            # AnymalTerrain: [vx, vy, yaw_rate(computed
                full = jnp.concatenate(  # from heading), yaw/heading target]
                    [command[:2], jnp.zeros(1), command[2:3]]
                )
            else:                 # Anymal: [vx, vy, yaw_rate]
                full = command[:w]
            carry["commands"] = jnp.broadcast_to(full, carry["commands"].shape)
        es = es.replace(carry=carry)
        mu, *_ = trainer._policy(ts.params, ts, es.obs, es.states, ())
        return env._step_fn(es, jnp.clip(mu, -1, 1))

    cmd = np.zeros(3, np.float32)
    trail: list = []
    script = iter(
        [("w", 40), ("a", 40), ("w", 40), ("d", 40), ("x", 40)]
        if selftest else []
    )
    pending = next(script, None)
    t0 = time.time()
    with (_RawKeys() if not selftest else _NoTty()) as keys:
        for i in range(max_steps):
            if selftest:
                if pending is None:
                    break
                k, left = pending
                pressed = [k]
                pending = (k, left - 1) if left > 1 else next(script, None)
            else:
                pressed = keys.poll()
            for k in pressed:
                if k == "w":
                    cmd[0] = min(1.0, cmd[0] + 0.1)
                elif k == "s":
                    cmd[0] = max(-1.0, cmd[0] - 0.1)
                elif k == "a":
                    cmd[2] = min(1.0, cmd[2] + 0.1)
                elif k == "d":
                    cmd[2] = max(-1.0, cmd[2] - 0.1)
                elif k == "x":
                    cmd[:] = 0.0
                elif k == "q":
                    return
            es = step(es, jnp.asarray(cmd))
            q = np.asarray(es.phys.q[0])
            quat = np.asarray(es.phys.body_quat[0, 0])
            # yaw from base quaternion (wxyz)
            yaw = np.arctan2(
                2 * (quat[0] * quat[3] + quat[1] * quat[2]),
                1 - 2 * (quat[2] ** 2 + quat[3] ** 2),
            )
            trail.append((float(q[0]), float(q[1])))
            trail = trail[-400:]
            if i % 2 == 0 and not selftest:
                vel = float(np.linalg.norm(np.asarray(es.phys.body_lvel[0, 0, :2])))
                _draw(q[:2], yaw, trail, cmd, float(q[2]), vel, i,
                      (i + 1) / (time.time() - t0))
    if selftest:
        d = float(np.linalg.norm(np.asarray(trail[-1]) - np.asarray(trail[0])))
        print(f"selftest ok: {len(trail)} steps, displacement {d:.2f} m")


class _NoTty:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass

    def poll(self):
        return []


if __name__ == "__main__":
    main()
