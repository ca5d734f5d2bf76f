"""AllegroHand scene-authoring lab.

Sweeps cradle-scene variants (hand tilt, thumb rest pose, finger curl,
cube spawn) and scores each on the three properties a learnable
reorientation scene needs (docs/release_notes.md round-3 forensics):

  1. static retention   — default-pose PD hold: cube must stay put.
  2. flail survival     — uniform-random actions: median steps before the
                          cube falls (early-PPO exploration proxy).
  3. rotation authority — scripted finger/thumb waves: mean |cube angvel|
                          achieved without dropping it.

Usage: python tools/allegro_scene_lab.py [N_ENVS]
Prints one line per variant; pick max (survival, authority) jointly.
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.physics import rotations as rot
from omniisaacgymenvs_tpu.tasks import get_task


def run_variant(scene, n_envs=256, steps=150, seed=0):
    task = get_task("AllegroHand", {"env": {"scene": scene}})
    env = VecEnv(task, n_envs)
    m = task.model
    lo = np.asarray(m.dof_limit_lower)
    hi = np.asarray(m.dof_limit_upper)
    default = np.asarray(m.default_q)[np.asarray(m.jq_idx)]
    # action that maps to the default pose under absolute position control
    a_hold = jnp.asarray(np.clip(rot.unscale(default, lo, hi), -1, 1),
                         jnp.float32)

    def rollout(es, act_fn, steps, rng):
        first_done = np.full(n_envs, steps, np.int32)
        avel_sum = 0.0
        for t in range(steps):
            rng, k = jax.random.split(rng)
            es = env.step(es, act_fn(t, k))
            done = np.asarray(es.done)
            first_done = np.where((first_done == steps) & done, t, first_done)
            avel = np.asarray(es.phys.body_avel[:, task._obj_body])
            avel_sum += float(np.mean(np.linalg.norm(avel, axis=-1)))
        return first_done, avel_sum / steps

    rng = jax.random.PRNGKey(seed)

    # 1) static retention: hold default pose 120 steps
    es = env.reset(seed=seed)
    hold = jnp.tile(a_hold, (n_envs, 1))
    fd, _ = rollout(es, lambda t, k: hold, 120, rng)
    static_alive = float(np.mean(fd == 120))

    # 2) flail survival: uniform random actions
    es = env.reset(seed=seed + 1)
    fd, _ = rollout(
        es,
        lambda t, k: jax.random.uniform(
            k, (n_envs, task.num_actions), minval=-1.0, maxval=1.0),
        steps, rng)
    flail_median = float(np.median(fd))
    flail_alive = float(np.mean(fd == steps))

    # 3) authority: sinusoidal waves about the hold pose (phase-staggered
    # across fingers so the cube gets pushed around, not squeezed)
    phases = jnp.arange(task.num_actions) * 0.7

    def wave(t, k):
        a = a_hold + 0.6 * jnp.sin(0.15 * t + phases)
        return jnp.tile(jnp.clip(a, -1, 1), (n_envs, 1))

    es = env.reset(seed=seed + 2)
    fd, avel = rollout(es, wave, steps, rng)
    wave_alive = float(np.mean(fd == steps))
    return dict(static=static_alive, flail_med=flail_median,
                flail_alive=flail_alive, wave_alive=wave_alive,
                wave_avel=avel)


def main():
    n_envs = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256
    variants = []
    # current shipped scene (round-3 palm-flat, thumb crossed)
    variants.append(("r3-flat-crossed", dict(
        tilt=(0.0, 0.0), thumb_abduct=0.8, thumb_flex=(0.0, 0.0, 0.0),
        finger_curl=(0.0, 0.0, 0.0), object_local=(0.0, 0.0, 0.06))))
    for pitch, th_ab, th_f1, curl in itertools.product(
            (0.3, 0.45, 0.6), (0.3, 0.6), (0.8, 1.1), (0.2, 0.45)):
        variants.append((
            f"p{pitch}-ta{th_ab}-tf{th_f1}-c{curl}",
            dict(tilt=(0.0, pitch), thumb_abduct=th_ab,
                 thumb_flex=(th_f1, 0.3, 0.3),
                 finger_curl=(curl, curl + 0.1, 0.2),
                 object_local=(0.018, 0.028, 0.062)),
        ))
    print(f"{'variant':28s} {'static':>6s} {'flailM':>6s} {'flailA':>6s} "
          f"{'waveA':>6s} {'avel':>6s}  s")
    for name, scene in variants:
        t0 = time.time()
        try:
            r = run_variant(scene, n_envs=n_envs)
        except Exception as e:  # noqa: BLE001 — lab sweep, report and move on
            print(f"{name:28s} FAILED: {e}")
            continue
        print(f"{name:28s} {r['static']:6.2f} {r['flail_med']:6.0f} "
              f"{r['flail_alive']:6.2f} {r['wave_alive']:6.2f} "
              f"{r['wave_avel']:6.2f}  {time.time() - t0:.0f}")


if __name__ == "__main__":
    main()
