"""BallBalance: ball-tray pair contact behavior and task contract."""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import get_task


def test_dims():
    task = get_task("BallBalance")
    assert task.num_obs == 24 and task.num_actions == 3
    env = VecEnv(task, 4)
    es = env.reset(seed=0)
    assert es.obs.shape == (4, 24)


def test_ball_lands_on_tray():
    """A ball dropped near center must be caught by the level tray (pair
    contact) and settle around z ~ 0.68-0.7 instead of falling through."""
    task = get_task("BallBalance")
    env = VecEnv(task, 8)
    es = env.reset(seed=2)
    caught = 0
    for _ in range(150):  # 3 s at 50 Hz control
        es = env.step(es, jnp.zeros((8, 3)))
    qa = task._ball_q
    z = np.asarray(es.phys.q[:, qa + 2])
    # some balls bounce out (they spawn with sideways velocity); at least
    # some must be resting on the tray, and none may be INSIDE the tray
    on_tray = (z > 0.6) & (z < 0.85)
    assert on_tray.sum() >= 3, z
    assert np.all(np.isfinite(np.asarray(es.obs)))


def test_tilting_tray_moves_ball():
    """Commanding a tilt accelerates a centered ball sideways."""
    task = get_task("BallBalance")
    env = VecEnv(task, 4)
    es = env.reset(seed=0)
    # settle the ball first
    for _ in range(100):
        es = env.step(es, jnp.zeros((4, 3)))
    # tilt tray about +y -> ball should roll in -x or +x consistently
    a = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    for _ in range(30):
        es = env.step(es, a)
    qa = task._ball_q
    x = np.asarray(es.phys.q[:, qa])
    on = np.asarray(es.phys.q[:, qa + 2]) > 0.4
    if on.sum():
        assert np.any(np.abs(x[on]) > 0.02)


def test_franka_props_rest_in_drawer():
    """numProps clutter cubes must rest stably on the drawer tray
    (reference tasks/franka_cabinet.py get_props)."""
    from omniisaacgymenvs_tpu.tasks import get_task as _gt

    task = _gt("FrankaCabinet", {"env": {"numProps": 2}})
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    for _ in range(60):
        es = env.step(es, jnp.zeros((2, 9)))
    for i in range(2):
        qa = task.model.root_q_adr(f"prop_{i}")
        z = float(es.phys.q[0, qa + 2])
        assert 0.65 < z < 0.78, z
