"""Terrain generation + AnymalTerrain task tests."""

import jax
import jax.numpy as jnp
import numpy as np

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.terrain import (
    SubTerrain,
    Terrain,
    pyramid_sloped_terrain,
    pyramid_stairs_terrain,
    random_uniform_terrain,
)


def test_subterrain_generators():
    t = SubTerrain(80, 80, 0.005, 0.1)
    random_uniform_terrain(t, -0.05, 0.05, rng=np.random.default_rng(0))
    assert t.height_field_raw.std() > 0
    t2 = SubTerrain(80, 80, 0.005, 0.1)
    pyramid_stairs_terrain(t2, 0.31, 0.1, platform_size=3.0)
    assert t2.height_field_raw.max() > 0
    t3 = SubTerrain(80, 80, 0.005, 0.1)
    pyramid_sloped_terrain(t3, 0.3, platform_size=3.0)
    assert t3.height_field_raw.max() > 0


def test_terrain_grid():
    terr = Terrain(dict(numLevels=3, numTerrains=4, mapLength=4.0,
                        mapWidth=4.0, borderSize=4.0))
    assert terr.env_origins.shape == (3, 4, 3)
    assert terr.height_field_raw.shape[0] == 3 * 40 + 2 * 40


def test_anymal_terrain_task():
    task = get_task("AnymalTerrain", {
        "env": {"terrain": {"numLevels": 3, "numTerrains": 4,
                            "mapLength": 4.0, "mapWidth": 4.0,
                            "borderSize": 4.0}}})
    env = VecEnv(task, 4)
    es = env.reset(seed=0)
    assert es.obs.shape == (4, 188)
    for _ in range(20):
        es = env.step(es, jnp.zeros((4, 12)))
    assert np.all(np.isfinite(np.asarray(es.obs)))
    # robots stay above their local terrain
    h = task._sample_height(es.phys.q[:, 0], es.phys.q[:, 1])
    clearance = np.asarray(es.phys.q[:, 2] - h)
    assert np.all(clearance > 0.2), clearance
    assert "episode/rew_lin_vel_xy" in es.metrics
    assert "episode/terrain_level" in es.metrics


def test_anymal_terrain_termination_and_reset():
    task = get_task("AnymalTerrain", {
        "env": {"terrain": {"numLevels": 2, "numTerrains": 2,
                            "mapLength": 4.0, "mapWidth": 4.0,
                            "borderSize": 4.0}}})
    env = VecEnv(task, 2)
    es = env.reset(seed=0)
    # drop the base to the ground -> knee/base termination
    q = es.phys.q.at[:, 2].add(-0.5)
    es = es.replace(phys=es.phys.replace(q=q))
    es = env.step(es, jnp.zeros((2, 12)))
    assert np.all(np.asarray(es.done))
    es = env.step(es, jnp.zeros((2, 12)))
    h = task._sample_height(es.phys.q[:, 0], es.phys.q[:, 1])
    assert np.all(np.asarray(es.phys.q[:, 2] - h) > 0.4)


def test_contact_planes_slope_limited():
    """Contact planes use raw cell heights with slope-limited gradients:
    stair risers must read as FLAT treads (gradient zeroed where the
    cell-to-cell jump exceeds 0.75*horizontal_scale — the reference's
    slope-corrected trimesh walls), while gentle slopes keep their
    gradient. Round-2 curriculum plateau regression."""
    task = get_task("AnymalTerrain", {
        "env": {"terrain": {"numLevels": 3, "numTerrains": 4,
                            "mapLength": 4.0, "mapWidth": 4.0,
                            "borderSize": 4.0}}})
    hf = np.asarray(task._hf)[:-1, :-1]
    grad = np.asarray(task._hf_grad).reshape(hf.shape[0], hf.shape[1], 3)
    hs = task._hs
    lim = 0.75 * hs
    # raw forward differences
    dx = np.concatenate([hf[1:], hf[-1:]], axis=0) - hf
    dy = np.concatenate([hf[:, 1:], hf[:, -1:]], axis=1) - hf
    # a stairs grid must actually contain super-threshold jumps
    steep = np.abs(dx) > lim
    assert steep.any(), "test terrain has no risers - broaden the config"
    # risers flattened, gentle slopes preserved, heights raw
    np.testing.assert_allclose(grad[..., 0], hf, atol=1e-6)
    np.testing.assert_allclose(
        grad[..., 1] - grad[..., 0], np.where(np.abs(dx) > lim, 0.0, dx),
        atol=1e-6)
    np.testing.assert_allclose(
        grad[..., 2] - grad[..., 0], np.where(np.abs(dy) > lim, 0.0, dy),
        atol=1e-6)
