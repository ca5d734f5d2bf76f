"""Shared CLI plumbing for the entry scripts (reference scripts/*)."""

from __future__ import annotations

import os
import sys

import jax

from omniisaacgymenvs_tpu.envs import VecEnv
from omniisaacgymenvs_tpu.parallel.mesh import env_mesh
from omniisaacgymenvs_tpu.tasks import get_task
from omniisaacgymenvs_tpu.utils.config import load_config, parse_cli


def build_env_from_cli(argv=None):
    """Parse CLI overrides, build (cfg, task, env). Mirrors the reference
    boot path parse_hydra_configs -> initialize_task
    (scripts/rlgames_train.py:87-104, utils/task_util.py:30-72).

    `pipeline=cpu` forces the CPU backend (reference cfg/config.yaml:19-27
    pipeline/sim_device semantics; default is the TPU platform)."""
    overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    # multi-host: distributed=True (or a set JAX_COORDINATOR_ADDRESS) runs
    # jax.distributed.initialize() so the ('env',) mesh spans all hosts'
    # devices over ICI/DCN (SURVEY.md §2.4 — the reference has no multi-GPU
    # path at all; here env-axis GSPMD subsumes it)
    if overrides.pop("distributed", False) or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
    pipeline = str(overrides.pop("pipeline", "tpu")).lower()
    if pipeline == "cpu":
        jax.config.update("jax_platforms", "cpu")
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_oige_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    cfg = load_config(overrides)
    task = get_task(cfg["task_name"], cfg["task"])
    num_envs = cfg["task"].get("env", {}).get("numEnvs", 512)
    mesh = env_mesh() if len(jax.devices()) > 1 else None
    env = VecEnv(task, num_envs, mesh=mesh)
    return cfg, task, env
