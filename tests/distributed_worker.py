"""Multi-process worker for tests/test_distributed.py.

Each process: jax.distributed.initialize (CPU, 4 virtual devices), build
the GLOBAL ('env',) mesh over all 8 devices, construct Cartpole VecEnv +
PPOTrainer, run N epochs, print the final metrics as one JSON line.

Usage: python tests/distributed_worker.py <coordinator> <num_procs> <pid>
"""

import json
import os
import sys


def main():
    coordinator, num_procs, pid = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
    )
    assert jax.device_count() == 4 * num_procs
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp  # noqa: F401

    from omniisaacgymenvs_tpu.envs import VecEnv
    from omniisaacgymenvs_tpu.learn import PPOConfig, PPOTrainer
    from omniisaacgymenvs_tpu.parallel.mesh import env_mesh
    from omniisaacgymenvs_tpu.tasks import get_task

    mesh = env_mesh()
    env = VecEnv(get_task("Cartpole"), 32, mesh=mesh)
    cfg = PPOConfig(
        horizon_length=8, minibatch_size=64, mini_epochs=2,
        reward_shaper_scale=0.1, units=(16, 16),
    )
    tr = PPOTrainer(env, cfg, seed=7)
    out = None
    for _ in range(3):
        tr.state, m = tr._epoch_jit(tr.state)
        out = {k: float(v) for k, v in m.items()}
    print("RESULT " + json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
