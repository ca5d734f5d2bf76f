"""Benchmark: Humanoid simulation throughput (env-steps/s) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); Isaac-Gym-class
systems report ~100k-600k Humanoid env-steps/s on one A100-class GPU
(SURVEY.md §6). vs_baseline is computed against the top of that range
(600k env-steps/s single-device).

Env vars: BENCH_TASK (default Humanoid), BENCH_NUM_ENVS (default 32768 —
the single-v5e-chip throughput peak from the batch sweep in
docs/performance.md; 8192 also exceeds the 10M target), BENCH_STEPS
(default 256 — long enough to amortize the fixed ~25 ms per-dispatch
overhead of the tunneled TPU runtime; training jits whole epochs, so the
amortized number is the representative one).
"""

import json
import os
import sys
import time


def main():
    task_name = os.environ.get("BENCH_TASK", "Humanoid")
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "32768"))
    steps = int(os.environ.get("BENCH_STEPS", "256"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_oige_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from omniisaacgymenvs_tpu.envs import VecEnv
    from omniisaacgymenvs_tpu.parallel.mesh import env_mesh
    from omniisaacgymenvs_tpu.tasks import get_task

    devices = jax.devices()
    mesh = env_mesh() if len(devices) > 1 else None
    task = get_task(task_name)
    env = VecEnv(task, num_envs, mesh=mesh)

    es = env.reset(seed=0)

    def policy(obs, key):
        return jax.random.uniform(
            key, (obs.shape[0], env.num_actions), minval=-1.0, maxval=1.0
        )

    rollout = jax.jit(
        lambda es, rng: env.rollout(es, policy, steps, rng)[0],
        donate_argnums=0,
    )

    # warm-up / compile (es is donated: always carry the fresh result)
    t0 = time.time()
    es = rollout(es, jax.random.PRNGKey(0))
    jax.block_until_ready(es.obs)
    compile_s = time.time() - t0

    # timed runs
    best = 0.0
    for i in range(3):
        t0 = time.time()
        es = rollout(es, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(es.obs)
        dt = time.time() - t0
        best = max(best, num_envs * steps / dt)

    baseline = 600_000.0  # high-end single-GPU Isaac-class Humanoid steps/s
    print(
        json.dumps(
            {
                "metric": f"{task_name.lower()}_env_steps_per_s",
                "value": round(best, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(best / baseline, 3),
            }
        )
    )
    print(
        f"# device={devices[0].device_kind} x{len(devices)} num_envs={num_envs} "
        f"steps={steps} compile={compile_s:.1f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
