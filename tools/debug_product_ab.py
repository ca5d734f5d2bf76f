"""Product-level A/B: VecEnv rollout with fused kernel vs XLA path on TPU.

Runs the real task pipeline (reset, step with zero actions, auto-reset) for
n control steps and reports cumulative resets and the object's z trajectory.
Set OIGE_TPU_FUSED via the `mode` arg per run: this script execs itself
twice (fused / xla) and diffs the summaries.

Usage: python scripts/debug_product_ab.py ShadowHand [steps] [N] [mode]
  mode: "both" (default, runs subprocesses), "fused", "xla"
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)


import json
import os
import subprocess
import sys


def run_one(name, steps, N, mode):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omniisaacgymenvs_tpu.envs.vec_env import VecEnv
    from omniisaacgymenvs_tpu.tasks import get_task
    from omniisaacgymenvs_tpu.utils.config import load_config

    cfg = load_config({"task": name})
    task = get_task(name, cfg["task"])
    env = VecEnv(task, N)
    fused_on = getattr(task.engine, "_fused_cv", None) is not None
    es = env.reset(seed=0)
    acts = jnp.zeros((N, env.num_actions))
    resets = 0
    zs = []
    try:
        qa = task.model.root_q_adr("object")
    except Exception:
        qa = None
    for t in range(steps):
        es = env.step(es, acts)
        resets += int(np.asarray(es.done).sum())
        if qa is not None:
            zs.append(float(jnp.mean(es.phys.q[:, qa + 2])))
    out = {
        "mode": mode, "fused_active": fused_on, "resets": resets,
        "steps": steps, "N": N,
        "z_first5": [round(z, 4) for z in zs[:5]],
        "z_last5": [round(z, 4) for z in zs[-5:]],
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "ShadowHand"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    mode = sys.argv[4] if len(sys.argv) > 4 else "both"
    if mode in ("fused", "xla"):
        os.environ["OIGE_TPU_FUSED"] = "1" if mode == "fused" else "0"
        run_one(name, steps, N, mode)
    else:
        for m in ("xla", "fused"):
            env = dict(os.environ, OIGE_TPU_FUSED="1" if m == "fused" else "0")
            r = subprocess.run(
                [sys.executable, __file__, name, str(steps), str(N), m],
                env=env, capture_output=True, text=True, timeout=1800,
            )
            for line in r.stdout.splitlines():
                if line.startswith("RESULT"):
                    print(line)
            if r.returncode != 0:
                print(f"{m} FAILED rc={r.returncode}")
                print(r.stderr[-2000:])
