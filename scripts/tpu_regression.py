"""Real-TPU regression checks (run on the bench chip, ~5 min).

Round-2 lesson: the fused kernel's pair-contact path diverged ONLY on real
TPU hardware (approximate-sqrt branch flip) while every CPU interpret-mode
test passed. This script runs the checks that would have caught it, on the
actual chip, and prints ONE JSON line {"ok": bool, "checks": {...}}.

Checks:
  sqrt_branch   – the literal failure mode: interior box point must
                  classify as inside (zero d_out) under TPU sqrt rounding.
  pair_rest     – mini point-in-box scene at rest: fused vs XLA z drift.
  pair_rest_interior – same scene, point starting INSIDE the box: the
                  interior branch through the real kernel on-chip.
  shadowhand    – 40-step product rollout on the fused path: reset rate
                  must stay near the XLA path's (fall-through = ~10x more).
  ballbalance   – 40-step product rollout completes (r2 hang regression).

Usage: python scripts/tpu_regression.py                    # all checks
       python scripts/tpu_regression.py sqrt_branch pair_rest  # subset
"""

import json
import os
import subprocess
import sys
import time

# self-contained: make the repo root importable regardless of cwd
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def check_sqrt_branch():
    """sqrt(1e-18) on this backend vs the 1e-9 threshold: documents the
    platform behavior AND asserts the kernel's classification (squared
    distance) is immune to it."""
    import jax
    import jax.numpy as jnp

    s = float(jax.jit(jnp.sqrt)(jnp.float32(1e-18)))
    # the fixed classification: d2 == 0 -> inside, regardless of sqrt
    d2 = jnp.float32(0.0)
    outside = bool(jax.jit(lambda d2: d2 > 1e-14)(d2))
    return {"sqrt_1e18": s, "sqrt_gt_1e9": s > 1e-9,
            "interior_misclassified": outside, "ok": not outside}


def check_pair_rest(z0=0.555):
    """Ball resting inside/on a box receiver: fused and XLA paths must
    agree and neither may sink through. z0 places the point center just
    above the box top (outside-branch settle)."""
    import jax
    import jax.numpy as jnp

    from tools.debug_pair_tpu import build_scene
    from omniisaacgymenvs_tpu.ops import fused_substep as fs

    m, eng = build_scene("box")
    h = eng.params.dt / eng.params.substeps
    fused = fs.build_fused_substep(m, h, eng.params.gravity,
                                   eng.contact_params)
    N, n_steps = 256, 32
    qa = m.q_adr[m.body_index("ball")]
    import numpy as np

    q = np.tile(np.asarray(m.default_q, np.float32), (N, 1))
    q[:, qa + 2] = z0  # default 0.555: just above the box top (z=0.54,
    # point radius 0.03) — settles through the outside branch
    q = jnp.asarray(q)
    qd = jnp.zeros((N, m.nv))
    eff = jnp.zeros((N, m.njd))
    ptg = jnp.zeros((N, m.njd))
    vtg = jnp.zeros((N, m.njd))
    fa = jnp.zeros((N, m.nb, 6))

    fq, _, _, _, _, _, _ = jax.jit(
        lambda *a: fused.step(*a, n_steps))(q, qd, eff, ptg, vtg, fa)

    def ref(q1, qd1):
        ctrl = eng.default_control()

        def body(c, _):
            qq, dd = c
            qq, dd, _ = eng._substep(qq, dd, ctrl, jnp.zeros((m.nb, 6)), h)
            return (qq, dd), None

        (qq, _), _ = jax.lax.scan(body, (q1, qd1), None, length=n_steps)
        return qq

    rq = jax.jit(jax.vmap(ref))(q, qd)
    zf = float(jnp.min(fq[:, qa + 2]))
    zr = float(jnp.min(rq[:, qa + 2]))
    dq = float(jnp.max(jnp.abs(fq - rq)))
    # the box top is at 0.54; a fall-through puts the point well below it
    return {"z_fused": zf, "z_xla": zr, "max_dq": dq,
            "ok": zf > 0.52 and zr > 0.52 and dq < 5e-2}


def _rollout(name, steps, N, mode):
    """Run a product rollout in a subprocess (own TPU context)."""
    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(here), "tools", "debug_product_ab.py"),
         name, str(steps), str(N), mode],
        env=dict(os.environ, OIGE_TPU_FUSED="1" if mode == "fused" else "0"),
        capture_output=True, text=True, timeout=1500,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT "):])
    return {"error": r.stderr[-500:], "rc": r.returncode}


def check_pair_rest_interior():
    """Point center STARTING INSIDE the box (z=0.52 < top 0.54): drives the
    interior-classification branch of the pair kernel on-chip — the exact
    path the round-2 TPU approximate-sqrt bug flipped (check_sqrt_branch is
    synthetic; this one goes through the real Pallas kernel)."""
    return check_pair_rest(z0=0.52)


def check_shadowhand():
    steps, N = 40, 128
    fused = _rollout("ShadowHand", steps, N, "fused")
    if "resets" not in fused:
        return {"fused": fused, "ok": False}
    # healthy: ~0.4% resets/env/step (episode-timeout + drop tail);
    # the r2 fall-through produced ~5%
    rate = fused["resets"] / (steps * N)
    return {"reset_rate": rate, "fused_active": fused.get("fused_active"),
            "ok": bool(fused.get("fused_active")) and rate < 0.02}


def check_ballbalance():
    steps, N = 40, 128
    t0 = time.time()
    fused = _rollout("BallBalance", steps, N, "fused")
    ok = "resets" in fused and bool(fused.get("fused_active"))
    return {"elapsed_s": round(time.time() - t0, 1),
            "fused_active": fused.get("fused_active"), "ok": ok}


def main():
    which = sys.argv[1:] or ["sqrt_branch", "pair_rest",
                             "pair_rest_interior", "shadowhand",
                             "ballbalance"]
    checks = {}
    for name in which:
        fn = globals()["check_" + name]
        try:
            checks[name] = fn()
        except Exception as e:  # a crash IS a failed check
            checks[name] = {"ok": False, "error": repr(e)[:300]}
    ok = all(c.get("ok") for c in checks.values())
    print(json.dumps({"ok": ok, "checks": checks}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
