"""Allegro scene lab, batch 2: diagonal (roll+pitch) tilt toward the
thumb-index corner, near-resting spawn, deeper finger curl.

Usage: python tools/allegro_lab_b2.py [N_ENVS]
"""

import os as _os
import sys as _sys

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import itertools
import time

from tools.allegro_scene_lab import run_variant


def main():
    n_envs = int(_sys.argv[1]) if len(_sys.argv) > 1 else 128
    variants = []
    for (roll, pitch), curl, obj in itertools.product(
            ((-0.15, 0.3), (-0.25, 0.3), (-0.15, 0.45), (-0.25, 0.45)),
            ((0.45, 0.55, 0.3), (0.65, 0.7, 0.35)),
            ((0.015, 0.035, 0.052), (0.02, 0.02, 0.052))):
        variants.append((
            f"r{roll}p{pitch}-c{curl[0]}-o{obj[1]}",
            dict(tilt=(roll, pitch), thumb_abduct=0.35,
                 thumb_flex=(1.1, 0.4, 0.3), finger_curl=curl,
                 object_local=obj),
        ))
    print(f"{'variant':30s} {'static':>6s} {'flailM':>6s} {'flailA':>6s} "
          f"{'waveA':>6s} {'avel':>6s}  s")
    for name, scene in variants:
        t0 = time.time()
        try:
            r = run_variant(scene, n_envs=n_envs)
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} FAILED: {e}")
            continue
        print(f"{name:30s} {r['static']:6.2f} {r['flail_med']:6.0f} "
              f"{r['flail_alive']:6.2f} {r['wave_alive']:6.2f} "
              f"{r['wave_avel']:6.2f}  {time.time() - t0:.0f}")


if __name__ == "__main__":
    main()
