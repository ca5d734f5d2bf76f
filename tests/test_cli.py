"""End-to-end CLI smoke tests for the entry scripts (reference L5,
scripts/rlgames_train.py + rlgames_play.py + random_policy.py).

These drive the real mains with dotted overrides — the same surface a user
types — and assert the run-dir artifacts (config dump, TensorBoard events,
checkpoints) and checkpoint-resume/eval paths work end to end on CPU.
"""

import pytest

pytestmark = pytest.mark.slow

import glob
import os

import numpy as np
import pytest


CLI = [
    "task=Cartpole",
    "num_envs=32",
    "seed=7",
    "train.params.config.minibatch_size=256",
    "train.params.config.save_frequency=2",
    "train.params.config.save_best_after=1",
]


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from omniisaacgymenvs_tpu.scripts import train

    train.main(CLI + ["max_iterations=4", "experiment=smoke",
                      "epochs_per_jit=2"])

    run_dir = tmp_path / "runs" / "smoke"
    assert (run_dir / "config.json").exists()
    # TensorBoard event files under runs/<exp>/summaries (reference rl_games
    # writer layout)
    assert glob.glob(str(run_dir / "summaries" / "events.out.tfevents.*"))
    # orbax checkpoints under nn/ (reference saves runs/<n>/nn/*.pth)
    ckpts = os.listdir(run_dir / "nn")
    assert "last" in ckpts

    # resume from the checkpoint (reference checkpoint= arg) and eval
    # (reference test=True path). max_iterations is the ABSOLUTE epoch
    # budget (rl_games semantics): resuming from epoch 4 with budget 6 runs
    # exactly 2 more epochs, numbered 4 and 5.
    train.main(CLI + ["max_iterations=6", "experiment=smoke2",
                      f"checkpoint={run_dir / 'nn' / 'last'}"])
    import json

    with open(tmp_path / "runs" / "smoke2" / "history.json") as f:
        hist = json.load(f)
    assert [m["epoch"] for m in hist] == [4, 5]
    train.main(CLI + ["test=True",
                      f"checkpoint={run_dir / 'nn' / 'last'}"])


def test_play_cli_records_trajectory(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from omniisaacgymenvs_tpu.scripts import play

    rec = tmp_path / "traj.npz"
    play.main(["task=Cartpole", "num_envs=8", "max_iterations=16",
               f"record={rec}"])
    data = np.load(rec, allow_pickle=False)
    assert data["q"].shape[0] == 16
    assert data["rewards"].shape == (16,)
    assert data["dof_names"].shape[0] == 2  # cart slider + pole hinge
    assert data["body_pos"].shape[0] == 16 and data["body_pos"].shape[2] == 3

    from omniisaacgymenvs_tpu.scripts import viewer

    gif = tmp_path / "traj.gif"
    viewer.main([str(rec), str(gif), "stride=4", "fps=10"])
    assert gif.stat().st_size > 0


def test_random_policy_cli(capsys):
    from omniisaacgymenvs_tpu.scripts import random_policy

    random_policy.main(["task=Cartpole", "num_envs=8", "max_iterations=8"])
    out = capsys.readouterr().out
    assert "env-steps/s" in out
