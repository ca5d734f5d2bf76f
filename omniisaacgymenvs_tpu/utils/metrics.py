"""Metrics / observability: TensorBoard writer + episode-stats observer.

Reference: utils/rlgames/rlgames_utils.py RLGPUAlgoObserver (:38-91) —
logs `Episode/*` means from the env extras dict plus direct scalar infos
to TensorBoard; optional W&B with sync_tensorboard (reference
scripts/rlgames_train.py:110-125). Here the writer is TensorBoard when
torch is importable, with a JSONL fallback, and W&B is gated on the
module's presence (not baked into this image).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class JsonlWriter:
    """Fallback writer: one JSON line per scalar batch."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value, step):
        self._f.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}
            )
            + "\n"
        )
        self._f.flush()

    def close(self):
        self._f.close()


def make_writer(logdir: str):
    """TensorBoard SummaryWriter if available, else JSONL."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=logdir)
    except Exception:
        return JsonlWriter(logdir)


def maybe_init_wandb(cfg: dict):
    """Optional W&B init (reference scripts/rlgames_train.py:110-125).
    Returns the run or None if wandb is unavailable/disabled."""
    wandb_cfg = cfg.get("wandb_activate", False)
    if not wandb_cfg:
        return None
    try:
        import wandb
    except ImportError:
        print("wandb not installed; skipping W&B logging")
        return None
    return wandb.init(
        project=cfg.get("wandb_project", "omniisaacgymenvs_tpu"),
        group=cfg.get("wandb_group", ""),
        entity=cfg.get("wandb_entity", None),
        config=cfg,
        sync_tensorboard=True,
        name=cfg.get("experiment") or cfg.get("task_name", "run"),
        resume="allow",
    )


class EpisodeObserver:
    """Bridges per-env task metrics (EnvState.metrics — the reference
    extras/episode dict) to the writer as `Episode/<key>` means, matching
    RLGPUAlgoObserver's after_print_stats behavior."""

    def __init__(self, writer):
        self.writer = writer

    def log(self, task_metrics: dict, step: int):
        for k, v in task_metrics.items():
            tag = k if "/" in k else f"Episode/{k}"
            self.writer.add_scalar(tag, v, step)
