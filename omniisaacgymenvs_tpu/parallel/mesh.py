"""Device mesh / GSPMD sharding utilities.

The reference's only parallelism axis is the env batch on one GPU
(SURVEY.md §2.4); here that axis is sharded over a 1-D ('env',) jax mesh
spanning ICI (and DCN for multi-host via jax.distributed). The learner is
co-located: parameters are replicated, rollout data stays env-sharded, and
XLA inserts psum/all-gather collectives for gradient reduction.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ENV_AXIS = "env"


def env_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices with axis name 'env'."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading (env) axis; later axes replicated."""
    return NamedSharding(mesh, P(ENV_AXIS, *([None] * (rank - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_tree(tree, mesh: Mesh):
    """device_put every leaf with its leading axis sharded over 'env'."""

    def put(x):
        return jax.device_put(x, env_sharding(mesh, max(x.ndim, 1)))

    return jax.tree.map(put, tree)
