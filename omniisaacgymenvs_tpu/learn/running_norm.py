"""Running mean/std normalization (rl_games RunningMeanStd equivalent,
enabled by normalize_input / normalize_value in cfg/train/*PPO.yaml)."""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class RunningNorm:
    mean: jax.Array
    var: jax.Array
    count: jax.Array

    @classmethod
    def create(cls, shape) -> "RunningNorm":
        return cls(
            mean=jnp.zeros(shape),
            var=jnp.ones(shape),
            count=jnp.asarray(1e-4),
        )

    def update(self, batch: jax.Array) -> "RunningNorm":
        """Welford parallel update with a batch flattened over leading axes."""
        x = batch.reshape((-1,) + self.mean.shape)
        b_mean = jnp.mean(x, axis=0)
        b_var = jnp.var(x, axis=0)
        b_count = x.shape[0]
        delta = b_mean - self.mean
        tot = self.count + b_count
        mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta**2 * self.count * b_count / tot
        return RunningNorm(mean=mean, var=m2 / tot, count=tot)

    def normalize(self, x: jax.Array, clip: float = 5.0) -> jax.Array:
        return jnp.clip(
            (x - self.mean) / jnp.sqrt(self.var + 1e-5), -clip, clip
        )

    def denormalize(self, x: jax.Array) -> jax.Array:
        return x * jnp.sqrt(self.var + 1e-5) + self.mean
