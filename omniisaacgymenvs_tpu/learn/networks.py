"""Actor-critic networks (flax), mirroring rl_games model/network configs.

Reference train configs (cfg/train/*PPO.yaml): model `continuous_a2c_logstd`
(state-independent log-std parameter, `fixed_sigma: True`), network
`actor_critic` with shared MLP trunk (`separate: False`), elu activation,
per-task unit sizes; asymmetric setups add a separate central-value MLP on
the privileged states buffer (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACTS = {
    "elu": nn.elu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "selu": nn.selu,
}


class ActorCritic(nn.Module):
    """Shared-trunk actor-critic with constant log-std (continuous_a2c_logstd)."""

    num_actions: int
    units: Sequence[int] = (256, 128, 64)
    activation: str = "elu"
    sigma_init: float = 0.0  # reference: const_initializer val 0
    # compute dtype (rl_games mixed_precision): bf16 matmuls on the MXU,
    # f32 params and outputs; None = full f32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, obs: jax.Array):
        act = _ACTS[self.activation]
        x = obs
        for u in self.units:
            x = act(nn.Dense(u, dtype=self.dtype)(x))
        mu = nn.Dense(
            self.num_actions,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
        )(x)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.sigma_init),
            (self.num_actions,),
        )
        value = nn.Dense(1, dtype=self.dtype)(x)[..., 0]
        return (
            mu.astype(jnp.float32),
            log_std,
            value.astype(jnp.float32),
        )


class CentralValue(nn.Module):
    """Separate critic on privileged states (rl_games central_value_config,
    reference cfg/train/ShadowHandOpenAI_FFPPO.yaml:74-95)."""

    units: Sequence[int] = (512, 512, 256, 128)
    activation: str = "elu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, states: jax.Array):
        act = _ACTS[self.activation]
        x = states
        for u in self.units:
            x = act(nn.Dense(u, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)[..., 0].astype(jnp.float32)


class LSTMCentralValue(nn.Module):
    """LSTM-before-MLP central value on privileged states (rl_games
    central_value_config with an rnn block — reference
    cfg/train/ShadowHandOpenAI_LSTMPPO.yaml:80-105: lstm 1024 + mlp [512])."""

    lstm_units: int = 1024
    units: Sequence[int] = (512,)
    activation: str = "relu"
    layer_norm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, states, hidden):
        act = _ACTS[self.activation]
        h, c = hidden
        (c2, h2), out = nn.OptimizedLSTMCell(
            self.lstm_units, name="lstm", dtype=self.dtype
        )((c, h), states)
        x = out
        if self.layer_norm:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        for u in self.units:
            x = act(nn.Dense(u, dtype=self.dtype)(x))
        value = nn.Dense(1, dtype=self.dtype)(x)[..., 0]
        return (
            value.astype(jnp.float32),
            (h2.astype(jnp.float32), c2.astype(jnp.float32)),
        )


class LSTMActorCritic(nn.Module):
    """LSTM-before-MLP actor-critic (rl_games rnn config: units 1024,
    layer_norm, before-mlp — reference cfg/train/ShadowHandOpenAI_LSTMPPO
    .yaml:32-37). Carries (h, c) per env; call with obs (..., num_obs) and
    hidden ((..., units), (..., units))."""

    num_actions: int
    lstm_units: int = 1024
    units: Sequence[int] = (512, 512, 256, 128)
    activation: str = "elu"
    sigma_init: float = 0.0
    layer_norm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, obs, hidden):
        act = _ACTS[self.activation]
        h, c = hidden
        (c2, h2), out = nn.OptimizedLSTMCell(
            self.lstm_units, name="lstm", dtype=self.dtype
        )((c, h), obs)
        x = out
        if self.layer_norm:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        for u in self.units:
            x = act(nn.Dense(u, dtype=self.dtype)(x))
        mu = nn.Dense(
            self.num_actions,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
        )(x)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.sigma_init),
            (self.num_actions,),
        )
        value = nn.Dense(1, dtype=self.dtype)(x)[..., 0]
        # hidden carry stays f32 so the recurrence doesn't accumulate
        # bf16 rounding across long rollouts
        return (
            mu.astype(jnp.float32),
            log_std,
            value.astype(jnp.float32),
            (h2.astype(jnp.float32), c2.astype(jnp.float32)),
        )


def gaussian_logprob(mu, log_std, action):
    """Diagonal Gaussian log pi(a|s)."""
    var = jnp.exp(2.0 * log_std)
    return -0.5 * jnp.sum(
        (action - mu) ** 2 / var + 2.0 * log_std + jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)


def gaussian_kl(mu0, log_std0, mu1, log_std1):
    """KL(pi0 || pi1) for diagonal Gaussians (rl_games policy_kl)."""
    var0 = jnp.exp(2.0 * log_std0)
    var1 = jnp.exp(2.0 * log_std1)
    return jnp.sum(
        log_std1 - log_std0
        + (var0 + (mu0 - mu1) ** 2) / (2.0 * var1)
        - 0.5,
        axis=-1,
    )
