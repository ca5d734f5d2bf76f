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


class LSTMCore(nn.Module):
    """LSTM layer with fused gate kernels and TWO apply paths.

    - `__call__(x, hidden)`: one recurrent step (the rollout path).
    - `seq(x_seq, hidden, done_seq)`: BPTT over a (B, T, in) sequence with
      the input projection of ALL T steps computed as ONE matmul before the
      scan — only the (H, 4H) recurrent matmul stays sequential — and the
      episode-boundary hidden reset applied to the carry after each step
      exactly like the rollout does (r4 mid-chunk-done fix semantics).

    Gate math matches flax's LSTMCell (order i, f, g, o; bias on the
    recurrent kernels only): r4's per-gate OptimizedLSTMCell checkpoints
    convert loss-lessly by concatenating the 8 per-gate kernels
    (learn/ppo.py `_convert_legacy_lstm`). The fused layout exists for the
    TPU: one (in, 4H) and one (H, 4H) kernel keep the MXU busy with two
    large matmuls instead of eight slivers, and the replay's sequence path
    amortizes the x-projection over the whole minibatch
    (docs/performance.md recurrent-path profile — the round-5 items)."""

    features: int
    dtype: Optional[Any] = None
    # lax.scan unroll factor for the BPTT seq path. seq_len is 4 in the
    # reference LSTM config, so unroll=4 emits the whole recurrence as
    # straight-line code XLA can fuse across steps (no per-step stacking
    # or carry slicing). Rollout (__call__) is unaffected.
    seq_unroll: int = 1

    def setup(self):
        self.wx = nn.Dense(
            4 * self.features, use_bias=False, dtype=self.dtype, name="wx"
        )
        self.wh = nn.Dense(
            4 * self.features,
            use_bias=True,
            dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(),
            name="wh",
        )

    def _step(self, h, c, x_gates):
        gates = x_gates + self.wh(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h2 = nn.sigmoid(o) * jnp.tanh(c2)
        return h2, c2

    def __call__(self, x, hidden):
        h, c = hidden
        h2, c2 = self._step(h, c, self.wx(x))
        # hidden carry stays f32 so the recurrence doesn't accumulate
        # bf16 rounding across long rollouts
        return h2, (h2.astype(jnp.float32), c2.astype(jnp.float32))

    def seq(self, x_seq, hidden, done_seq):
        """x_seq (B, T, in), hidden ((B, H), (B, H)), done_seq (B, T)
        -> outputs (B, T, H). Output at step t is the PRE-reset h (the
        action at t was computed from it); the reset applies to the carry
        into t+1, mirroring the rollout."""
        x_gates = self.wx(x_seq)  # one (B*T, in) x (in, 4H) matmul
        xg = jnp.swapaxes(x_gates, 0, 1)  # (T, B, 4H)
        dn = jnp.swapaxes(done_seq, 0, 1)  # (T, B)

        def body(carry, xd):
            h, c = carry
            xgt, dt = xd
            h2, c2 = self._step(h, c, xgt)
            h2f = h2.astype(jnp.float32)
            c2f = c2.astype(jnp.float32)
            m = dt[:, None]
            carry = (
                jnp.where(m, jnp.zeros_like(h2f), h2f),
                jnp.where(m, jnp.zeros_like(c2f), c2f),
            )
            return carry, h2

        _, outs = jax.lax.scan(
            body, hidden, (xg, dn), unroll=self.seq_unroll
        )
        return jnp.swapaxes(outs, 0, 1)  # (B, T, H)


class LSTMCentralValue(nn.Module):
    """LSTM-before-MLP central value on privileged states (rl_games
    central_value_config with an rnn block — reference
    cfg/train/ShadowHandOpenAI_LSTMPPO.yaml:80-105: lstm 1024 + mlp [512])."""

    lstm_units: int = 1024
    units: Sequence[int] = (512,)
    activation: str = "relu"
    layer_norm: bool = True
    dtype: Optional[Any] = None
    seq_unroll: int = 1

    def setup(self):
        self.lstm = LSTMCore(
            self.lstm_units, dtype=self.dtype,
            seq_unroll=self.seq_unroll, name="lstm",
        )
        self.ln = (
            nn.LayerNorm(dtype=self.dtype, name="ln")
            if self.layer_norm
            else None
        )
        self.mlp = [
            nn.Dense(u, dtype=self.dtype, name=f"mlp_{i}")
            for i, u in enumerate(self.units)
        ]
        self.head = nn.Dense(1, dtype=self.dtype, name="value")

    def _value(self, out):
        act = _ACTS[self.activation]
        x = self.ln(out) if self.ln is not None else out
        for lyr in self.mlp:
            x = act(lyr(x))
        return self.head(x)[..., 0].astype(jnp.float32)

    def __call__(self, states, hidden):
        out, hidden2 = self.lstm(states, hidden)
        return self._value(out), hidden2

    def seq(self, states_seq, hidden, done_seq):
        """BPTT replay path: (B, T, states) -> values (B, T); the LN/MLP
        trunk runs ONCE on the stacked (B, T, H) LSTM outputs instead of
        per scan step."""
        outs = self.lstm.seq(states_seq, hidden, done_seq)
        return self._value(outs)


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
    seq_unroll: int = 1

    def setup(self):
        self.lstm = LSTMCore(
            self.lstm_units, dtype=self.dtype,
            seq_unroll=self.seq_unroll, name="lstm",
        )
        self.ln = (
            nn.LayerNorm(dtype=self.dtype, name="ln")
            if self.layer_norm
            else None
        )
        self.mlp = [
            nn.Dense(u, dtype=self.dtype, name=f"mlp_{i}")
            for i, u in enumerate(self.units)
        ]
        self.mu_head = nn.Dense(
            self.num_actions,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
            name="mu",
        )
        self.value_head = nn.Dense(1, dtype=self.dtype, name="value")
        self.log_std = self.param(
            "log_std",
            nn.initializers.constant(self.sigma_init),
            (self.num_actions,),
        )

    def _heads(self, out):
        act = _ACTS[self.activation]
        x = self.ln(out) if self.ln is not None else out
        for lyr in self.mlp:
            x = act(lyr(x))
        mu = self.mu_head(x)
        value = self.value_head(x)[..., 0]
        return (
            mu.astype(jnp.float32),
            self.log_std,
            value.astype(jnp.float32),
        )

    def __call__(self, obs, hidden):
        out, hidden2 = self.lstm(obs, hidden)
        mu, log_std, value = self._heads(out)
        return mu, log_std, value, hidden2

    def seq(self, obs_seq, hidden, done_seq):
        """BPTT replay path: (B, T, obs) -> (mu (B, T, A), log_std,
        value (B, T)); LN/MLP/heads run ONCE on the stacked LSTM outputs."""
        outs = self.lstm.seq(obs_seq, hidden, done_seq)
        return self._heads(outs)


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
