"""Legacy LSTM checkpoint migration (r1-r4 -> fused LSTMCore).

Round 5 replaced flax's OptimizedLSTMCell (8 per-gate slivers) with the
fused LSTMCore (one (in,4H) + one (H,4H) kernel, fused-sequence BPTT path,
networks.py). Checkpoints written by earlier rounds — e.g. the 8279-epoch
ShadowHandOpenAI_LSTM run — must keep loading: PPOTrainer.load falls back
to the legacy param template and converts (learn/ppo.py
_upgrade_legacy_lstm / _downgrade_lstm_target). These tests pin the
conversion contract against an inline copy of the r4 module code."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from omniisaacgymenvs_tpu.learn.networks import LSTMActorCritic, LSTMCore
from omniisaacgymenvs_tpu.learn.ppo import (
    _downgrade_lstm_target,
    _upgrade_legacy_lstm,
)


class _LegacyLSTMActorCritic(nn.Module):
    """Verbatim structure of the r4 LSTMActorCritic (OptimizedLSTMCell +
    auto-named Dense/LayerNorm trunk) — the shape of every pre-r5
    checkpoint on disk."""

    num_actions: int
    lstm_units: int = 16
    units: tuple = (32,)
    activation: str = "elu"
    sigma_init: float = 0.0
    layer_norm: bool = True

    @nn.compact
    def __call__(self, obs, hidden):
        act = nn.elu
        h, c = hidden
        (c2, h2), out = nn.OptimizedLSTMCell(
            self.lstm_units, name="lstm"
        )((c, h), obs)
        x = out
        if self.layer_norm:
            x = nn.LayerNorm()(x)
        for u in self.units:
            x = act(nn.Dense(u)(x))
        mu = nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
        )(x)
        log_std = self.param(
            "log_std",
            nn.initializers.constant(self.sigma_init),
            (self.num_actions,),
        )
        value = nn.Dense(1)(x)[..., 0]
        return mu, log_std, value, (h2, c2)


def _mk_pair(seed=0, obs_dim=6, acts=3, units=16):
    old = _LegacyLSTMActorCritic(num_actions=acts, lstm_units=units)
    new = LSTMActorCritic(
        num_actions=acts, lstm_units=units, units=(32,), activation="elu"
    )
    k = jax.random.PRNGKey(seed)
    hid = (jnp.zeros((4, units)), jnp.zeros((4, units)))
    obs = jax.random.normal(k, (4, obs_dim))
    old_p = old.init(k, obs, hid)
    return old, new, old_p, obs, hid


def test_upgrade_reproduces_legacy_outputs():
    old, new, old_p, obs, hid = _mk_pair()
    new_p = _upgrade_legacy_lstm(old_p)
    mu0, ls0, v0, (h0, c0) = old.apply(old_p, obs, hid)
    mu1, ls1, v1, (h1, c1) = new.apply(new_p, obs, hid)
    np.testing.assert_allclose(mu0, mu1, atol=1e-6)
    np.testing.assert_allclose(ls0, ls1, atol=1e-6)
    np.testing.assert_allclose(v0, v1, atol=1e-6)
    np.testing.assert_allclose(h0, h1, atol=1e-6)
    np.testing.assert_allclose(c0, c1, atol=1e-6)


def test_downgrade_matches_legacy_structure():
    """The restore template produced from a fresh fused init must have
    exactly the legacy checkpoint's tree structure (what orbax needs to
    map an old checkpoint's leaves)."""
    old, new, old_p, obs, hid = _mk_pair()
    new_p = new.init(jax.random.PRNGKey(1), obs, hid)
    legacy_template = _downgrade_lstm_target(new_p)
    s0 = jax.tree.structure(old_p)
    s1 = jax.tree.structure(legacy_template)
    assert s0 == s1
    # and shapes agree leaf-by-leaf
    for a, b in zip(jax.tree.leaves(old_p), jax.tree.leaves(legacy_template)):
        assert a.shape == b.shape


def test_upgrade_downgrade_roundtrip():
    _, new, _, obs, hid = _mk_pair()
    new_p = new.init(jax.random.PRNGKey(2), obs, hid)
    rt = _upgrade_legacy_lstm(_downgrade_lstm_target(new_p))
    for a, b in zip(jax.tree.leaves(new_p), jax.tree.leaves(rt)):
        np.testing.assert_allclose(a, b, atol=0)


def test_seq_path_matches_stepwise():
    """LSTMCore.seq (fused x-projection + scan) must reproduce the
    single-step path including mid-sequence done resets."""
    units, B, T, D = 16, 5, 4, 6
    core = LSTMCore(units)
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (B, T, D))
    done = jnp.array(
        [[0, 0, 0, 0], [0, 1, 0, 0], [1, 1, 1, 1], [0, 0, 1, 0],
         [0, 0, 0, 1]],
        jnp.float32,
    )
    p = core.init(k, x[:, 0], (jnp.zeros((B, units)), jnp.zeros((B, units))))
    hid = (
        jax.random.normal(k, (B, units)) * 0.3,
        jax.random.normal(jax.random.PRNGKey(4), (B, units)) * 0.3,
    )
    outs_seq = core.apply(p, x, hid, done, method=LSTMCore.seq)
    h, c = hid
    step_outs = []
    for t in range(T):
        out, (h, c) = core.apply(p, x[:, t], (h, c))
        step_outs.append(out)
        m = done[:, t][:, None]
        h = jnp.where(m, 0.0, h)
        c = jnp.where(m, 0.0, c)
    np.testing.assert_allclose(
        outs_seq, jnp.stack(step_outs, axis=1), atol=1e-6
    )
