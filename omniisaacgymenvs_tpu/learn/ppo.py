"""PPO learner, co-located with the simulation on the same devices.

Replaces the external rl_games `a2c_continuous` trainer (SURVEY.md §2.5)
with a fully jitted JAX implementation: the rollout is a lax.scan over the
vmapped env step, GAE a reverse scan, and the minibatch SGD a scan over
shuffled slices — one XLA program per epoch, no host round-trips.

Feature parity targets (cfg/train/*PPO.yaml): GAE (gamma/tau), adaptive-KL
'legacy' LR schedule (kl_threshold), e_clip surrogate + clipped value loss,
grad-norm truncation, entropy/bounds/critic coefficients, obs & value
RunningMeanStd, advantage normalization, reward shaper scale,
value_bootstrap on timeouts, horizon_length x num_envs rollouts with
mini_epochs x minibatch SGD.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from omniisaacgymenvs_tpu.envs.vec_env import VecEnv
from omniisaacgymenvs_tpu.learn.networks import (
    ActorCritic,
    CentralValue,
    LSTMActorCritic,
    LSTMCentralValue,
    gaussian_entropy,
    gaussian_kl,
    gaussian_logprob,
)
from omniisaacgymenvs_tpu.learn.running_norm import RunningNorm


_LEGACY_GATES = ("i", "f", "g", "o")  # flax LSTMCell gate order


def _is_legacy_cell(v):
    return isinstance(v, dict) and all(
        f"{s}{g}" in v for s in ("i", "h") for g in _LEGACY_GATES
    )


def _upgrade_legacy_lstm(tree):
    """Convert r1-r4 checkpoints (flax OptimizedLSTMCell per-gate kernels +
    auto-named Dense_i/LayerNorm_0 trunk) to the fused LSTMCore layout
    (networks.py): wx = concat of the 4 input kernels, wh(+bias) = concat
    of the 4 recurrent kernels; trunk renamed mlp_i/mu/value/ln. Applied
    recursively so Adam moments inside opt_state convert too (the moment
    of a concat is the concat of the moments)."""
    import numpy as np

    def conv_cell(cell):
        wx = np.concatenate(
            [np.asarray(cell[f"i{g}"]["kernel"]) for g in _LEGACY_GATES],
            axis=1,
        )
        wh = np.concatenate(
            [np.asarray(cell[f"h{g}"]["kernel"]) for g in _LEGACY_GATES],
            axis=1,
        )
        b = np.concatenate(
            [np.asarray(cell[f"h{g}"]["bias"]) for g in _LEGACY_GATES]
        )
        return {"wx": {"kernel": wx}, "wh": {"kernel": wh, "bias": b}}

    def walk(d):
        if isinstance(d, dict):
            if "lstm" in d and _is_legacy_cell(d["lstm"]):
                out = {"lstm": conv_cell(d["lstm"])}
                dense = sorted(
                    (k for k in d if k.startswith("Dense_")),
                    key=lambda s: int(s.split("_")[1]),
                )
                n_heads = 2 if "log_std" in d else 1  # actor: mu+value
                for i, k in enumerate(dense[: len(dense) - n_heads]):
                    out[f"mlp_{i}"] = d[k]
                if dense:
                    if n_heads == 2:
                        out["mu"] = d[dense[-2]]
                        out["log_std"] = d["log_std"]
                    out["value"] = d[dense[-1]]
                if "LayerNorm_0" in d:
                    out["ln"] = d["LayerNorm_0"]
                return out
            return {k: walk(v) for k, v in d.items()}
        if isinstance(d, tuple) and hasattr(d, "_fields"):  # NamedTuple
            return type(d)(*(walk(v) for v in d))
        if isinstance(d, (tuple, list)):
            return type(d)(walk(v) for v in d)
        return d

    return walk(tree)


def _downgrade_lstm_target(tree):
    """Inverse of _upgrade_legacy_lstm on a TEMPLATE pytree: produce the
    r1-r4 param structure (matching shapes/dtypes, from splitting the
    fused kernels) so orbax can restore an old checkpoint into it."""
    import numpy as np

    def split_cell(cell):
        wx = np.asarray(cell["wx"]["kernel"])
        wh = np.asarray(cell["wh"]["kernel"])
        b = np.asarray(cell["wh"]["bias"])
        h = wh.shape[0]
        out = {}
        for i, g in enumerate(_LEGACY_GATES):
            out[f"i{g}"] = {"kernel": wx[:, i * h:(i + 1) * h]}
            out[f"h{g}"] = {
                "kernel": wh[:, i * h:(i + 1) * h],
                "bias": b[i * h:(i + 1) * h],
            }
        return out

    def walk(d):
        if isinstance(d, dict):
            if "lstm" in d and isinstance(d["lstm"], dict) \
                    and "wx" in d["lstm"]:
                out = {"lstm": split_cell(d["lstm"])}
                mlp = sorted(
                    (k for k in d if k.startswith("mlp_")),
                    key=lambda s: int(s.split("_")[1]),
                )
                n = 0
                for k in mlp:
                    out[f"Dense_{n}"] = d[k]
                    n += 1
                if "mu" in d:
                    out[f"Dense_{n}"] = d["mu"]
                    n += 1
                    out["log_std"] = d["log_std"]
                out[f"Dense_{n}"] = d["value"]
                if "ln" in d:
                    out["LayerNorm_0"] = d["ln"]
                return out
            return {k: walk(v) for k, v in d.items()}
        if isinstance(d, tuple) and hasattr(d, "_fields"):
            return type(d)(*(walk(v) for v in d))
        if isinstance(d, (tuple, list)):
            return type(d)(walk(v) for v in d)
        return d

    return walk(tree)


def _pack_dataset(dataset):
    """Pack a flat SGD dataset into ONE (S, D) f32 matrix + an unpack fn.

    TPU gathers are row-overhead bound: gathering a random minibatch from
    8 separate arrays — four of them (S,) scalars whose "rows" are 4
    bytes — ran the FF update phase at ~10% of HBM bandwidth and made the
    gather ~80% of the whole SGD phase (tools/ff_profile.py @ 8192
    Humanoid envs: full 112 ms vs 40 ms packed vs 20 ms contiguous).
    Concatenating the fields once per epoch (~0.2 ms of bandwidth) turns
    every minibatch into a single wide-row gather. Minibatch composition
    and all arithmetic are unchanged — the same rows land in the same
    order, columns are just sliced back out of the gathered block.

    Only flat float32 datasets pack (every field rank<=2) — the FF path.
    RNN datasets ((B, seq, ...) fields, bool done masks, big stored
    hidden) return (None, None) and keep per-field index gathers, which
    the recurrent-path profile showed are <10% there.
    """
    names = sorted(dataset)
    for k in names:
        v = dataset[k]
        if v.dtype != jnp.float32 or v.ndim > 2:
            return None, None
    cols = {}
    off = 0
    parts = []
    for k in names:
        v = dataset[k]
        v2 = v[:, None] if v.ndim == 1 else v
        cols[k] = (off, off + v2.shape[1], v.ndim == 1)
        off += v2.shape[1]
        parts.append(v2)
    packed = jnp.concatenate(parts, axis=1)

    def unpack(rows):
        out = {}
        for k, (a, b, was1d) in cols.items():
            s = rows[:, a:b]
            out[k] = s[:, 0] if was1d else s
        return out

    return packed, unpack


@dataclasses.dataclass
class PPOConfig:
    """Mirrors the rl_games config block of cfg/train/*PPO.yaml."""

    horizon_length: int = 16
    minibatch_size: int = 8192
    mini_epochs: int = 8
    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 3e-4
    lr_schedule: str = "adaptive"
    # adaptive-LR update cadence: "legacy" adapts after every minibatch
    # (rl_games legacy schedule), "standard" once per mini-epoch on the
    # mini-epoch's mean KL (rl_games schedule_type: standard — what every
    # reference cfg/train yaml declares)
    schedule_type: str = "legacy"
    kl_threshold: float = 0.008
    e_clip: float = 0.2
    clip_value: bool = True
    critic_coef: float = 4.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 1e-4
    grad_norm: float = 1.0
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    reward_shaper_scale: float = 1.0
    value_bootstrap: bool = False
    max_epochs: int = 100
    units: Sequence[int] = (32, 32)
    activation: str = "elu"
    sigma_init: float = 0.0   # initial log-std (rl_games sigma_init val)
    lr_min: float = 1e-6
    lr_max: float = 1e-2
    # asymmetric actor-critic: separate critic on privileged states with its
    # OWN optimizer, minibatch size, mini-epochs and learning rate
    # (rl_games central_value_config, cfg/train/ShadowHandOpenAI_FFPPO
    # .yaml:74-95, LSTM variant :80-105)
    central_value: bool = False
    cv_units: Sequence[int] = (512, 512, 256, 128)
    cv_activation: str = "elu"
    cv_minibatch_size: int = 8192
    cv_mini_epochs: int = 8
    cv_learning_rate: float = 5e-4
    # LSTM central value (ShadowHandOpenAI_LSTMPPO central_value_config
    # network.rnn — only valid together with rnn="lstm" on the actor)
    cv_rnn: Optional[str] = None
    cv_rnn_units: int = 1024
    # recurrent policy (rl_games rnn block, ShadowHandOpenAI_LSTMPPO.yaml)
    rnn: Optional[str] = None      # None | "lstm"
    rnn_units: int = 1024
    seq_len: int = 4
    # rl_games mixed_precision: bf16 network compute (MXU), f32 params,
    # losses and running norms stay f32
    mixed_precision: bool = False
    # asymmetric mode only: ALSO train the actor's own value head on
    # returns (auxiliary feature-shaping for the shared trunk; the head
    # plays no role in GAE — that stays the central value's job)
    actor_aux_value_loss: bool = False


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    lr: jax.Array
    obs_norm: RunningNorm
    value_norm: RunningNorm
    states_norm: RunningNorm   # for the central-value critic input
    es: Any                  # batched EnvState
    rng: jax.Array
    hidden: Any              # actor RNN carry ((N,u),(N,u)) or ()
    # separate central-value training state (rl_games CentralValueTrain:
    # own network/optimizer/minibatching, cfg central_value_config)
    cv_params: Any
    cv_opt_state: Any
    cv_hidden: Any           # CV LSTM carry ((N,u),(N,u)) or ()
    ep_ret: jax.Array        # (N,) running episode reward (raw)
    ep_len: jax.Array        # (N,)
    # running means over the last ~100 completed episodes (rl_games
    # AverageMeter games_to_track=100 semantics): without these, tasks whose
    # episodes only end on timeout (e.g. FrankaCabinet, 500 steps) would
    # report 0 on every epoch whose 16-step window contains no episode end
    score_mean: jax.Array    # ()
    len_mean: jax.Array      # ()
    games: jax.Array         # () episodes inside the tracking window
    epoch: jax.Array
    # task-defined cross-env statistics (RLTask.episode_stats_*), e.g. the
    # in-hand consecutive-success EMA (reference in_hand_manipulation
    # .py:394-396) — updated after every env step on the batched state
    task_stats: Any = ()


class PPOTrainer:
    def __init__(self, env: VecEnv, cfg: PPOConfig, seed: int = 42):
        self.env = env
        self.cfg = cfg
        self.is_rnn = cfg.rnn == "lstm"
        self.use_cv = cfg.central_value and env.num_states > 0
        net_dtype = jnp.bfloat16 if cfg.mixed_precision else None
        # fully unroll the BPTT seq scan for short reference seq_lens:
        # straight-line recurrence lets XLA fuse the gate elementwise
        # chains across steps — 1.17x on the measured grad step at
        # seq_len 4, after which the recurrent matmuls run at ~96% of the
        # chip's dependent-chain rate (tools/bptt_variants.py, r5)
        seq_unroll = cfg.seq_len if cfg.seq_len <= 8 else 1
        if self.is_rnn:
            self.net = LSTMActorCritic(
                num_actions=env.num_actions,
                lstm_units=cfg.rnn_units,
                units=tuple(cfg.units),
                activation=cfg.activation,
                sigma_init=cfg.sigma_init,
                dtype=net_dtype,
                seq_unroll=seq_unroll,
            )
        else:
            self.net = ActorCritic(
                num_actions=env.num_actions,
                units=tuple(cfg.units),
                activation=cfg.activation,
                sigma_init=cfg.sigma_init,
                dtype=net_dtype,
            )
        self.is_cv_rnn = self.use_cv and cfg.cv_rnn == "lstm"
        if self.is_cv_rnn:
            assert self.is_rnn, "LSTM central value requires an LSTM actor"
            self.cv_net = LSTMCentralValue(
                lstm_units=cfg.cv_rnn_units,
                units=tuple(cfg.cv_units),
                activation=cfg.cv_activation,
                dtype=net_dtype,
                seq_unroll=seq_unroll,
            )
        elif self.use_cv:
            self.cv_net = CentralValue(
                units=tuple(cfg.cv_units),
                activation=cfg.cv_activation,
                dtype=net_dtype,
            )
        else:
            self.cv_net = None
        self.opt = optax.chain(
            optax.clip_by_global_norm(cfg.grad_norm),
            optax.scale_by_adam(eps=1e-8),
        )
        # the central value gets its OWN optimizer (rl_games
        # CentralValueTrain) with a fixed configured learning rate
        self.cv_opt = (
            optax.chain(
                optax.clip_by_global_norm(cfg.grad_norm),
                optax.scale_by_adam(eps=1e-8),
            )
            if self.use_cv
            else None
        )
        rng = jax.random.PRNGKey(seed)
        rng, k_init, k_cv = jax.random.split(rng, 3)
        n = env.num_envs
        if self.is_rnn:
            hidden = (
                jnp.zeros((n, cfg.rnn_units)), jnp.zeros((n, cfg.rnn_units))
            )
            ac_params = self.net.init(
                k_init, jnp.zeros((1, env.num_obs)),
                (jnp.zeros((1, cfg.rnn_units)), jnp.zeros((1, cfg.rnn_units))),
            )
        else:
            hidden = ()
            ac_params = self.net.init(k_init, jnp.zeros((1, env.num_obs)))
        params = {"ac": ac_params}
        cv_params = ()
        cv_opt_state = ()
        cv_hidden = ()
        if self.is_cv_rnn:
            cv_hidden = (
                jnp.zeros((n, cfg.cv_rnn_units)),
                jnp.zeros((n, cfg.cv_rnn_units)),
            )
            cv_params = self.cv_net.init(
                k_cv, jnp.zeros((1, env.num_states)),
                (jnp.zeros((1, cfg.cv_rnn_units)),
                 jnp.zeros((1, cfg.cv_rnn_units))),
            )
        elif self.use_cv:
            cv_params = self.cv_net.init(
                k_cv, jnp.zeros((1, env.num_states))
            )
        if self.use_cv:
            cv_opt_state = self.cv_opt.init(cv_params)
        es = env.reset(seed=seed)
        self.state = TrainState(
            params=params,
            opt_state=self.opt.init(params),
            lr=jnp.asarray(cfg.learning_rate),
            obs_norm=RunningNorm.create((env.num_obs,)),
            value_norm=RunningNorm.create(()),
            states_norm=RunningNorm.create((env.num_states,)),
            es=es,
            rng=rng,
            hidden=hidden,
            cv_params=cv_params,
            cv_opt_state=cv_opt_state,
            cv_hidden=cv_hidden,
            ep_ret=jnp.zeros(n),
            ep_len=jnp.zeros(n),
            score_mean=jnp.zeros(()),
            len_mean=jnp.zeros(()),
            games=jnp.zeros(()),
            epoch=jnp.zeros((), jnp.int32),
            task_stats=env.task.episode_stats_init(),
        )
        if self.is_rnn:
            assert cfg.horizon_length % cfg.seq_len == 0, (
                "horizon_length must be divisible by seq_len"
            )
        self._epoch_jit = jax.jit(self._epoch)

    # ------------------------------------------------------------------
    def _policy(self, params, ts, obs, states, hidden, cv_hidden=()):
        """Actor forward + value estimate. With a central value the value
        comes from the separate CV network on the privileged states
        (rl_games get_central_value); cv_hidden carries the CV LSTM state.
        Returns (mu, log_std, value, hidden, cv_hidden)."""
        x = ts.obs_norm.normalize(obs) if self.cfg.normalize_input else obs
        if self.is_rnn:
            mu, log_std, v, hidden = self.net.apply(params["ac"], x, hidden)
        else:
            mu, log_std, v = self.net.apply(params["ac"], x)
        if self.use_cv:
            sx = (
                ts.states_norm.normalize(states)
                if self.cfg.normalize_input
                else states
            )
            if self.is_cv_rnn:
                v, cv_hidden = self.cv_net.apply(ts.cv_params, sx, cv_hidden)
            else:
                v = self.cv_net.apply(ts.cv_params, sx)
        if self.cfg.normalize_value:
            v = ts.value_norm.denormalize(v)
        return mu, log_std, v, hidden, cv_hidden

    def _rollout(self, ts: TrainState):
        cfg = self.cfg
        step_env = jax.vmap(self.env.task.step)

        def body(carry, _):
            (es, rng, hidden, cv_hidden, ep_ret, ep_len, fin_ret, fin_len,
             fin_cnt, task_stats) = carry
            mu, log_std, value, hidden_post, cv_hidden_post = self._policy(
                ts.params, ts, es.obs, es.states, hidden, cv_hidden
            )
            rng, k = jax.random.split(rng)
            action = mu + jnp.exp(log_std) * jax.random.normal(k, mu.shape)
            logp = gaussian_logprob(mu, log_std, action)
            es2 = step_env(es, action)
            raw_rew = es2.reward
            shaped = cfg.reward_shaper_scale * raw_rew
            if cfg.value_bootstrap:
                # rl_games: rewards += gamma * values * time_outs
                shaped = shaped + cfg.gamma * value * es2.timeout
            # reset RNN state for envs that terminated
            if self.is_rnn:
                d = es2.done[:, None]
                hidden_next = tuple(
                    jnp.where(d, jnp.zeros_like(x), x) for x in hidden_post
                )
                cv_hidden_next = tuple(
                    jnp.where(d, jnp.zeros_like(x), x)
                    for x in cv_hidden_post
                )
            else:
                hidden_next = hidden_post
                cv_hidden_next = cv_hidden_post
            # episode stats
            ep_ret = ep_ret + raw_rew
            ep_len = ep_len + 1.0
            d = es2.done
            fin_ret = fin_ret + jnp.sum(jnp.where(d, ep_ret, 0.0))
            fin_len = fin_len + jnp.sum(jnp.where(d, ep_len, 0.0))
            fin_cnt = fin_cnt + jnp.sum(d)
            ep_ret = jnp.where(d, 0.0, ep_ret)
            ep_len = jnp.where(d, 0.0, ep_len)
            task_stats = self.env.task.episode_stats_update(task_stats, es2)
            out = dict(
                obs=es.obs,
                states=es.states,
                action=action,
                logp=logp,
                value=value,
                mu=mu,
                log_std=jnp.broadcast_to(log_std, mu.shape),
                reward=shaped,
                done=es2.done,
            )
            return (
                es2, rng, hidden_next, cv_hidden_next, ep_ret, ep_len,
                fin_ret, fin_len, fin_cnt, task_stats,
            ), out

        rng, k = jax.random.split(ts.rng)
        init = (
            ts.es, k, ts.hidden, ts.cv_hidden, ts.ep_ret, ts.ep_len,
            0.0, 0.0, 0.0, ts.task_stats,
        )
        if self.is_rnn:
            # sequence-major rollout: scan chunks of seq_len steps and
            # store the LSTM hidden ONLY at chunk starts — exactly what
            # BPTT replays from. Stacking hidden on every step moved
            # 4x the bytes (2 x 536 MB h/c per net at 8192 envs) to keep
            # slices that to_seq immediately discarded
            # (docs/performance.md recurrent-path profile, round-5 item).
            seq = cfg.seq_len
            nch = cfg.horizon_length // seq

            def chunk(carry, _):
                hidden0, cv_hidden0 = carry[2], carry[3]
                carry, out = jax.lax.scan(body, carry, None, length=seq)
                out["hidden_h"], out["hidden_c"] = hidden0
                if self.is_cv_rnn:
                    out["cv_hidden_h"], out["cv_hidden_c"] = cv_hidden0
                return carry, out

            final, traj = jax.lax.scan(chunk, init, None, length=nch)
            hid_keys = {"hidden_h", "hidden_c", "cv_hidden_h", "cv_hidden_c"}
            # flatten (nch, seq, N, ...) -> (T, N, ...): contiguous leading
            # axes, a free bitcast; hidden fields stay (nch, N, units)
            traj = {
                k: (
                    v
                    if k in hid_keys
                    else v.reshape((cfg.horizon_length,) + v.shape[2:])
                )
                for k, v in traj.items()
            }
        else:
            final, traj = jax.lax.scan(
                body, init, None, length=cfg.horizon_length
            )
        (
            es, _, hidden, cv_hidden, ep_ret, ep_len, fin_ret, fin_len,
            fin_cnt, task_stats,
        ) = final
        # bootstrap value of the final state
        _, _, last_value, _, _ = self._policy(
            ts.params, ts, es.obs, es.states, hidden, cv_hidden
        )
        ts = ts.replace(
            es=es, rng=rng, hidden=hidden, cv_hidden=cv_hidden,
            ep_ret=ep_ret, ep_len=ep_len, task_stats=task_stats,
        )
        stats = dict(fin_ret=fin_ret, fin_len=fin_len, fin_cnt=fin_cnt)
        return ts, traj, last_value, stats

    def _gae(self, traj, last_value):
        cfg = self.cfg

        def body(carry, xs):
            adv_next, v_next = carry
            reward, value, done = xs
            not_done = 1.0 - done.astype(jnp.float32)
            delta = reward + cfg.gamma * v_next * not_done - value
            adv = delta + cfg.gamma * cfg.tau * not_done * adv_next
            return (adv, value), adv

        _, advs = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            (traj["reward"], traj["value"], traj["done"]),
            reverse=True,
        )
        returns = advs + traj["value"]
        return advs, returns

    def _loss(self, params, mb, ts, advs_mean, advs_std):
        """PPO loss over a minibatch. In RNN mode mb fields have a leading
        sequence axis (B, seq, ...) plus stored initial hidden (B, units);
        the LSTM is re-run over the sequence from the stored state."""
        cfg = self.cfg
        x = (
            ts.obs_norm.normalize(mb["obs"])
            if cfg.normalize_input
            else mb["obs"]
        )
        if self.is_rnn:
            # fused-sequence BPTT (LSTMCore.seq): ONE x-projection matmul
            # for all seq steps + LN/MLP/heads on the stacked outputs;
            # only the recurrent matmul scans. Mirrors the rollout's
            # episode-boundary hidden reset via mb["done"].
            hidden = (mb["hidden_h"], mb["hidden_c"])
            mu, log_std, v_pred_n = self.net.apply(
                params["ac"], x, hidden, mb["done"],
                method=type(self.net).seq,
            )
            log_std = jnp.broadcast_to(log_std, mu.shape)
        else:
            mu, log_std, v_pred_n = self.net.apply(params["ac"], x)

        logp = gaussian_logprob(mu, log_std, mb["action"])
        ratio = jnp.exp(logp - mb["logp"])
        adv = mb["adv"]
        if cfg.normalize_advantage:
            adv = (adv - advs_mean) / (advs_std + 1e-8)
        surr1 = adv * ratio
        surr2 = adv * jnp.clip(ratio, 1 - cfg.e_clip, 1 + cfg.e_clip)
        actor_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        if self.use_cv:
            # the critic is the separate central-value network, trained by
            # _cv_update with its own optimizer/minibatching (rl_games
            # CentralValueTrain) — the actor update carries no critic term.
            # actor_aux_value_loss additionally trains the actor's own
            # (GAE-unused) value head on returns as an auxiliary task:
            # without it the shared trunk learns from the policy gradient
            # alone and FF/LSTM goal-seeking stalls (tools/ff_ablate.py
            # r4 bisection: no-CV 0.91 vs CV 0.43 at 1500 epochs with
            # near-identical critic explained variance)
            if cfg.actor_aux_value_loss:
                if cfg.normalize_value:
                    tgt_n = ts.value_norm.normalize(mb["ret"], clip=jnp.inf)
                else:
                    tgt_n = mb["ret"]
                critic_loss = 0.5 * jnp.mean((v_pred_n - tgt_n) ** 2)
            else:
                critic_loss = jnp.zeros(())
        else:
            critic_loss = 0.5 * jnp.mean(
                self._value_loss(v_pred_n, mb["value"], mb["ret"], ts)
            )

        entropy = jnp.mean(gaussian_entropy(log_std))
        b_high = jnp.clip(mu - 1.1, 0.0, None) ** 2
        b_low = jnp.clip(mu + 1.1, None, 0.0) ** 2
        bounds_loss = jnp.mean(jnp.sum(b_high + b_low, axis=-1))

        total = (
            actor_loss
            + cfg.critic_coef * critic_loss
            - cfg.entropy_coef * entropy
            + cfg.bounds_loss_coef * bounds_loss
        )
        kl = jnp.mean(gaussian_kl(mb["mu"], mb["log_std"], mu, log_std))
        aux = dict(
            actor_loss=actor_loss,
            critic_loss=critic_loss,
            entropy=entropy,
            bounds_loss=bounds_loss,
            kl=kl,
        )
        return total, aux

    def _value_loss(self, v_pred_n, v_old, ret, ts):
        """Per-sample clipped value loss in normalized-value space (shared
        by the actor's critic head and the central value)."""
        cfg = self.cfg
        if cfg.normalize_value:
            target_n = ts.value_norm.normalize(ret, clip=jnp.inf)
            v_old_n = ts.value_norm.normalize(v_old, clip=jnp.inf)
        else:
            target_n = ret
            v_old_n = v_old
        if cfg.clip_value:
            v_clipped = v_old_n + jnp.clip(
                v_pred_n - v_old_n, -cfg.e_clip, cfg.e_clip
            )
            return jnp.maximum(
                (v_pred_n - target_n) ** 2, (v_clipped - target_n) ** 2
            )
        return (v_pred_n - target_n) ** 2

    def _cv_loss(self, cv_params, mb, ts):
        """Central-value loss over a minibatch (rl_games CentralValueTrain
        calc_gradients). RNN mode: fields are (B, seq, ...) sequences with
        stored initial hidden; the CV LSTM is re-run over each sequence."""
        cfg = self.cfg
        sx = (
            ts.states_norm.normalize(mb["states"])
            if cfg.normalize_input
            else mb["states"]
        )
        if self.is_cv_rnn:
            # fused-sequence BPTT (see _loss): one x-proj matmul + batched
            # trunk, recurrent matmul only in the scan
            hidden = (mb["cv_hidden_h"], mb["cv_hidden_c"])
            v_pred_n = self.cv_net.apply(
                cv_params, sx, hidden, mb["done"],
                method=type(self.cv_net).seq,
            )
        else:
            v_pred_n = self.cv_net.apply(cv_params, sx)
        return 0.5 * jnp.mean(
            self._value_loss(v_pred_n, mb["value"], mb["ret"], ts)
        )

    def _cv_update(self, ts: TrainState, dataset, num_slices):
        """cv_mini_epochs x cv_minibatch SGD on the central value with its
        own optimizer and FIXED cv_learning_rate (rl_games CentralValueTrain
        train_net; cfg/train/ShadowHandOpenAI_FFPPO.yaml:74-82)."""
        cfg = self.cfg
        grad_fn = jax.value_and_grad(self._cv_loss)
        lr = cfg.cv_learning_rate
        mb_slices = (
            max(cfg.cv_minibatch_size // cfg.seq_len, 1)
            if self.is_cv_rnn
            else cfg.cv_minibatch_size
        )
        mb_slices = min(mb_slices, num_slices)
        while num_slices % mb_slices:
            mb_slices -= 1
        num_mb = num_slices // mb_slices

        packed, unpack = _pack_dataset(dataset)

        def mb_update(carry, idx):
            cv_params, opt_state = carry
            # gather ONLY this minibatch's rows (shuffle the slice INDICES,
            # not the dataset: re-permuting the stored LSTM hidden — 2 x
            # 134 MB at 8192 envs — every mini-epoch was pure HBM traffic,
            # docs/performance.md recurrent-path profile); one wide-row
            # gather when the dataset packs (see _pack_dataset)
            if packed is not None:
                mb = unpack(packed[idx])
            else:
                mb = jax.tree.map(lambda x: x[idx], dataset)
            loss, grads = grad_fn(cv_params, mb, ts)
            gok = jnp.isfinite(optax.global_norm(grads))
            grads = jax.tree.map(
                lambda g: jnp.where(gok, g, jnp.zeros_like(g)), grads
            )
            updates, opt_state = self.cv_opt.update(
                grads, opt_state, cv_params
            )
            cv_params = jax.tree.map(
                lambda p, u: p - lr * u, cv_params, updates
            )
            return (cv_params, opt_state), jnp.nan_to_num(loss)

        def epoch_body(carry, idxs):
            return jax.lax.scan(mb_update, carry, idxs)

        rng, *keys = jax.random.split(ts.rng, cfg.cv_mini_epochs + 1)
        # all mini-epoch shuffles in ONE batched sort, hoisted out of the
        # scan (see _update for why); bitwise-identical permutations
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, num_slices)
        )(jnp.stack(keys))
        all_idxs = perms[:, : num_mb * mb_slices].reshape(
            cfg.cv_mini_epochs, num_mb, mb_slices
        )
        (cv_params, cv_opt_state), losses = jax.lax.scan(
            epoch_body,
            (ts.cv_params, ts.cv_opt_state),
            all_idxs,
        )
        ts = ts.replace(
            cv_params=cv_params, cv_opt_state=cv_opt_state, rng=rng
        )
        return ts, jnp.mean(losses)

    def _adapt_lr(self, lr, kl):
        cfg = self.cfg
        return jnp.where(
            kl > 2.0 * cfg.kl_threshold,
            jnp.maximum(lr / 1.5, cfg.lr_min),
            jnp.where(
                kl < 0.5 * cfg.kl_threshold,
                jnp.minimum(lr * 1.5, cfg.lr_max),
                lr,
            ),
        )

    def _update(self, ts: TrainState, dataset, advs_mean, advs_std,
                num_slices, mb_slices):
        """mini_epochs x minibatch SGD with adaptive-KL LR ('legacy'
        schedule: check per update, x/÷1.5 on 2x threshold). `dataset`
        fields have leading axis num_slices (transitions, or sequences in
        RNN mode); each minibatch takes mb_slices of them."""
        cfg = self.cfg
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        packed, unpack = _pack_dataset(dataset)

        def mb_update(carry, idx):
            params, opt_state, lr = carry
            # ONE wide-row gather per minibatch when the dataset packs
            # (FF path), else per-field gathers (RNN path) — see
            # _pack_dataset for why
            if packed is not None:
                mb = unpack(packed[idx])
            else:
                mb = jax.tree.map(lambda x: x[idx], dataset)
            (loss, aux), grads = grad_fn(params, mb, ts, advs_mean, advs_std)
            # non-finite-gradient guard: skip the update rather than poison
            # Adam state (a single exploded env would otherwise end training)
            gok = jnp.isfinite(optax.global_norm(grads))
            grads = jax.tree.map(
                lambda g: jnp.where(gok, g, jnp.zeros_like(g)), grads
            )
            aux = jax.tree.map(lambda a: jnp.nan_to_num(a), aux)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
            if cfg.lr_schedule == "adaptive" and cfg.schedule_type == "legacy":
                lr = self._adapt_lr(lr, aux["kl"])
            aux["loss"] = loss
            return (params, opt_state, lr), aux

        num_mb = num_slices // mb_slices

        def epoch_body(carry, idxs):
            params, opt_state, lr = carry
            (params, opt_state, lr), aux = jax.lax.scan(
                mb_update, (params, opt_state, lr), idxs
            )
            if cfg.lr_schedule == "adaptive" and cfg.schedule_type == "standard":
                # rl_games schedule_type standard: one LR update per
                # mini-epoch on the mean KL of its minibatches
                lr = self._adapt_lr(lr, jnp.mean(aux["kl"]))
            return (params, opt_state, lr), aux

        rng, *keys = jax.random.split(ts.rng, cfg.mini_epochs + 1)
        # hoist the mini-epoch shuffles out of the scan as ONE batched sort:
        # jax.random.permutation sorts random keys (O(n log n) with poor TPU
        # constants — 262k-element sorts are milliseconds); inside the scan
        # they serialize, vmapped they run as a single (mini_epochs, n)
        # batched sort. Same keys + same permutation function => bitwise-
        # identical minibatch order to the in-scan form.
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, num_slices)
        )(jnp.stack(keys))
        all_idxs = perms[:, : num_mb * mb_slices].reshape(
            cfg.mini_epochs, num_mb, mb_slices
        )
        (params, opt_state, lr), aux = jax.lax.scan(
            epoch_body,
            (ts.params, ts.opt_state, ts.lr),
            all_idxs,
        )
        ts = ts.replace(params=params, opt_state=opt_state, lr=lr, rng=rng)
        aux = jax.tree.map(jnp.mean, aux)
        return ts, aux

    # ------------------------------------------------------------------
    def _epoch(self, ts: TrainState):
        cfg = self.cfg
        ts, traj, last_value, stats = self._rollout(ts)
        advs, returns = self._gae(traj, last_value)
        traj = dict(traj, adv=advs, ret=returns)

        # value norm updates BEFORE the SGD phase (it normalizes the value
        # TARGETS, rl_games updates its value RMS on the fresh returns);
        # the obs/states norms update AFTER it — see below
        if cfg.normalize_value:
            ts = ts.replace(value_norm=ts.value_norm.update(returns))

        T = cfg.horizon_length
        N = self.env.num_envs
        hid_keys = {"hidden_h", "hidden_c", "cv_hidden_h", "cv_hidden_c"}
        if self.is_rnn:
            # sequence slices: (T, N, ...) -> (T/seq * N, seq, ...);
            # hidden fields keep only each sequence's initial state
            seq = cfg.seq_len
            nch = T // seq

            def to_seq(x):
                x = x.reshape((nch, seq, N) + x.shape[2:])
                x = jnp.moveaxis(x, 2, 0)  # (N, nch, seq, ...)
                return x.reshape((N * nch, seq) + x.shape[3:])

            def hid_start(x):
                # rollout already stores hidden sequence-major: (nch, N, H)
                # chunk-start states only
                return jnp.moveaxis(x, 1, 0).reshape((N * nch, -1))

            skip = hid_keys | {"reward", "done", "states"}
            dataset = {
                k: to_seq(v) for k, v in traj.items() if k not in skip
            }
            # per-step done: the BPTT replay must reset hidden at episode
            # boundaries exactly like the rollout did, or replayed mu
            # diverges on every chunk containing a done -> irreducible
            # KL floor ~0.03 -> the adaptive LR rails at lr_min (the r3
            # LSTM stall: lr pinned at 1e-6 from epoch 400)
            dataset["done"] = to_seq(traj["done"])
            for k in ("hidden_h", "hidden_c"):
                dataset[k] = hid_start(traj[k])
            num_slices = N * nch
            mb_slices = max(cfg.minibatch_size // seq, 1)
            mb_slices = min(mb_slices, num_slices)
            while num_slices % mb_slices:
                mb_slices -= 1
            if self.use_cv:
                cv_dataset = {
                    k: to_seq(traj[k]) for k in ("states", "value", "ret")
                }
                if self.is_cv_rnn:
                    cv_dataset["done"] = dataset["done"]
                    for k in ("cv_hidden_h", "cv_hidden_c"):
                        cv_dataset[k] = hid_start(traj[k])
                cv_slices = num_slices
        else:
            flat = lambda x: x.reshape((T * N,) + x.shape[2:])
            skip = {"reward", "done", "states"}
            dataset = {
                k: flat(v) for k, v in traj.items() if k not in skip
            }
            num_slices = T * N
            mb_slices = min(cfg.minibatch_size, num_slices)
            while num_slices % mb_slices:
                mb_slices -= 1
            if self.use_cv:
                cv_dataset = {
                    k: flat(traj[k]) for k in ("states", "value", "ret")
                }
                cv_slices = num_slices

        advs_mean = jnp.mean(advs)
        advs_std = jnp.std(advs)
        if self.use_cv:
            # central value first (rl_games train_epoch order), then actor
            ts, cv_loss = self._cv_update(ts, cv_dataset, cv_slices)
        ts, aux = self._update(
            ts, dataset, advs_mean, advs_std, num_slices, mb_slices
        )
        if self.use_cv:
            aux["cv_loss"] = cv_loss
        # obs/states running norms update AFTER the SGD phase: the replay
        # then normalizes with the SAME stats the rollout used, so the
        # stored behavior logp is the true replay logp and the PPO ratio
        # starts exactly at 1. NOTE: this is a deliberate DEVIATION from
        # rl_games (which runs the model in train mode during
        # calc_gradients, so its obs RMS updates per-minibatch DURING SGD
        # and each sample moves the stats mini_epochs times); here the RMS
        # sees each sample once per epoch and the updated stats apply from
        # the NEXT rollout.
        # Updating before the SGD phase made the norm shift masquerade as
        # policy KL — on the DR-noised ShadowHandOpenAI variants the shift
        # never converged and pinned the adaptive LR at its floor; the
        # earlier fix (re-evaluating the behavior policy under the updated
        # norm) restored ratio=1 but biased the importance weights and
        # destabilized the LSTM run.
        if cfg.normalize_input:
            ts = ts.replace(obs_norm=ts.obs_norm.update(traj["obs"]))
            if self.use_cv:
                ts = ts.replace(
                    states_norm=ts.states_norm.update(traj["states"])
                )
        ts = ts.replace(epoch=ts.epoch + 1)
        # fold this window's completed episodes into the ~100-episode
        # running means (incremental mean with the window capped at 100,
        # matching rl_games AverageMeter(games_to_track=100))
        cnt = stats["fin_cnt"]
        tracked = jnp.minimum(ts.games + cnt, 100.0)
        # w capped at 1: with >100 episode ends in one window (short episodes
        # early in training) an uncapped cnt/tracked > 1 turns the
        # incremental mean into a diverging over-relaxation
        # (m' = (1-w)m + wx, |1-w| > 1 -> alternating-sign blowup -> nan)
        w = jnp.where(
            cnt > 0, jnp.minimum(cnt / jnp.maximum(tracked, 1.0), 1.0), 0.0
        )
        batch_ret = stats["fin_ret"] / jnp.maximum(cnt, 1)
        batch_len = stats["fin_len"] / jnp.maximum(cnt, 1)
        ts = ts.replace(
            score_mean=ts.score_mean + w * (batch_ret - ts.score_mean),
            len_mean=ts.len_mean + w * (batch_len - ts.len_mean),
            games=tracked,
        )
        metrics = dict(
            mean_ep_reward=ts.score_mean,
            mean_ep_length=ts.len_mean,
            episodes=stats["fin_cnt"],
            mean_step_reward=jnp.mean(traj["reward"]),
            # critic quality: EV of the rollout value estimates vs realized
            # GAE returns (1 = perfect, 0 = no better than the mean)
            explained_variance=1.0
            - jnp.var(traj["ret"] - traj["value"])
            / (jnp.var(traj["ret"]) + 1e-8),
            lr=ts.lr,
            **aux,
        )
        # task episode metrics (reference extras -> RLGPUAlgoObserver):
        # mean over envs of EnvState.metrics
        for k, v in ts.es.metrics.items():
            tag = k if "/" in k else "Episode/" + k
            metrics[tag] = jnp.mean(v)
        # cross-env task statistics (e.g. consecutive_successes EMA)
        if isinstance(ts.task_stats, dict):
            for k, v in ts.task_stats.items():
                metrics[k if "/" in k else "Episode/" + k] = v
        return ts, metrics

    # ------------------------------------------------------------------
    def _env_state_tree(self):
        """The per-env training state a resume needs for CONTINUITY, not
        just correctness: mid-episode phys/carry state (e.g. AnymalTerrain's
        per-env curriculum level lives in es.carry), RNN hiddens, running
        episode stats and the task's cross-env EMAs (the hands'
        consecutive-success tracker). Without it, a watchdog resume
        restarts every episode at curriculum level 0 with zeroed EMAs —
        the r5 two-phase terrain experiment lost ~5.7 levels to exactly
        this."""
        return dict(
            es=self.state.es,
            rng=self.state.rng,
            hidden=self.state.hidden,
            cv_hidden=self.state.cv_hidden,
            ep_ret=self.state.ep_ret,
            ep_len=self.state.ep_len,
            score_mean=self.state.score_mean,
            len_mean=self.state.len_mean,
            games=self.state.games,
            task_stats=self.state.task_stats,
        )

    @staticmethod
    def _pad_zero_size(tree):
        """Orbax rejects zero-size arrays; swap them for (1,) placeholders
        (structure preserved — the loader grafts the originals back)."""
        return jax.tree.map(
            lambda x: jnp.zeros((1,), jnp.float32)
            if getattr(x, "size", 1) == 0 else x,
            tree,
        )

    def save(self, path: str):
        """Checkpoint params + normalizers + progress (reference: rl_games
        .pth under runs/<experiment>/nn, README.md:82-120; here Orbax).
        Env continuity state goes to a sibling `<path>_env` directory so
        the main checkpoint keeps its r1-r5 structure (old checkpoints
        stay loadable, new checkpoints stay loadable by structure-pinned
        tools)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        payload = dict(
            params=self.state.params,
            opt_state=self.state.opt_state,
            obs_norm=self.state.obs_norm,
            value_norm=self.state.value_norm,
            lr=self.state.lr,
            epoch=self.state.epoch,
        )
        if self.env.num_states > 0:
            # orbax rejects zero-size arrays; states_norm is (0,) when the
            # task has no asymmetric-critic states
            payload["states_norm"] = self.state.states_norm
        if self.use_cv:
            payload["cv_params"] = self.state.cv_params
            payload["cv_opt_state"] = self.state.cv_opt_state
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.save(
            path + "_env", self._pad_zero_size(self._env_state_tree()),
            force=True,
        )

    def load(self, path: str):
        """Resume from a checkpoint (reference `checkpoint=` CLI arg)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        target = dict(
            params=self.state.params,
            opt_state=self.state.opt_state,
            obs_norm=self.state.obs_norm,
            value_norm=self.state.value_norm,
            lr=self.state.lr,
            epoch=self.state.epoch,
        )
        if self.env.num_states > 0:
            target["states_norm"] = self.state.states_norm
        if self.use_cv:
            target["cv_params"] = self.state.cv_params
            target["cv_opt_state"] = self.state.cv_opt_state
        # restore every leaf to host numpy: platform-independent (a
        # checkpoint written on TPU loads on CPU and vice versa) and
        # UNCOMMITTED, so the next jitted dispatch is free to place/shard
        # it to match the env state (orbax's default restores to the
        # recorded device, which may not exist here; committed
        # single-device arrays would clash with mesh-sharded state)
        import numpy as np

        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        try:
            payload = ckptr.restore(
                path, item=target, restore_args=restore_args
            )
        except Exception as primary_err:
            if not self.is_rnn:
                raise
            # r1-r4 LSTM checkpoint (per-gate OptimizedLSTMCell + auto-named
            # trunk): restore into the legacy-shaped template, then convert
            # to the fused LSTMCore layout. If the legacy attempt ALSO
            # fails, re-raise the ORIGINAL error — a truncated/corrupt
            # current-format checkpoint must not masquerade as a legacy-
            # structure mismatch (it would send the operator debugging the
            # wrong thing)
            legacy = _downgrade_lstm_target(target)
            legacy_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), legacy
            )
            try:
                payload = _upgrade_legacy_lstm(
                    ckptr.restore(path, item=legacy, restore_args=legacy_args)
                )
            except Exception:
                raise primary_err
        self.state = self.state.replace(**payload)
        self._load_env_state(path + "_env")

    def _load_env_state(self, env_path: str):
        """Restore per-env continuity state from the `<ckpt>_env` sidecar
        if present and shape-compatible; otherwise keep fresh envs (old
        checkpoints, or a resume at a different num_envs)."""
        import numpy as np
        import orbax.checkpoint as ocp

        if not os.path.isdir(env_path):
            return
        template = self._env_state_tree()
        padded = self._pad_zero_size(template)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), padded
        )
        try:
            restored = ocp.PyTreeCheckpointer().restore(
                env_path, item=padded, restore_args=restore_args
            )
        except Exception as e:  # structure/shape mismatch -> fresh envs
            print(f"env-state sidecar ignored ({type(e).__name__}): "
                  f"envs restart fresh")
            return
        # orbax restores the SAVED shapes — a sidecar from a different
        # num_envs must not be grafted onto this trainer
        shapes_ok = jax.tree.all(jax.tree.map(
            lambda t, r: jnp.shape(t) == jnp.shape(r), padded, restored
        ))
        if not shapes_ok:
            print("env-state sidecar ignored (num_envs changed): "
                  "envs restart fresh")
            return
        # graft the zero-size originals back over their (1,) placeholders
        merged = jax.tree.map(
            lambda t, r: t if getattr(t, "size", 1) == 0 else r,
            template, restored,
        )
        self.state = self.state.replace(**merged)
        print("env state restored (episodes/curriculum/EMAs continue)")

    # ------------------------------------------------------------------
    def train(
        self,
        max_epochs: Optional[int] = None,
        log_every: int = 10,
        log_fn=print,
        score_target: Optional[float] = None,
        save_dir: Optional[str] = None,
        save_frequency: int = 50,
        save_best_after: int = 100,
        writer=None,
        profile_dir: Optional[str] = None,
        profile_start: int = 3,
        profile_epochs: int = 2,
        epochs_per_jit: int = 1,
        history_path: Optional[str] = None,
    ):
        """Python driver loop over jitted epoch chunks.

        epochs_per_jit > 1 runs that many epochs inside ONE XLA program
        (lax.scan over the epoch body): per-epoch metrics come back stacked
        in a single device->host transfer, so both the fixed per-dispatch
        cost of the tunneled TPU runtime (~25 ms) and the metrics fetch
        amortize across the chunk. Per-epoch log lines are preserved;
        checkpoints land at chunk boundaries.

        save_dir/save_frequency/save_best_after mirror the rl_games
        checkpointing scheme (cfg/train/*PPO.yaml); `writer` is an optional
        metrics writer with .add_scalar(tag, value, step) (TensorBoard-like,
        reference utils/rlgames/rlgames_utils.py:67-91). profile_dir captures
        a jax.profiler device trace of `profile_epochs` post-warmup epochs
        (view with tensorboard-plugin-profile / xprof; the reference has no
        tracing story, SURVEY.md §5 — here it is first-class)."""
        max_epochs = max_epochs or self.cfg.max_epochs
        history = []
        steps_per_epoch = self.cfg.horizon_length * self.env.num_envs
        best_reward = -float("inf")
        # Resume support: a loaded checkpoint carries its epoch counter, so
        # training continues from there instead of restarting at 0 (the
        # reference's `checkpoint=` resume, README.md:82-103). Prior history
        # rows (strictly before the resume epoch) are preserved so
        # runs/<T>/history.json stays one continuous learning curve.
        start_epoch = int(jax.device_get(self.state.epoch))
        if start_epoch > 0 and history_path and os.path.exists(history_path):
            try:
                with open(history_path) as f:
                    prior = json.load(f)
                history = [m for m in prior if m.get("epoch", 0) < start_epoch]
                past_best = [
                    m["mean_ep_reward"]
                    for m in history
                    if m.get("epoch", 0) >= save_best_after
                    and m.get("episodes", 1) > 0
                ]
                if past_best:
                    best_reward = max(past_best)
            except (json.JSONDecodeError, OSError):
                pass
        # the authoritative best-so-far is the sidecar written next to
        # nn/best: best-checkpoint candidates are CHUNK-FINAL epochs, which
        # with log_every>1 are mostly absent from history.json, so the
        # history-derived max above under-estimates and a resumed run could
        # overwrite nn/best with a worse policy
        if start_epoch > 0 and save_dir:
            try:
                with open(os.path.join(save_dir, "best_meta.json")) as f:
                    best_reward = max(
                        best_reward, float(json.load(f)["best_reward"])
                    )
            except (OSError, json.JSONDecodeError, KeyError, ValueError):
                pass
        if start_epoch > 0 and log_fn:
            log_fn(f"resuming at epoch {start_epoch} ({len(history)} prior rows)")
        K = max(1, int(epochs_per_jit))
        chunk_jits = {1: self._epoch_jit}

        def chunk_fn(k):
            fn = chunk_jits.get(k)
            if fn is None:
                fn = jax.jit(
                    lambda ts: jax.lax.scan(
                        lambda t, _: self._epoch(t), ts, None, length=k
                    )
                )
                chunk_jits[k] = fn
            return fn

        profile_stop = profile_start + profile_epochs - 1
        prof_started = prof_stopped = False
        t_log = time.time()
        epoch = start_epoch
        stop = False
        while epoch < max_epochs and not stop:
            k = min(K, max_epochs - epoch)
            if (
                profile_dir is not None and not prof_started
                and epoch + k > profile_start
            ):
                jax.block_until_ready(self.state.params)
                jax.profiler.start_trace(profile_dir)
                prof_started = True
            self.state, metrics = chunk_fn(k)(self.state)
            if prof_started and not prof_stopped and epoch + k > profile_stop:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                prof_stopped = True

            # ONE device->host transfer for the chunk's stacked metrics —
            # per-key float() costs a full round-trip each (25 ms over the
            # tunneled TPU runtime; it used to dominate epoch time)
            rows = jax.device_get(metrics)
            if k == 1:
                per_epoch = [{kk: float(v) for kk, v in rows.items()}]
            else:
                per_epoch = [
                    {kk: float(v[i]) for kk, v in rows.items()}
                    for i in range(k)
                ]
            now = time.time()
            # windowed rate over this chunk (a cumulative average never
            # sheds the one-off compile time)
            rate = k * steps_per_epoch / (now - t_log)
            t_log = now
            for i, m in enumerate(per_epoch):
                e = epoch + i
                m["epoch"] = e
                m["env_steps"] = (e + 1) * steps_per_epoch
                m["steps_per_sec"] = rate
                last = e == max_epochs - 1
                if e % log_every == 0 or last:
                    history.append(m)
                    if log_fn:
                        log_fn(
                            f"epoch {e:5d} | ep_rew {m['mean_ep_reward']:9.2f} "
                            f"| ep_len {m['mean_ep_length']:6.1f} "
                            f"| kl {m['kl']:.4f} | lr {m['lr']:.2e} "
                            f"| {m['steps_per_sec']:,.0f} steps/s"
                        )
                if writer is not None:
                    for tag, val in m.items():
                        if isinstance(val, float):
                            writer.add_scalar(
                                tag if "/" in tag else "train/" + tag,
                                val, m["env_steps"],
                            )
                if (
                    score_target is not None
                    and not stop
                    and m["mean_ep_reward"] >= score_target
                ):
                    stop = True
                    if not (e % log_every == 0 or last):
                        history.append(m)  # record the stopping epoch
            boundary = (epoch + k) // save_frequency > epoch // save_frequency
            if history_path:
                # incremental dump EVERY chunk (cheap json of appended rows):
                # a campaign run killed by `timeout`/watchdog mid-interval
                # still leaves its learning curve behind for LEARNING.json
                with open(history_path, "w") as f:
                    json.dump(history, f)
            if save_dir:
                if boundary:
                    self.save(os.path.join(save_dir, "last"))
                m_last = per_epoch[-1]
                if (
                    epoch + k - 1 >= save_best_after
                    and m_last["episodes"] > 0
                    and m_last["mean_ep_reward"] > best_reward
                ):
                    best_reward = m_last["mean_ep_reward"]
                    self.save(os.path.join(save_dir, "best"))
                    with open(
                        os.path.join(save_dir, "best_meta.json"), "w"
                    ) as f:
                        json.dump(
                            {
                                "best_reward": best_reward,
                                "epoch": epoch + k - 1,
                            },
                            f,
                        )
            epoch += k
        return history
