"""Optimizer registry.

Capability parity with the reference's ``Network.optimizer_fns``
(``utils_network.py:119-126``): sgd (momentum 0.9), adam, adadelta, adagrad,
adamw, adabelief — selected by the ``--opt`` flag.

Built on optax, with defaults pinned to the torch semantics the reference
actually trains with (trajectory-parity-tested against torch in
``tests/test_torch_trajectory.py``):

- ``adagrad``: torch defaults (initial accumulator 0, eps 1e-10) — optax's
  own defaults (0.1 / 1e-7) diverge from torch.
- ``adamw``: torch's default decoupled weight decay 0.01 (the reference
  constructs ``optim.AdamW`` with no explicit wd).
- ``adabelief``: the reference uses the adabelief-pytorch package with
  ``eps=1e-16, betas=(0.9, 0.999), weight_decouple=True, rectify=True`` —
  :func:`rectified_adabelief` below implements the paper's Algorithm 2
  (variance-rectified update, SGD-with-momentum fallback while the SMA
  rho_t <= 4) which optax's non-rectified ``adabelief`` does not.

The LR enters through ``optax.inject_hyperparams`` so the trainer can update
it per epoch (the LambdaLR-equivalent) without rebuilding optimizer state.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class AdaBeliefState(NamedTuple):
    count: chex.Array            # scalar int32 step counter
    m: optax.Updates             # first moment
    s: optax.Updates             # belief (centered second moment)


def rectified_adabelief(learning_rate: float, b1: float = 0.9,
                        b2: float = 0.999,
                        eps: float = 1e-16) -> optax.GradientTransformation:
    """AdaBelief with variance rectification (paper Algorithm 2; the
    reference's ``AdaBelief(eps=1e-16, betas=(0.9, 0.999), rectify=True)``,
    ``utils_network.py:125``).

    s_t accumulates the *belief* ``(g - m)^2 + eps``; while the SMA length
    rho_t <= 4 the step degenerates to bias-corrected momentum SGD
    (``degenerated_to_sgd=True`` package default), after which the
    RAdam-style rectification term r_t scales the adaptive step.
    """

    def init(params):
        return AdaBeliefState(
            count=jnp.zeros([], jnp.int32),
            m=jax.tree.map(jnp.zeros_like, params),
            s=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        t = state.count + 1
        tf = t.astype(jnp.result_type(float))
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                         state.m, grads)
        s = jax.tree.map(lambda s_, g, m_: b2 * s_ + (1 - b2) * (g - m_) ** 2
                         + eps, state.s, grads, m)
        bc1 = 1 - b1 ** tf
        bc2 = 1 - b2 ** tf
        rho_inf = 2.0 / (1.0 - b2) - 1.0
        rho_t = rho_inf - 2.0 * tf * (b2 ** tf) / bc2
        safe_rho = jnp.maximum(rho_t, 4.0 + 1e-6)
        r_t = jnp.sqrt(((safe_rho - 4.0) * (safe_rho - 2.0) * rho_inf)
                       / ((rho_inf - 4.0) * (rho_inf - 2.0) * safe_rho))
        use_rect = rho_t > 4.0

        def upd(m_, s_):
            adaptive = r_t * (m_ / bc1) / (jnp.sqrt(s_ / bc2) + eps)
            momentum_sgd = m_ / bc1
            return -learning_rate * jnp.where(use_rect, adaptive,
                                              momentum_sgd)

        updates = jax.tree.map(upd, m, s)
        return updates, AdaBeliefState(count=t, m=m, s=s)

    return optax.GradientTransformation(init, update)


def _sgd(lr):
    return optax.sgd(lr, momentum=0.9)


def _adam(lr):
    return optax.adam(lr)


def _adadelta(lr):
    return optax.adadelta(lr)


def torch_adagrad(learning_rate: float,
                  eps: float = 1e-10) -> optax.GradientTransformation:
    """Adagrad with torch's update rule ``g / (sqrt(acc) + eps)`` — optax's
    ``adagrad`` puts eps *inside* the sqrt (``g / sqrt(acc + eps)``), which
    measurably diverges from torch trajectories; torch defaults are
    initial accumulator 0 and eps 1e-10."""

    def init(params):
        return {"acc": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params=None):
        del params
        acc = jax.tree.map(lambda a, g: a + g * g, state["acc"], grads)
        updates = jax.tree.map(
            lambda g, a: -learning_rate * g / (jnp.sqrt(a) + eps), grads, acc)
        return updates, {"acc": acc}

    return optax.GradientTransformation(init, update)


def _adagrad(lr):
    return torch_adagrad(lr)


def _adamw(lr):
    # torch AdamW default weight_decay=0.01 (the reference passes none)
    return optax.adamw(lr, weight_decay=0.01)


def _adabelief(lr):
    return rectified_adabelief(lr, b1=0.9, b2=0.999, eps=1e-16)


OPTIMIZERS: Dict[str, Callable] = {
    "sgd": _sgd,
    "adam": _adam,
    "adadelta": _adadelta,
    "adagrad": _adagrad,
    "adamw": _adamw,
    "adabelief": _adabelief,
}


def get_optimizer(name: str = "sgd", lr: float = 0.001,
                  ) -> optax.GradientTransformation:
    """Build the optimizer with an injectable ``learning_rate`` hyperparam.

    Update the LR per epoch via
    ``opt_state.hyperparams['learning_rate'] = new_lr``.
    """
    if name not in OPTIMIZERS:
        raise ValueError(f"optimizer {name!r} is not supported! must be one of "
                         f"[ {' | '.join(OPTIMIZERS)} ]")
    return optax.inject_hyperparams(
        lambda learning_rate: OPTIMIZERS[name](learning_rate))(learning_rate=lr)
