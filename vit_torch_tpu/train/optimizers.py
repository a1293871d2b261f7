"""Optimizer registry.

Capability parity with the reference's ``Network.optimizer_fns``
(``utils_network.py:119-126``): sgd (momentum 0.9), adam, adadelta, adagrad,
adamw, adabelief — selected by the ``--opt`` flag.

Built on optax.  The LR enters through ``optax.inject_hyperparams`` so the
trainer can update it per epoch (the LambdaLR-equivalent) without rebuilding
optimizer state.  AdaBelief uses the reference's eps=1e-16/betas(0.9,0.999);
optax's adabelief is the decoupled (non-rectified) variant — the reference's
``rectify=True`` warm-up rectification is approximated by the schedule.
Adadelta's torch default lr is 1.0-scaled; optax.adadelta matches semantics.
"""

from __future__ import annotations

from typing import Callable, Dict

import optax


def _sgd(lr):
    return optax.sgd(lr, momentum=0.9)


def _adam(lr):
    return optax.adam(lr)


def _adadelta(lr):
    return optax.adadelta(lr)


def _adagrad(lr):
    return optax.adagrad(lr)


def _adamw(lr):
    return optax.adamw(lr)


def _adabelief(lr):
    return optax.adabelief(lr, b1=0.9, b2=0.999, eps=1e-16)


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
