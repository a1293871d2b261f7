"""Torch trajectory-parity tests for the training engine.

The reference's accuracy gate ("top-1 within 0.3%") depends on the
*training trajectory* — optimizer update rules, weight-decay coupling and
LR-schedule folding — matching torch semantics, not just the forward pass.
These tests build the same tiny MLP in torch and in jax from identical
weights, feed identical batches, run several epochs of each optimizer in
the registry (reference ``utils_network.py:119-126``) and each LR schedule
(``utils_network.py:35-73,529-544``), and assert the parameter and loss
trajectories agree to fp64 tolerance.

The AdaBelief torch side is an independent test-local implementation of
the paper's Algorithm 2 (the adabelief-pytorch package the reference
imports is not installable here); both sides follow the same published
spec, so the test pins the product implementation to it.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vit_torch_tpu.train.optimizers import OPTIMIZERS, get_optimizer
from vit_torch_tpu.train.schedules import get_lr_factor_fn

D_IN, D_H, D_OUT = 8, 16, 4
BS, N_EPOCHS, STEPS_PER_EPOCH = 8, 8, 3
BASE_LR = 0.05


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _make_data(seed=0):
    rng = np.random.default_rng(seed)
    n = N_EPOCHS * STEPS_PER_EPOCH
    xs = rng.normal(0, 1, (n, BS, D_IN)).astype(np.float64)
    ys = rng.integers(0, D_OUT, (n, BS)).astype(np.int64)
    return xs, ys


def _make_weights(seed=1):
    rng = np.random.default_rng(seed)
    return {
        "w1": rng.normal(0, 0.3, (D_IN, D_H)),
        "b1": np.zeros(D_H),
        "w2": rng.normal(0, 0.3, (D_H, D_OUT)),
        "b2": np.zeros(D_OUT),
    }


# --------------------------------------------------------------- jax side
def _jax_forward(params, x):
    h = jnp.maximum(x @ params["w1"] + params["b1"], 0.0)
    return h @ params["w2"] + params["b2"]


def _jax_loss(params, x, y):
    logits = _jax_forward(params, x)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))


def _run_jax(opt_name, xs, ys, weights, factor_fn=None, tx=None):
    params = {k: jnp.asarray(v) for k, v in weights.items()}
    if tx is None:
        tx = get_optimizer(opt_name, lr=BASE_LR)
    opt_state = tx.init(params)
    grad_fn = jax.jit(jax.value_and_grad(_jax_loss))
    losses, step = [], 0
    for epoch in range(N_EPOCHS):
        if factor_fn is not None:
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                BASE_LR * factor_fn(epoch), jnp.float64)
        for _ in range(STEPS_PER_EPOCH):
            loss, grads = grad_fn(params, jnp.asarray(xs[step]),
                                  jnp.asarray(ys[step]))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            losses.append(float(loss))
            step += 1
    return params, losses


# ------------------------------------------------------------- torch side
class _TorchNet(torch.nn.Module):
    def __init__(self, weights):
        super().__init__()
        self.fc1 = torch.nn.Linear(D_IN, D_H).double()
        self.fc2 = torch.nn.Linear(D_H, D_OUT).double()
        with torch.no_grad():
            self.fc1.weight.copy_(torch.tensor(weights["w1"].T))
            self.fc1.bias.copy_(torch.tensor(weights["b1"]))
            self.fc2.weight.copy_(torch.tensor(weights["w2"].T))
            self.fc2.bias.copy_(torch.tensor(weights["b2"]))

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


class _TorchAdaBelief:
    """Test-local AdaBelief (paper Algorithm 2): belief variance with
    eps added into s_t, RAdam rectification, bias-corrected-momentum SGD
    fallback while rho_t <= 4 (degenerated_to_sgd)."""

    def __init__(self, params, lr, b1=0.9, b2=0.999, eps=1e-16):
        self.params = list(params)
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.t = 0
        self.m = [torch.zeros_like(p) for p in self.params]
        self.s = [torch.zeros_like(p) for p in self.params]

    def zero_grad(self):
        for p in self.params:
            if p.grad is not None:
                p.grad.detach_()
                p.grad.zero_()

    @torch.no_grad()
    def step(self):
        self.t += 1
        b1, b2, eps, t = self.b1, self.b2, self.eps, self.t
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        rho_inf = 2.0 / (1.0 - b2) - 1.0
        rho_t = rho_inf - 2.0 * t * (b2 ** t) / bc2
        for p, m, s in zip(self.params, self.m, self.s):
            g = p.grad
            m.mul_(b1).add_(g, alpha=1 - b1)
            s.mul_(b2).addcmul_(g - m, g - m, value=1 - b2).add_(eps)
            if rho_t > 4.0:
                r_t = math.sqrt(((rho_t - 4) * (rho_t - 2) * rho_inf)
                                / ((rho_inf - 4) * (rho_inf - 2) * rho_t))
                denom = (s / bc2).sqrt().add_(eps)
                p.add_(-self.lr * r_t * (m / bc1) / denom)
            else:
                p.add_(-self.lr * (m / bc1))


def _make_torch_opt(name, net):
    if name == "sgd":
        return torch.optim.SGD(net.parameters(), lr=BASE_LR, momentum=0.9)
    if name == "adam":
        return torch.optim.Adam(net.parameters(), lr=BASE_LR)
    if name == "adadelta":
        return torch.optim.Adadelta(net.parameters(), lr=BASE_LR)
    if name == "adagrad":
        return torch.optim.Adagrad(net.parameters(), lr=BASE_LR)
    if name == "adamw":
        return torch.optim.AdamW(net.parameters(), lr=BASE_LR)
    if name == "adabelief":
        return _TorchAdaBelief(net.parameters(), lr=BASE_LR)
    raise ValueError(name)


def _run_torch(opt_name, xs, ys, weights, factor_fn=None, opt_fn=None):
    net = _TorchNet(weights)
    opt = (opt_fn(net) if opt_fn is not None
           else _make_torch_opt(opt_name, net))
    loss_fn = torch.nn.CrossEntropyLoss()
    losses, step = [], 0
    for epoch in range(N_EPOCHS):
        if factor_fn is not None:
            lr = BASE_LR * factor_fn(epoch)
            groups = (opt.param_groups if hasattr(opt, "param_groups")
                      else None)
            if groups is not None:
                for gr in groups:
                    gr["lr"] = lr
            else:
                opt.lr = lr
        for _ in range(STEPS_PER_EPOCH):
            opt.zero_grad()
            out = net(torch.tensor(xs[step]))
            loss = loss_fn(out, torch.tensor(ys[step]))
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            step += 1
    params = {
        "w1": net.fc1.weight.detach().numpy().T,
        "b1": net.fc1.bias.detach().numpy(),
        "w2": net.fc2.weight.detach().numpy().T,
        "b2": net.fc2.bias.detach().numpy(),
    }
    return params, losses


def _assert_close(jax_params, jax_losses, torch_params, torch_losses,
                  tol=1e-10):
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=tol, atol=tol)
    for k in jax_params:
        np.testing.assert_allclose(np.asarray(jax_params[k]),
                                   torch_params[k], rtol=1e-8, atol=tol,
                                   err_msg=k)


@pytest.mark.parametrize("opt_name", sorted(OPTIMIZERS))
def test_optimizer_trajectory_matches_torch(opt_name, x64):
    """N epochs of each registry optimizer track torch step-for-step."""
    xs, ys = _make_data()
    weights = _make_weights()
    jp, jl = _run_jax(opt_name, xs, ys, weights)
    tp, tl = _run_torch(opt_name, xs, ys, weights)
    _assert_close(jp, jl, tp, tl)


@pytest.mark.parametrize("sched,kw", [
    ("step", dict(lr_step=3, lr_gamma=0.5)),
    ("exp", dict(lr_gamma=0.9)),
    ("cos", dict(lr_step=6, lr_scale=0.1)),
    ("cos_exp", dict(lr_step=6, lr_scale=0.1, lr_gamma=0.5)),
])
def test_schedule_trajectory_matches_torch(sched, kw, x64):
    """Per-epoch LR folding through adamw tracks torch LambdaLR semantics
    (lr = base * factor(epoch), stepped once per epoch)."""
    xs, ys = _make_data(seed=2)
    weights = _make_weights(seed=3)
    factor = get_lr_factor_fn(lr_scheduler=sched, **kw)
    jp, jl = _run_jax("adamw", xs, ys, weights, factor_fn=factor)
    tp, tl = _run_torch("adamw", xs, ys, weights, factor_fn=factor)
    _assert_close(jp, jl, tp, tl)


def test_schedule_factors_closed_form():
    """Schedule factor values pinned independently (reference
    ``LRSchedule`` semantics, utils_network.py:35-73)."""
    f = get_lr_factor_fn("step", lr_step=10, lr_gamma=0.5)
    assert f(0) == 1.0 and f(9) == 1.0 and f(10) == 0.5 and f(25) == 0.25
    f = get_lr_factor_fn("exp", lr_gamma=0.9)
    assert abs(f(5) - 0.9 ** 5) < 1e-12
    f = get_lr_factor_fn("cos", lr_step=20, lr_scale=0.1)
    assert abs(f(0) - 1.0) < 1e-12
    assert abs(f(10) - 1.0) < 1e-12          # restart at step/2 epochs
    assert abs(f(5) - 0.55) < 1e-12          # quarter period: midpoint
    assert f(9) < 0.13                       # approaches min before restart
    f = get_lr_factor_fn("cos_exp", lr_step=20, lr_scale=0.1, lr_gamma=0.5)
    assert abs(f(0) - 1.0) < 1e-12
    assert abs(f(20) - 1.0 * 0.5) < 1e-12    # cos restarts × gamma^(e/step)


def test_coupled_wd_sgd_matches_torch(x64):
    """The detection recipe — SGD(momentum .9, weight_decay 5e-4) with
    torch's COUPLED decay (decay added to the gradient before momentum;
    reference object/coco_pipeline.py:464-476) — tracks torch."""
    import optax
    xs, ys = _make_data(seed=4)
    weights = _make_weights(seed=5)
    wd = 5e-4
    tx = optax.chain(optax.add_decayed_weights(wd),
                     optax.sgd(BASE_LR, momentum=0.9))
    jp, jl = _run_jax(None, xs, ys, weights, tx=tx)
    tp, tl = _run_torch(None, xs, ys, weights, opt_fn=lambda net:
                        torch.optim.SGD(net.parameters(), lr=BASE_LR,
                                        momentum=0.9, weight_decay=wd))
    _assert_close(jp, jl, tp, tl)
