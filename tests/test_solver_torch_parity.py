"""Numeric parity of the optimizer chain against torch.optim.

The reference builds per-param-group torch optimizers
(cubercnn/solver/build.py:49-66: SGD with momentum/nesterov and coupled L2
decay folded into the gradient, Adam/AdamW with eps=1e-2, optional
amsgrad; per-group weight_decay carries the norm/priors no-decay rules).
The optax chain in threedod/train/solver.py must reproduce that update
arithmetic step for step — decay *placement* (before the momentum trace /
moment accumulators for SGD+Adam, decoupled after the moments for AdamW)
is exactly where a silent divergence would change training dynamics while
every single-step smoke test stays green.

Strategy (the repo's converter-parity convention, CLAUDE.md): run N steps
of the real torch optimizer and of build_optimizer on the same params +
grad sequence and compare trajectories to ~1e-5. Constant-lr schedule
(warmup_iters=0, steps=()) isolates the update rule; the schedule itself
is covered by tests/test_train.py::TestSchedule.

The reference never enables gradient clipping (no SOLVER.CLIP_GRADIENTS
in any config -> detectron2 default ENABLED=False), so clip=0 is the
parity case; the clip>0 case certifies our global-norm knob against
torch.nn.utils.clip_grad_norm_ semantics.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from threedod.config import Config
from threedod.train.solver import _no_decay_mask, build_optimizer

N_STEPS = 7
WD = 1e-4


def _toy_params(key):
    """Same decay-rule coverage as tests/test_train.py: conv kernel (decay),
    bn scale/bias + priors (no decay), head kernel/bias (decay)."""
    ks = jax.random.split(key, 6)
    return {
        "trunk": {
            "conv": {"kernel": jax.random.normal(ks[0], (3, 3, 4, 8))},
            "bn": {"scale": jax.random.normal(ks[1], (8,)),
                   "bias": jax.random.normal(ks[2], (8,))},
        },
        "head": {"dense": {"kernel": jax.random.normal(ks[3], (8, 5)),
                           "bias": jax.random.normal(ks[4], (5,))}},
        "priors": {"z": jax.random.normal(ks[5], (5, 2))},
    }


def _grad_seq(params, n):
    seqs = []
    for i in range(n):
        k = jax.random.PRNGKey(1000 + i)
        leaves, treedef = jax.tree.flatten(params)
        gl = [
            jax.random.normal(jax.random.fold_in(k, j), p.shape)
            for j, p in enumerate(leaves)
        ]
        seqs.append(jax.tree.unflatten(treedef, gl))
    return seqs


def _torch_optimizer(opt_type, leaves, decay_flags, lr):
    groups = [
        {"params": [t], "weight_decay": WD if d else 0.0}
        for t, d in zip(leaves, decay_flags)
    ]
    if opt_type == "sgd":
        return torch.optim.SGD(groups, lr, momentum=0.9, nesterov=False)
    if opt_type == "sgd+nesterov":
        return torch.optim.SGD(groups, lr, momentum=0.9, nesterov=True)
    if opt_type == "adam":
        return torch.optim.Adam(groups, lr, eps=1e-2)
    if opt_type == "adam+amsgrad":
        return torch.optim.Adam(groups, lr, eps=1e-2, amsgrad=True)
    if opt_type == "adamw":
        return torch.optim.AdamW(groups, lr, eps=1e-2)
    if opt_type == "adamw+amsgrad":
        return torch.optim.AdamW(groups, lr, eps=1e-2, amsgrad=True)
    raise ValueError(opt_type)


@pytest.mark.parametrize(
    "opt_type,clip",
    [
        ("sgd", 0.0),
        ("sgd+nesterov", 0.0),
        ("sgd", 5.0),
        ("adam", 0.0),
        ("adam+amsgrad", 0.0),
        ("adamw", 0.0),
        ("adamw+amsgrad", 0.0),
    ],
)
def test_matches_torch_trajectory(opt_type, clip):
    lr = 0.02
    cfg = Config()
    cfg.solver = dataclasses.replace(
        cfg.solver,
        type=opt_type.replace("sgd+nesterov", "sgd"),
        nesterov="nesterov" in opt_type,
        clip_gradients=clip,
        weight_decay=WD,
        base_lr=lr,
        warmup_iters=0,
        steps=(),
    )
    params = _toy_params(jax.random.PRNGKey(0))
    grads = _grad_seq(params, N_STEPS)

    # ---- optax side -----------------------------------------------------
    opt, _ = build_optimizer(cfg, params)
    p = jax.tree.map(jnp.asarray, params)
    state = opt.init(p)
    for g in grads:
        u, state = opt.update(g, state, p)
        p = jax.tree.map(lambda a, b: a + b, p, u)

    # ---- torch side -----------------------------------------------------
    leaves = jax.tree.leaves(params)
    decay_flags = jax.tree.leaves(_no_decay_mask(params))
    tleaves = [
        torch.nn.Parameter(torch.tensor(np.asarray(l), dtype=torch.float64))
        for l in leaves
    ]
    topt = _torch_optimizer(opt_type, tleaves, decay_flags, lr)
    for g in grads:
        topt.zero_grad()
        for t, gl in zip(tleaves, jax.tree.leaves(g)):
            t.grad = torch.tensor(np.asarray(gl), dtype=torch.float64)
        if clip > 0:
            torch.nn.utils.clip_grad_norm_(tleaves, clip)
        topt.step()

    for ours, theirs in zip(jax.tree.leaves(p), tleaves):
        np.testing.assert_allclose(
            np.asarray(ours),
            theirs.detach().numpy(),
            rtol=2e-5,
            atol=2e-6,
            err_msg=f"{opt_type} clip={clip} diverged from torch.optim",
        )
