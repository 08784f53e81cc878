"""Optimizer + LR schedule (optax), matching the reference training recipe:
AdamW lr 4e-4 wd 1e-4, OneCycle linear anneal (pct_start 0.05, total 100100),
global-norm gradient clip 10 (configs/refine_models/scflow.py:117-131)."""

from typing import Any, Dict, Optional

import optax


def onecycle_lr(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.05,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    anneal_strategy: str = "linear",
):
    """torch.optim.lr_scheduler.OneCycleLR semantics (linear or cos):
    warm up initial_lr -> max_lr over pct_start*total, then anneal to
    initial_lr/final_div_factor over the rest."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = max(int(pct_start * total_steps) - 1, 1)
    down_steps = max(total_steps - up_steps - 1, 1)
    if anneal_strategy == "linear":
        up = optax.linear_schedule(initial_lr, max_lr, up_steps)
        down = optax.linear_schedule(max_lr, min_lr, down_steps)
    else:
        up = optax.cosine_decay_schedule(initial_lr, up_steps, alpha=max_lr / initial_lr)
        down = optax.cosine_decay_schedule(max_lr, down_steps, alpha=min_lr / max_lr)
    return optax.join_schedules([up, down], [up_steps])


def build_optimizer(
    optimizer_cfg: Dict[str, Any],
    lr_cfg: Optional[Dict[str, Any]] = None,
    grad_clip: Optional[float] = None,
    frozen_prefixes: Optional[Any] = None,
):
    """Build an optax chain from reference-style config dicts.

    optimizer_cfg: {'type': 'AdamW', 'lr':..., 'betas':..., 'eps':...,
                    'weight_decay':...}
    lr_cfg: {'policy': 'OneCycle', 'max_lr':..., 'total_steps':...,
             'pct_start':..., 'anneal_strategy':...} or None (constant lr)
    frozen_prefixes: '/'-joined param-path prefixes to freeze (the
        optimizer analog of the reference's requires_grad=False,
        resnet.py:613-629): those leaves get ZERO updates — in particular
        AdamW's decoupled weight decay cannot shrink them, which a
        stop_gradient alone does not prevent.  Pair with the model-side
        `frozen_stages` (stop_gradient + eval-mode norms); configure via
        `optimizer_config.frozen_prefixes`.
    """
    if lr_cfg and lr_cfg.get("policy") == "OneCycle":
        schedule = onecycle_lr(
            lr_cfg["max_lr"],
            lr_cfg["total_steps"],
            lr_cfg.get("pct_start", 0.3),
            lr_cfg.get("div_factor", 25.0),
            lr_cfg.get("final_div_factor", 1e4),
            lr_cfg.get("anneal_strategy", "cos"),
        )
    else:
        schedule = optimizer_cfg.get("lr", 1e-4)

    opt_type = optimizer_cfg.get("type", "AdamW")
    betas = optimizer_cfg.get("betas", (0.9, 0.999))
    if opt_type == "AdamW":
        tx = optax.adamw(
            schedule,
            b1=betas[0],
            b2=betas[1],
            eps=optimizer_cfg.get("eps", 1e-8),
            weight_decay=optimizer_cfg.get("weight_decay", 0.0),
        )
    elif opt_type == "Adam":
        tx = optax.adam(schedule, b1=betas[0], b2=betas[1],
                        eps=optimizer_cfg.get("eps", 1e-8))
    elif opt_type == "SGD":
        tx = optax.sgd(schedule, momentum=optimizer_cfg.get("momentum", 0.9))
    else:
        raise KeyError(opt_type)

    if frozen_prefixes:
        prefixes = tuple(frozen_prefixes)

        def _mask(frozen: bool):
            def fn(params):
                from flax import traverse_util

                flat = traverse_util.flatten_dict(params)
                return traverse_util.unflatten_dict({
                    k: ("/".join(k).startswith(prefixes)) == frozen
                    for k in flat
                })

            return fn

        # trainable leaves get the optimizer; frozen leaves' updates are
        # forced to zero (their grads are already zero via stop_gradient,
        # but adamw's decay term is grad-independent)
        tx = optax.chain(
            optax.masked(tx, _mask(False)),
            optax.masked(optax.set_to_zero(), _mask(True)),
        )
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx, schedule
