"""Flow / mask / sequence losses (reference models/loss/sequence_loss.py).

All flows are NHWC (N, H, W, 2); masks (N, H, W).
"""

from typing import Callable, List, Sequence, Tuple

import jax.numpy as jnp


def raft_loss(
    pred_flow: jnp.ndarray,
    gt_flow: jnp.ndarray,
    valid: jnp.ndarray = None,
    max_flow: float = 400.0,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Masked L1 flow loss; valid = (mask >= 0.5) & (|gt| < max_flow)
    (sequence_loss.py:9-24)."""
    mag = jnp.sqrt(jnp.sum(gt_flow**2, axis=-1))
    v = mag < max_flow
    if valid is not None:
        v = (valid >= 0.5) & v
    vf = v.astype(gt_flow.dtype)
    loss = jnp.abs(pred_flow - gt_flow)
    return (vf[..., None] * loss).sum() / (vf.sum() + eps)


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray = None) -> jnp.ndarray:
    """Plain mean L1.  NOTE: deliberately ignores `valid`, replicating the
    reference's unmasked mask-loss (sequence_loss.py:35-37; SURVEY.md §2.4
    item 8 — replicated for training parity)."""
    return jnp.mean(jnp.abs(pred - gt))


def endpoint_error(
    pred_flow: jnp.ndarray, gt_flow: jnp.ndarray, p: int = 2, q=None, eps=None
) -> jnp.ndarray:
    """Per-pixel endpoint error map (models/loss/flow_loss.py:9-50)."""
    diff = pred_flow - gt_flow
    if p == 2:
        err = jnp.sqrt(jnp.sum(diff**2, axis=-1))
    else:
        err = jnp.sum(jnp.abs(diff), axis=-1)
    # the reference applies the robust exponent only when BOTH q and eps
    # are set (flow_loss.py:47) — q alone leaves the raw error map
    if q is not None and eps is not None:
        err = (err + eps) ** q
    return err


def sequence_loss(
    loss_fn: Callable[..., jnp.ndarray],
    seq_preds: Sequence[jnp.ndarray],
    gamma: float = 0.8,
    **kwargs,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Exponentially-weighted loss over the iteration sequence
    (sequence_loss.py:42-82): weight_i = gamma^(T-1-i).

    seq_preds: either a (T, ...) stacked array or a list of per-iteration
    tuples of positional args for loss_fn.
    """
    n = len(seq_preds)
    total = 0.0
    per_iter = []
    for i in range(n):
        pred = seq_preds[i]
        args = pred if isinstance(pred, tuple) else (pred,)
        li = loss_fn(*args, **kwargs)
        total = total + (gamma ** (n - 1 - i)) * li
        per_iter.append(li)
    return total, per_iter
