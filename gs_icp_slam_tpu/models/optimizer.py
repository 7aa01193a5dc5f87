"""Masked per-group Adam over the map pytree.

The reference builds one torch.optim.Adam with six parameter groups at
different learning rates (scene/gaussian_model.py:222-236, lrs from
arguments/__init__.py:138-152) and mutates its state on every insert/prune
("optimizer surgery", :394-470).  Here the optimizer is three fixed-shape
arrays per parameter (m, v, plus one global step) and surgery disappears:
fresh slots simply carry zero state, dead slots are masked out of the
update, and compaction permutes m/v alongside the parameters.

Not optax: optax's adam carries per-leaf step counts inside `ScaleByAdamState`
and offers no per-slot masking; a 30-line explicit Adam keeps the whole
optimizer state a flat pytree we can permute/zero in `compact()`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: dict  # first moments, same structure as params
    v: dict  # second moments
    step: jnp.ndarray  # () int32


def adam_init(params: dict) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.int32(0))


def map_lr_tree(opt_cfg) -> dict:
    """Learning-rate tree for the map params (gaussian_model.py:222-231).

    xyz uses position_lr_init * spatial_lr_scale; f_rest uses feature_lr/20;
    the reference calls update_learning_rate exactly once (mp_Mapper.py:135)
    so the exp-decay schedule never actually engages — LR is constant.
    """
    return dict(
        xyz=opt_cfg.position_lr * opt_cfg.spatial_lr_scale,
        f_dc=opt_cfg.feature_lr,
        f_rest=opt_cfg.feature_lr / 20.0,
        opacity_logit=opt_cfg.opacity_lr,
        log_scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
    )


def adam_step(params: dict, grads: dict, state: AdamState, lrs: dict,
              update_mask: jnp.ndarray, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-15):
    """One Adam step over every leaf, masked by per-slot `update_mask` (C,).

    Masked slots keep params AND moments untouched — equivalent to those rows
    not existing in the reference's optimizer (they are pruned/compacted away
    there; here they just wait for compaction).
    """
    t = state.step + 1
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)

    def upd(p, g, m, v, lr):
        mask = update_mask.reshape((-1,) + (1,) * (p.ndim - 1))
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * (g * g)
        step = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        return (jnp.where(mask, p - step, p),
                jnp.where(mask, m_new, m),
                jnp.where(mask, v_new, v))

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        new_p[k], new_m[k], new_v[k] = upd(params[k], grads[k], state.m[k],
                                           state.v[k], lrs[k])
    return new_p, AdamState(m=new_m, v=new_v, step=t)
