"""LR schedules (reference `/root/reference/src/optimization/sched.py`).

Same four schedules: linear warmup+decay (:14-17), invsqrt/noam (:8-11),
multi_step (:20-25), constant; floored at 1e-8 (:44-46). Implemented with
jnp so the schedule evaluates *inside* the jitted train step from the step
counter — the reference instead recomputes group lrs in Python every step
(e.g. run_video_qa.py:521-546); folding it into the compiled update removes
that host round-trip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def warmup_linear(step, warmup_step, tot_step):
    step = jnp.asarray(step, jnp.float32)
    warm = jnp.maximum(jnp.asarray(warmup_step, jnp.float32), 1.0)
    tot = jnp.asarray(tot_step, jnp.float32)
    ramp = step / warm
    decay = jnp.maximum(0.0, (tot - step) / jnp.maximum(tot - warm, 1.0))
    return jnp.where(step < warm, ramp, decay)


def noam(step, warmup_step):
    step = jnp.asarray(step, jnp.float32)
    warm = jnp.maximum(jnp.asarray(warmup_step, jnp.float32), 1.0)
    return jnp.where(step <= warm, step / warm,
                     jnp.sqrt(warm) * jax_rsqrt(step))


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(jnp.maximum(x, 1e-20))


def multi_step(n_epoch, milestones: Sequence[int], gamma: float = 0.5):
    """gamma**(#milestones passed); gamma**(len+1) beyond the last one,
    matching the reference's (slightly surprising) fall-through exponent."""
    n_epoch = jnp.asarray(n_epoch, jnp.float32)
    ms = sorted(milestones)
    out = jnp.asarray(float(gamma) ** (len(ms) + 1), jnp.float32)
    for i in reversed(range(len(ms))):
        out = jnp.where(n_epoch < ms[i], gamma ** i, out)
    return out


def get_lr(global_step, decay: str, learning_rate: float, num_train_steps: int,
           warmup_ratio: float = 0.1,
           decay_epochs: Optional[Sequence[int]] = None,
           multi_step_epoch=None):
    warmup_steps = int(warmup_ratio * num_train_steps)
    if decay == "linear":
        lr = learning_rate * warmup_linear(global_step, warmup_steps,
                                           num_train_steps)
    elif decay == "invsqrt":
        lr = learning_rate * noam(global_step, warmup_steps)
    elif decay == "constant":
        lr = jnp.asarray(learning_rate, jnp.float32)
    elif decay == "multi_step":
        assert multi_step_epoch is not None
        lr = learning_rate * multi_step(multi_step_epoch, decay_epochs or [])
    else:
        raise ValueError(f"unknown decay {decay}")
    return jnp.maximum(lr, 1e-8)  # safeguard floor (reference sched.py:44-46)
