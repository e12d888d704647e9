"""Batched ODE engine: fixed-step and adaptive Dormand-Prince 5(4).

TPU-native replacement for the reference's diffrax usage
(`ecnf/cnf/sample_and_log_prob.py:28-37,81-89`: Dopri5 +
``PIDController(rtol, atol, dtmin=1e-5)`` or fixed step 0.05).

Design (vs. diffrax-under-vmap):

- **Batched-first.** The vector field is ``f(t: [B], y: [B, S]) -> [B, S]``
  and is evaluated once per RK stage on the whole batch, so all FLOPs land
  on the MXU as large matmuls.  The reference instead vmaps a per-sample
  solver, which still runs lockstep under jit but carries per-sample solver
  bookkeeping through vmap.
- **Per-sample adaptive control.** Each batch element keeps its own
  ``(t, dt, done)`` and an I-controller (safety 0.9, factor clip [0.2, 10],
  error-order exponent 1/5 — diffrax `PIDController` defaults), so accepted
  trajectories are statistically equivalent to the reference's per-sample
  adaptive stepping.  The batch finishes when every sample reaches ``t1``.
- **FSAL.** Dopri5's 7th stage is reused as the next step's 1st stage.
- **Static shapes, `lax.while_loop`.** Everything is jit-compatible with no
  host round-trips; the fixed-step path is a `lax.scan` (reverse-mode
  differentiable if ever needed).
"""
from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Dormand-Prince 5(4) Butcher tableau.
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, 0] = 1 / 5
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
# 5th-order solution weights == row 7 of A (FSAL).
_B5 = _A[6].copy()
# Embedded 4th-order weights.
_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)
_E = _B5 - _B4  # error estimate weights (b5[6] == 0)

_SAFETY = 0.9
_FACTOR_MIN = 0.2
_FACTOR_MAX = 10.0
_ERR_EXP = 1.0 / 5.0

VectorField = Callable[[jax.Array, jax.Array], jax.Array]  # (t[B], y[B,S]) -> [B,S]


class ODEStats(NamedTuple):
    """Per-solve statistics (batch-aggregated)."""

    num_steps: jax.Array  # accepted steps, max over batch
    num_attempts: jax.Array  # total loop iterations


def _rms_norm(x: jax.Array) -> jax.Array:
    """Per-sample RMS norm over state dims: [B, S] -> [B]."""
    return jnp.sqrt(jnp.mean(x**2, axis=-1))


def _dopri5_stages(
    func: VectorField, t: jax.Array, y: jax.Array, dt: jax.Array, k1: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One Dopri5 step on the whole batch.

    Args:
        func: batched vector field.
        t: ``[B]`` current times.
        y: ``[B, S]`` current states.
        dt: ``[B]`` (signed) step sizes.
        k1: ``[B, S]`` first stage = ``func(t, y)`` (FSAL carry-over).

    Returns:
        ``(y5, y_err, k7)``: 5th-order solution, error estimate, last stage.
    """
    dt_ = dt[:, None]
    ks = [k1]
    for i in range(1, 7):
        yi = y + dt_ * sum(_A[i, j] * ks[j] for j in range(i))
        ti = t + _C[i] * dt
        ks.append(func(ti, yi))
    y5 = y + dt_ * sum(_B5[j] * ks[j] for j in range(6))  # b5[6] == 0
    y_err = dt_ * sum(_E[j] * ks[j] for j in range(7))
    return y5, y_err, ks[6]


def _initial_step_size(
    func: VectorField,
    t0: jax.Array,
    y0: jax.Array,
    f0: jax.Array,
    direction: float,
    rtol: float,
    atol: float,
) -> jax.Array:
    """Hairer-Norsett-Wanner starting-step heuristic, per sample.

    Mirrors what diffrax does when ``dt0=None`` (Solving ODEs I, p.169).
    Returns ``[B]`` of positive magnitudes (unsigned).
    """
    scale = atol + rtol * jnp.abs(y0)
    d0 = _rms_norm(y0 / scale)
    d1 = _rms_norm(f0 / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / jnp.maximum(d1, 1e-30))

    y1 = y0 + direction * h0[:, None] * f0
    f1 = func(t0 + direction * h0, y1)
    d2 = _rms_norm((f1 - f0) / scale) / jnp.maximum(h0, 1e-30)

    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(dmax, 1e-30)) ** _ERR_EXP,
    )
    return jnp.minimum(100.0 * h0, h1)


class _AdaptiveState(NamedTuple):
    t: jax.Array  # [B]
    y: jax.Array  # [B, S]
    dt: jax.Array  # [B] unsigned magnitude
    k1: jax.Array  # [B, S]  FSAL first stage
    done: jax.Array  # [B] bool
    n_accept: jax.Array  # [B] int32
    n_iter: jax.Array  # [] int32


@partial(jax.jit, static_argnames=("func", "t0", "t1", "rtol", "atol", "dtmin", "max_steps"))
def odeint_adaptive(
    func: VectorField,
    y0: jax.Array,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    dtmin: float = 1e-5,
    max_steps: int = 4096,
) -> Tuple[jax.Array, ODEStats]:
    """Integrate ``dy/dt = func(t, y)`` from t0 to t1 with adaptive Dopri5.

    Semantics parity with the reference's
    ``diffeqsolve(..., Dopri5(), PIDController(rtol, atol, dtmin=1e-5))``
    (`ecnf/cnf/sample_and_log_prob.py:35-37`): I-controlled step size,
    force-accept at ``dtmin``, per-sample adaptivity.

    Args:
        y0: ``[B, S]`` initial states.
        t0, t1: static scalar endpoints; ``t1 < t0`` integrates backwards.

    Returns:
        ``(y1, stats)`` with ``y1: [B, S]``.
    """
    if t0 == t1:
        return y0, ODEStats(jnp.int32(0), jnp.int32(0))
    direction = 1.0 if t1 > t0 else -1.0
    span = abs(t1 - t0)
    B = y0.shape[0]
    dtype = y0.dtype

    t_init = jnp.full((B,), t0, dtype=dtype)
    f0 = func(t_init, y0)
    dt_init = jnp.minimum(
        _initial_step_size(func, t_init, y0, f0, direction, rtol, atol), span
    ).astype(dtype)

    init = _AdaptiveState(
        t=t_init,
        y=y0,
        dt=dt_init,
        k1=f0,
        done=jnp.zeros((B,), dtype=bool),
        n_accept=jnp.zeros((B,), dtype=jnp.int32),
        n_iter=jnp.int32(0),
    )

    def cond(s: _AdaptiveState):
        return jnp.logical_and(~jnp.all(s.done), s.n_iter < max_steps)

    def body(s: _AdaptiveState) -> _AdaptiveState:
        remaining = jnp.abs(t1 - s.t)
        # Clamp the attempted step to not overshoot the endpoint.
        dt_mag = jnp.minimum(s.dt, remaining)
        at_min = dt_mag <= dtmin
        dt_mag = jnp.maximum(dt_mag, jnp.minimum(dtmin, remaining))
        dt = direction * dt_mag

        y5, y_err, k7 = _dopri5_stages(func, s.t, s.y, dt, s.k1)

        scale = atol + rtol * jnp.maximum(jnp.abs(s.y), jnp.abs(y5))
        err_ratio = _rms_norm(y_err / scale)  # [B]

        accept = (err_ratio <= 1.0) | at_min
        # I-controller; err_ratio == 0 -> max growth.
        factor = jnp.where(
            err_ratio == 0.0,
            _FACTOR_MAX,
            jnp.clip(
                _SAFETY * err_ratio ** (-_ERR_EXP), _FACTOR_MIN, _FACTOR_MAX
            ),
        )
        dt_next = jnp.maximum(dt_mag * factor, dtmin)

        # Freeze diverged samples: once a state is non-finite (the field blew
        # up, e.g. a partially-trained model), every step would be rejected
        # until dt hits dtmin and NaNs are force-accepted — grinding through
        # max_steps.  Mark such samples done; downstream evals mask
        # non-finite log-densities (reference `evaluation.py:15` semantics).
        dead = ~jnp.all(jnp.isfinite(s.y), axis=-1)

        step = accept & ~s.done & ~dead
        t_new = jnp.where(step, s.t + dt, s.t)
        # Snap to the endpoint when within float slop.
        reached = jnp.abs(t1 - t_new) <= 1e-12
        t_new = jnp.where(step & reached, t1, t_new)

        upd = step[:, None]
        y_new = jnp.where(upd, y5, s.y)
        k1_new = jnp.where(upd, k7, s.k1)  # FSAL
        return _AdaptiveState(
            t=t_new,
            y=y_new,
            dt=jnp.where(s.done, s.dt, dt_next),
            k1=k1_new,
            done=s.done | (step & reached) | dead,
            n_accept=s.n_accept + step.astype(jnp.int32),
            n_iter=s.n_iter + 1,
        )

    final = jax.lax.while_loop(cond, body, init)
    # Samples still mid-trajectory when the step budget ran out (e.g. f32
    # with tolerances below attainable accuracy: every step rejected down
    # to dtmin) would otherwise return a silently-wrong truncated state —
    # NaN them so downstream non-finite masking catches them, like
    # diverged samples (reference `evaluation.py:15` semantics).
    y1 = jnp.where(final.done[:, None], final.y, jnp.nan)
    stats = ODEStats(num_steps=jnp.max(final.n_accept), num_attempts=final.n_iter)
    return y1, stats


def _rk4_step(
    func: VectorField, t: jax.Array, y: jax.Array, dt: jax.Array
) -> jax.Array:
    """One classic 4th-order Runge-Kutta step on the whole batch.

    4 field evaluations per step vs Dopri5's 6 (no embedded error
    estimate, which a fixed-step solve never uses) — a 1.5x cheaper
    fixed-step method for the same step size, one order lower accuracy.
    """
    dt_ = dt[:, None]
    k1 = func(t, y)
    k2 = func(t + 0.5 * dt, y + 0.5 * dt_ * k1)
    k3 = func(t + 0.5 * dt, y + 0.5 * dt_ * k2)
    k4 = func(t + dt, y + dt_ * k3)
    return y + (dt_ / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


@partial(jax.jit, static_argnames=("func", "t0", "t1", "step_size", "method"))
def odeint_fixed(
    func: VectorField,
    y0: jax.Array,
    t0: float,
    t1: float,
    step_size: float = 0.05,
    method: str = "dopri5",
) -> Tuple[jax.Array, ODEStats]:
    """Fixed-step integration over [t0, t1] via `lax.scan`.

    ``method="dopri5"`` (default) has parity with the reference's
    ``diffeqsolve(..., dt0=step_size)`` fixed-step branch
    (`ecnf/cnf/sample_and_log_prob.py:32-33,86-87`): the interval is
    covered in ``ceil(span / step_size)`` equal Dopri5 steps.
    ``method="rk4"`` is a TPU-native option: 4 instead of 6 field
    evaluations per step (`_rk4_step`).
    """
    if method not in ("dopri5", "rk4"):
        raise ValueError(f"unknown fixed-step method {method!r}")
    if t0 == t1:
        return y0, ODEStats(jnp.int32(0), jnp.int32(0))
    span = abs(t1 - t0)
    n_steps = max(1, int(np.ceil(span / step_size - 1e-12)))
    dt_val = (t1 - t0) / n_steps
    B = y0.shape[0]
    dtype = y0.dtype
    dt = jnp.full((B,), dt_val, dtype=dtype)

    if method == "rk4":

        def rk4_body(y, i):
            t = jnp.full((B,), t0, dtype=dtype) + i.astype(dtype) * dt_val
            return _rk4_step(func, t, y, dt), None

        y_final, _ = jax.lax.scan(rk4_body, y0, jnp.arange(n_steps))
        return y_final, ODEStats(jnp.int32(n_steps), jnp.int32(n_steps))

    def scan_body(carry, i):
        y, k1 = carry
        t = jnp.full((B,), t0, dtype=dtype) + i.astype(dtype) * dt_val
        y_new, _, k7 = _dopri5_stages(func, t, y, dt, k1)
        return (y_new, k7), None

    t_init = jnp.full((B,), t0, dtype=dtype)
    k1 = func(t_init, y0)
    (y_final, _), _ = jax.lax.scan(scan_body, (y0, k1), jnp.arange(n_steps))
    return y_final, ODEStats(jnp.int32(n_steps), jnp.int32(n_steps))


def odeint(
    func: VectorField,
    y0: jax.Array,
    t0: float,
    t1: float,
    use_fixed_step_size: bool = False,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    dtmin: float = 1e-5,
    step_size: float = 0.05,
    max_steps: int = 4096,
    method: str = "dopri5",
) -> Tuple[jax.Array, ODEStats]:
    """Dispatch between fixed and adaptive integration (static choice)."""
    if use_fixed_step_size:
        return odeint_fixed(func, y0, t0, t1, step_size=step_size, method=method)
    return odeint_adaptive(
        func, y0, t0, t1, rtol=rtol, atol=atol, dtmin=dtmin, max_steps=max_steps
    )
