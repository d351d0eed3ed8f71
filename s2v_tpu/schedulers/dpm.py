"""CogVideoX DPM-Solver++(2M)-style scheduler step.

Parity target: reference ``CogVideoXDPMScheduler``
(scheduling_dpm_cogvideox.py:306-440): lambda-space multipliers
(``get_variables``/``get_mult``) and the stochastic two-sample update.  The
schedule tables (betas/alpha-bar/timesteps) are shared with the DDIM module.

Functional form: ``dpm_step`` consumes the current sample, the previous
step's x0 prediction (or None/zeros with ``has_old=False`` on the first
step) and gaussian noise drawn by the caller — keeping RNG explicit makes
the whole loop jittable and reproducible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def dpm_multipliers(
    alphas_cumprod: np.ndarray,
    timesteps: np.ndarray,
    num_train_timesteps: int,
    num_inference_steps: int,
    set_alpha_to_one: bool = True,
):
    """Host-side per-step constants for the DPM update.

    Returns dict of fp32 arrays of shape [num_steps]:
      mult1, mult2, mult3, mult4, mult_noise, a_t (alpha_prod_t),
      has_back (1.0 where a previous-step x0 exists AND prev_timestep >= 0).
    Step i uses timestep_back = timesteps[i-1] (reference
    custom_cogvideox_pipe.py:287-295 passes ``timesteps[i-1] if i > 0``).
    """
    n_steps = len(timesteps)
    prev = timesteps - num_train_timesteps // num_inference_steps
    a_t = alphas_cumprod[timesteps].astype(np.float64)
    final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
    a_prev = np.where(prev >= 0, alphas_cumprod[np.clip(prev, 0, None)], final).astype(np.float64)

    # Deliberate infinities at the schedule endpoints (the reference computes
    # the same in torch): zero-terminal-SNR gives alphas_cumprod[t_max] == 0
    # -> lamb = -inf, and set_alpha_to_one gives a_prev == 1 on the last step
    # -> lamb_next = +inf.  Both collapse to finite multipliers below
    # (exp(-inf) = 0, expm1(-inf) = -1, 1/inf = 0); only log(0)/x-over-0
    # warnings are suppressed — no NaN is ever produced, and every returned
    # table is asserted finite.
    with np.errstate(divide="ignore"):
        lamb = np.log(np.sqrt(a_t / (1.0 - a_t)))
        lamb_next = np.log(np.sqrt(a_prev / (1.0 - a_prev)))
    h = lamb_next - lamb

    # h_last[i] = lamb[i] - lamb[i-1] (timestep_back = timesteps[i-1]).
    # Step 0 has no timestep_back: branch explicitly to 0 instead of
    # computing lamb[0] - lamb[0], which is (-inf) - (-inf) = NaN under
    # zero-SNR (the round-4 "invalid value in subtract" warning).
    h_last = np.zeros_like(h)
    h_last[1:] = lamb[1:] - lamb[:-1]
    # r[0] = 0/h[0] -> masked to 1 (has_back zeroes the 2nd-order path at
    # step 0 anyway); h == 0 lanes (degenerate repeated timesteps) masked too.
    r = np.divide(h_last, h, out=np.ones_like(h), where=h != 0)
    r = np.where(r != 0, r, 1.0)

    mult1 = np.sqrt((1.0 - a_prev) / (1.0 - a_t)) * np.exp(-h)
    mult2 = np.expm1(-2.0 * h) * np.sqrt(a_prev)
    mult3 = 1.0 + 1.0 / (2.0 * r)
    mult4 = 1.0 / (2.0 * r)
    mult_noise = np.sqrt(1.0 - a_prev) * np.sqrt(1.0 - np.exp(-2.0 * h))

    has_back = np.zeros(n_steps)
    has_back[1:] = 1.0
    has_back = np.where(prev >= 0, has_back, 0.0)

    out = {
        "mult1": mult1.astype(np.float32),
        "mult2": mult2.astype(np.float32),
        "mult3": mult3.astype(np.float32),
        "mult4": mult4.astype(np.float32),
        "mult_noise": mult_noise.astype(np.float32),
        "a_t": a_t.astype(np.float32),
        "has_back": has_back.astype(np.float32),
    }
    for name, table in out.items():
        if not np.isfinite(table).all():
            raise FloatingPointError(
                f"dpm_multipliers: non-finite entries in {name!r} — the "
                f"endpoint-infinity collapse above failed for this schedule"
            )
    return out


def dpm_step(
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    old_pred_original_sample: jnp.ndarray,
    noise: jnp.ndarray,
    mults: dict,
    prediction_type: str = "v_prediction",
    noise2: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DPM step; ``mults`` holds this step's scalar constants
    (entries of :func:`dpm_multipliers` indexed at the loop counter).

    ``noise``/``noise2``: the reference draws fresh gaussian noise for the
    first-order estimate and *again* for the second-order correction
    (scheduling_dpm_cogvideox.py:424-433); pass two independent draws for
    faithful stochastics (noise2 defaults to noise).

    Returns (prev_sample, pred_original_sample).
    """
    if noise2 is None:
        noise2 = noise
    dt = sample.dtype
    mo = model_output.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    a_t = mults["a_t"]
    beta_t = 1.0 - a_t
    if prediction_type == "epsilon":
        x0 = (x - beta_t**0.5 * mo) / a_t**0.5
    elif prediction_type == "sample":
        x0 = mo
    elif prediction_type == "v_prediction":
        x0 = a_t**0.5 * x - beta_t**0.5 * mo
    else:
        raise ValueError(prediction_type)

    first_order = mults["mult1"] * x - mults["mult2"] * x0 + mults["mult_noise"] * noise
    denoised_d = mults["mult3"] * x0 - mults["mult4"] * old_pred_original_sample.astype(jnp.float32)
    second_order = mults["mult1"] * x - mults["mult2"] * denoised_d + mults["mult_noise"] * noise2

    prev = jnp.where(mults["has_back"] > 0, second_order, first_order)
    return prev.astype(dt), x0.astype(dt)
