"""DPM-Solver++ multistep coefficients for the VibeVoice diffusion head.

TPU-native take on the reference
mlx_audio/tts/models/vibevoice/scheduler.py:11-346: the reference keeps a
stateful scheduler object that is stepped from Python; here every per-step
coefficient (alpha_t, sigma_t, lambda shifts, solver order) is precomputed
on the host as plain numpy for a given number of inference steps, so the
whole sampling loop can be unrolled inside one jitted program with zero
host round-trips.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

__all__ = ["DPMCoeffs", "dpm_solver_coeffs", "dpm_step"]


def _betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999
                         ) -> np.ndarray:
    """Cosine alpha-bar schedule (reference scheduler.py:11-37)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = [min(1 - alpha_bar((i + 1) / num_steps) / alpha_bar(i / num_steps),
                 max_beta) for i in range(num_steps)]
    return np.asarray(betas, np.float64)


@dataclass
class DPMCoeffs:
    """Static per-inference-step solver tables (host-side)."""

    alpha: np.ndarray  # (n+1,)
    sigma: np.ndarray  # (n+1,)
    lam: np.ndarray  # (n+1,)
    orders: List[int]  # per-step solver order (1 or 2)
    prediction_type: str
    num_steps: int


def dpm_solver_coeffs(num_train_timesteps: int = 1000,
                      num_inference_steps: int = 20,
                      beta_schedule: str = "cosine",
                      prediction_type: str = "v_prediction",
                      solver_order: int = 2,
                      lower_order_final: bool = True,
                      final_sigmas_type: str = "zero") -> DPMCoeffs:
    """Precompute DPM-Solver++ tables (reference scheduler.py:115-158,
    order logic scheduler.py:264-279)."""
    if beta_schedule == "linear":
        betas = np.linspace(1e-4, 0.02, num_train_timesteps)
    else:  # scaled_linear / squaredcos_cap_v2 / cosine all map to cosine
        betas = _betas_for_alpha_bar(num_train_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas)
    alpha_bar_sqrt = np.sqrt(alphas_cumprod)

    timesteps = [int(round((num_train_timesteps - 1)
                           * (1.0 - i / num_inference_steps)))
                 for i in range(num_inference_steps)]

    alpha, sigma, lam = [], [], []
    for t in timesteps:
        s = math.sqrt((1 - alpha_bar_sqrt[t] ** 2) / (alpha_bar_sqrt[t] ** 2))
        a = 1.0 / math.sqrt(s * s + 1.0)
        sg = s * a
        alpha.append(a)
        sigma.append(sg)
        lam.append(math.log(a) - math.log(sg))
    alpha.append(1.0)
    sigma.append(0.0)
    lam.append(float("inf"))

    orders = []
    lower_order_nums = 0
    for i in range(num_inference_steps):
        is_final = i == num_inference_steps - 1
        lower_final = is_final and (
            (lower_order_final and num_inference_steps < 15)
            or final_sigmas_type == "zero")
        if lower_order_nums < 1 or lower_final:
            orders.append(1)
        else:
            orders.append(min(2, solver_order))
        if lower_order_nums < solver_order - 1:
            lower_order_nums += 1

    return DPMCoeffs(alpha=np.asarray(alpha), sigma=np.asarray(sigma),
                     lam=np.asarray(lam), orders=orders,
                     prediction_type=prediction_type,
                     num_steps=num_inference_steps)


def dpm_step(coeffs: DPMCoeffs, i: int, x, model_out, prev_x0):
    """One solver update with static coefficients; pure function of arrays
    (reference scheduler.py:155-313). Returns (x_next, x0_pred)."""
    a_cur, s_cur = coeffs.alpha[i], coeffs.sigma[i]
    if coeffs.prediction_type == "epsilon":
        x0 = (x - s_cur * model_out) / a_cur
    elif coeffs.prediction_type == "v_prediction":
        x0 = a_cur * x - s_cur * model_out
    else:  # sample
        x0 = model_out

    a_next, s_next = coeffs.alpha[i + 1], coeffs.sigma[i + 1]
    h = coeffs.lam[i + 1] - coeffs.lam[i]
    sigma_ratio = (s_next / s_cur) if s_cur > 0 else 0.0
    em1 = math.exp(-h) - 1.0

    if coeffs.orders[i] == 1 or prev_x0 is None:
        x_next = sigma_ratio * x - a_next * em1 * x0
    else:
        h0 = coeffs.lam[i] - coeffs.lam[i - 1] if i > 0 else h
        r0 = h0 / h if h != 0 else 1.0
        d1 = (x0 - prev_x0) / r0 if r0 != 0 else 0.0 * x0
        x_next = sigma_ratio * x - a_next * em1 * x0 - 0.5 * a_next * em1 * d1
    return x_next, x0
