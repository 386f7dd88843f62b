"""Generate golden scheduler trajectories — INDEPENDENT plain-numpy math.

VERDICT r2 task 4: the scheduler tests pinned β constants and analytic
invariants but no recorded trajectories — a subtle LMS-coefficient or
Euler-A σ-interp bug would pass. This script recomputes fixed multi-step
trajectories from the PUBLISHED formulas (DDIM arXiv:2010.02502 eq. 12,
DDPM arXiv:2006.11239 eq. 6-7, k-diffusion/Karras σ-space Euler-ancestral,
Adams-Bashforth LMS via exact Lagrange-polynomial integration, SD3/Flux
flow-matching shift σ(t) = s·t/(1+(s−1)t)) in float64 numpy — sharing NO
step math with ``diffusion/schedulers.py``. The LMS coefficients here use
``np.polyint`` exact polynomial integrals (the implementation under test
uses scipy adaptive quadrature — a genuinely different algorithm).

Model outputs are FIXED pre-drawn arrays (the same eps_i feeds both sides),
so the comparison isolates the step math. The only import from the package
is ``_draw_step_noise`` (an RNG utility, not scheduler math): the stochastic
kinds' goldens must add the exact noise arrays the jitted step will draw.

Run from the repo root:  PYTHONPATH= JAX_PLATFORMS=cpu python tests/golden/generate_scheduler_golden.py
Writes tests/golden/scheduler_trajectories.npz (loaded by
tests/test_scheduler_golden.py).
"""

import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

T = 1000
SHAPE = (1, 4, 8, 8)
LMS_ORDER = 4


def betas_scaled_linear(b0=0.00085, b1=0.012):
    # reference model_util.py:388-436: SD β schedule
    return np.linspace(b0**0.5, b1**0.5, T, dtype=np.float64) ** 2


def leading_timesteps(n):
    return (np.arange(0, n) * (T // n)).round()[::-1].copy().astype(np.int64)


def linspace_timesteps(n):
    return np.linspace(0, T - 1, n, dtype=np.float64)[::-1].copy()


ACP = np.cumprod(1.0 - betas_scaled_linear())
TRAIN_SIGMAS = ((1 - ACP) / ACP) ** 0.5


def eps_sequence(rng, n):
    return [rng.standard_normal(SHAPE).astype(np.float32).astype(np.float64) for _ in range(n)]


def ddim_traj(n, eps_seq, x0, prediction="epsilon"):
    ts = leading_timesteps(n)
    x = x0.copy()
    traj = [x.copy()]
    for i, t in enumerate(ts):
        a_t = ACP[t]
        tp = t - T // n
        a_prev = ACP[tp] if tp >= 0 else 1.0
        out = eps_seq[i]
        if prediction == "epsilon":
            pred_x0 = (x - np.sqrt(1 - a_t) * out) / np.sqrt(a_t)
            eps = out
        else:  # v-prediction
            pred_x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * out
            eps = np.sqrt(a_t) * out + np.sqrt(1 - a_t) * x
        x = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev) * eps  # DDIM eq.12, η=0
        traj.append(x.copy())
    return np.stack(traj), ts


def ddpm_traj(n, eps_seq, x0, noise_seq):
    ts = leading_timesteps(n)
    x = x0.copy()
    traj = [x.copy()]
    for i, t in enumerate(ts):
        a_t = ACP[t]
        tp = t - T // n
        a_prev = ACP[tp] if tp >= 0 else 1.0
        beta_prod_t, beta_prod_prev = 1 - a_t, 1 - a_prev
        current_alpha = a_t / a_prev
        current_beta = 1 - current_alpha
        pred_x0 = (x - np.sqrt(beta_prod_t) * eps_seq[i]) / np.sqrt(a_t)
        # DDPM eq.7 posterior mean
        mean = (
            np.sqrt(a_prev) * current_beta / beta_prod_t * pred_x0
            + np.sqrt(current_alpha) * beta_prod_prev / beta_prod_t * x
        )
        var = max(beta_prod_prev / beta_prod_t * current_beta, 1e-20)
        x = mean + (np.sqrt(var) * noise_seq[i] if t > 0 else 0.0)
        traj.append(x.copy())
    return np.stack(traj), ts


def sigma_schedule(n):
    ts = linspace_timesteps(n)
    sig = np.interp(ts[::-1], np.arange(T), TRAIN_SIGMAS)[::-1]
    return ts, np.concatenate([sig, [0.0]])


def euler_a_traj(n, eps_seq, x0, noise_seq):
    ts, sig = sigma_schedule(n)
    x = x0 * sig.max()  # init_noise_sigma scaling (linspace -> sigma_max)
    traj = [x.copy()]
    for i in range(n):
        s_from, s_to = sig[i], sig[i + 1]
        sigma_up = (s_to**2 * (s_from**2 - s_to**2) / s_from**2) ** 0.5 if s_from > 0 else 0.0
        sigma_down = max(s_to**2 - sigma_up**2, 0.0) ** 0.5
        # model input scaling /sqrt(σ²+1) happens OUTSIDE the step (sampler
        # calls scale_model_input) — goldens feed raw eps, so nothing here
        pred_x0 = x - s_from * eps_seq[i]
        d = (x - pred_x0) / s_from
        x = x + d * (sigma_down - s_from) + noise_seq[i] * sigma_up
        traj.append(x.copy())
    return np.stack(traj), ts


def lms_coeffs_table(sig, n):
    """Exact Lagrange-basis integrals via np.polyint (NOT scipy quad)."""
    table = np.zeros((n, LMS_ORDER))
    s = sig[:-1]
    for t in range(n):
        order = min(t + 1, LMS_ORDER)
        for curr in range(order):
            p = np.poly1d([1.0])
            for k in range(order):
                if k == curr:
                    continue
                p = p * np.poly1d([1.0, -s[t - k]]) / (s[t - curr] - s[t - k])
            P = np.polyint(p)
            hi = s[t + 1] if t + 1 < len(s) else 0.0
            table[t, curr] = P(hi) - P(s[t])
    return table


def lms_traj(n, eps_seq, x0):
    ts, sig = sigma_schedule(n)
    coeffs = lms_coeffs_table(sig, n)
    x = x0 * sig.max()
    traj = [x.copy()]
    derivs = []
    for i in range(n):
        s_from = sig[i]
        pred_x0 = x - s_from * eps_seq[i]
        derivs.insert(0, (x - pred_x0) / s_from)
        derivs = derivs[:LMS_ORDER]
        x = x + sum(c * d for c, d in zip(coeffs[i], derivs))
        traj.append(x.copy())
    return np.stack(traj), ts, coeffs


def flow_traj(n, v_seq, x0, shift=3.0, mu=None):
    t_lin = np.linspace(T, 1, n, dtype=np.float64)
    sig = t_lin / T
    if mu is not None:
        sig = np.exp(mu) / (np.exp(mu) + (1 / sig - 1))
    else:
        sig = shift * sig / (1 + (shift - 1) * sig)
    ts = sig * T
    sig = np.concatenate([sig, [0.0]])
    x = x0.copy()
    traj = [x.copy()]
    for i in range(n):
        x = x + (sig[i + 1] - sig[i]) * v_seq[i]
        traj.append(x.copy())
    return np.stack(traj), ts


def main():
    from sliders_conceptmod_tpu.diffusion.schedulers import _draw_step_noise  # RNG only
    import jax

    rng = np.random.default_rng(42)
    x0 = rng.standard_normal(SHAPE).astype(np.float32).astype(np.float64)
    out = {"x0": x0.astype(np.float32)}

    configs = [
        ("ddim50_eps", "ddim", 50, "epsilon"),
        ("ddim50_v", "ddim", 50, "v_prediction"),
        ("ddpm50_eps", "ddpm", 50, "epsilon"),
        ("lms50_eps", "lms", 50, "epsilon"),
        ("euler_a50_eps", "euler_a", 50, "epsilon"),
        ("euler_a12_eps", "euler_a", 12, "epsilon"),  # the XL training budget
    ]
    for name, kind, n, pred in configs:
        erng = np.random.default_rng(zlib.crc32(name.encode()))
        eps_seq = eps_sequence(erng, n)
        out[f"{name}_eps_seq"] = np.stack(eps_seq).astype(np.float32)
        if kind in ("ddpm", "euler_a"):
            # the exact noise arrays the jitted step will draw from fold_in(i)
            base_key = jax.random.PRNGKey(7)
            noise_seq = [
                np.asarray(_draw_step_noise(jax.random.fold_in(base_key, i), SHAPE), np.float64)
                for i in range(n)
            ]
        if kind == "ddim":
            traj, ts = ddim_traj(n, eps_seq, x0, prediction=pred)
        elif kind == "ddpm":
            traj, ts = ddpm_traj(n, eps_seq, x0, noise_seq)
        elif kind == "euler_a":
            traj, ts = euler_a_traj(n, eps_seq, x0, noise_seq)
        elif kind == "lms":
            traj, ts, coeffs = lms_traj(n, eps_seq, x0)
            out[f"{name}_coeffs"] = coeffs.astype(np.float64)
        out[f"{name}_traj"] = traj.astype(np.float32)
        out[f"{name}_timesteps"] = np.asarray(ts, np.float64)

    # flow matching: SD3 static shift 3.0 @28; Flux-style dynamic @8, mu=0.9
    for name, n, shift, mu in [("flow28_s3", 28, 3.0, None), ("flow8_dyn", 8, None, 0.9)]:
        vrng = np.random.default_rng(zlib.crc32(name.encode()))
        v_seq = eps_sequence(vrng, n)
        traj, ts = flow_traj(n, v_seq, x0, shift=shift if shift else 3.0, mu=mu)
        out[f"{name}_v_seq"] = np.stack(v_seq).astype(np.float32)
        out[f"{name}_traj"] = traj.astype(np.float32)
        out[f"{name}_timesteps"] = np.asarray(ts, np.float64)

    path = os.path.join(os.path.dirname(__file__), "scheduler_trajectories.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {sorted(out)}")


if __name__ == "__main__":
    main()
