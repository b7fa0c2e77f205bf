"""DDPM scheduler as precomputed fp32 tables + pure step functions, designed
to run inside a jitted ``lax.scan`` (the reference steps a stateful diffusers
DDPMScheduler object per python-loop iteration, src/tryon_pipeline.py:1823).

Covers the reference's operating points:
- scaled_linear betas 0.00085 -> 0.012, 1000 train steps (SDXL)
- rescale_betas_zero_snr (train_xl.py:317)
- epsilon / v_prediction / sample prediction types (train_xl.py:713-723)
- leading timestep spacing with steps_offset=1
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from idmvton_tpu.core.config import SchedulerConfig


def denoising_value_valid(x) -> bool:
    """The reference honors denoising_start/denoising_end ONLY when the value
    is a number strictly inside (0, 1) (tryon_pipeline.py:1586-1589
    ``denoising_value_valid``); anything else is silently ignored and the
    strength path applies."""
    return x is not None and 0.0 < float(x) < 1.0


def check_denoising_range(denoising_start, denoising_end):
    """Normalize (start, end) per reference semantics: invalid values become
    None (ignored), and a valid start >= valid end raises (an empty refiner
    window is a caller error — cf. diffusers' base+refiner contract — rather
    than a silent passthrough of the input latents)."""
    start = float(denoising_start) if denoising_value_valid(denoising_start) \
        else None
    end = float(denoising_end) if denoising_value_valid(denoising_end) else None
    if start is not None and end is not None and start >= end:
        raise ValueError(
            f"denoising_start ({start}) must be < denoising_end ({end}): "
            "the [start, end) window would be empty")
    return start, end


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Lin et al. 2023 zero-terminal-SNR rescale (diffusers
    rescale_zero_terminal_snr semantics, operating on sqrt(alphas_cumprod))."""
    sqrt_ac = np.sqrt(alphas_cumprod)
    a0, aT = sqrt_ac[0], sqrt_ac[-1]
    sqrt_ac = sqrt_ac - aT
    sqrt_ac = sqrt_ac * a0 / (a0 - aT)
    return sqrt_ac ** 2


class DDPMScheduler:
    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        n = cfg.num_train_timesteps
        if cfg.beta_schedule == "scaled_linear":
            betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n,
                                dtype=np.float64) ** 2
        elif cfg.beta_schedule == "linear":
            betas = np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
        elif cfg.beta_schedule == "squaredcos_cap_v2":
            t = np.arange(n + 1, dtype=np.float64) / n
            f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
            betas = np.clip(1 - f[1:] / f[:-1], 0, 0.999)
        else:
            raise ValueError(cfg.beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas)
        if cfg.rescale_betas_zero_snr:
            alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)
            # zero-SNR: terminal alpha_cumprod == 0; guard downstream divisions
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, jnp.float32)
        ac_prev_step = np.concatenate([[1.0], alphas_cumprod[:-1]])
        self.alphas = jnp.asarray(alphas_cumprod / ac_prev_step, jnp.float32)
        self.init_noise_sigma = 1.0

    # ------------------------------------------------------------------ train

    def add_noise(self, sample, noise, timesteps):
        ac = self.alphas_cumprod[timesteps].astype(jnp.float32)
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sqrt_ac = jnp.sqrt(ac).reshape(shape)
        sqrt_1mac = jnp.sqrt(1.0 - ac).reshape(shape)
        return (sqrt_ac * sample.astype(jnp.float32)
                + sqrt_1mac * noise.astype(jnp.float32)).astype(sample.dtype)

    def get_velocity(self, sample, noise, timesteps):
        ac = self.alphas_cumprod[timesteps].astype(jnp.float32)
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sqrt_ac = jnp.sqrt(ac).reshape(shape)
        sqrt_1mac = jnp.sqrt(1.0 - ac).reshape(shape)
        return (sqrt_ac * noise.astype(jnp.float32)
                - sqrt_1mac * sample.astype(jnp.float32)).astype(sample.dtype)

    def snr(self, timesteps):
        ac = self.alphas_cumprod[timesteps]
        return ac / jnp.maximum(1.0 - ac, 1e-12)

    # -------------------------------------------------------------- inference

    def timesteps(self, num_inference_steps: int, strength: float = 1.0,
                  denoising_start: float = None,
                  denoising_end: float = None,
                  custom_timesteps=None):
        """Discrete timesteps for the denoise loop (descending), with the
        reference's strength-based truncation (tryon_pipeline.py:987
        get_timesteps: keeps the last num_steps*strength steps).

        custom_timesteps: explicit descending timestep list — the reference's
        ``timesteps`` kwarg routed through retrieve_timesteps
        (tryon_pipeline.py:264-302, :1561). Overrides the spacing formula;
        num_inference_steps becomes len(custom_timesteps) for the strength
        truncation, and the start/end trims apply as usual.

        denoising_start: refiner-handoff head trim (tryon_pipeline.py:999-
        1011): strength is IGNORED and the schedule keeps only timesteps
        strictly below round(T - start*T) — the caller supplies already
        partially-denoised latents and no noise is added.
        denoising_end: tail trim (tryon_pipeline.py:1743-1752): keep only
        timesteps >= round(T - end*T); the remaining tail is left for a
        successor pipeline with denoising_start = this denoising_end.

        Values outside (0, 1) are IGNORED (reference denoising_value_valid,
        tryon_pipeline.py:1586-1589); start >= end raises.
        """
        denoising_start, denoising_end = check_denoising_range(
            denoising_start, denoising_end)
        n = self.cfg.num_train_timesteps
        if custom_timesteps is not None:
            ts = np.asarray(custom_timesteps, np.int64)
            if ts.ndim != 1 or ts.size == 0:
                raise ValueError("custom timesteps must be a non-empty 1-D "
                                 "sequence")
            if np.any(np.diff(ts) >= 0):
                raise ValueError("custom timesteps must be strictly "
                                 "descending (diffusers set_timesteps "
                                 "contract)")
            if ts[0] >= n or ts[-1] < 0:
                raise ValueError(f"custom timesteps must lie in [0, {n})")
            num_inference_steps = int(ts.size)
        elif self.cfg.timestep_spacing == "leading":
            ratio = n // num_inference_steps
            ts = (np.arange(num_inference_steps) * ratio).round()[::-1]
            ts = ts + self.cfg.steps_offset
        elif self.cfg.timestep_spacing == "trailing":
            ratio = n / num_inference_steps
            ts = np.round(np.arange(n, 0, -ratio)) - 1
        else:  # linspace
            ts = np.linspace(0, n - 1, num_inference_steps)[::-1].round()
        ts = ts.astype(np.int32)
        if denoising_start is not None:
            # strength irrelevant when a start point is requested directly
            # (reference comment at tryon_pipeline.py:997-998)
            cutoff = int(round(n - denoising_start * n))
            ts = ts[ts < cutoff]
        elif strength < 1.0:
            init_t = min(int(num_inference_steps * strength), num_inference_steps)
            ts = ts[num_inference_steps - init_t:]
        if denoising_end is not None and 0.0 < denoising_end < 1.0:
            cutoff = int(round(n - denoising_end * n))
            ts = ts[ts >= cutoff]
        return jnp.asarray(ts.copy())

    def timesteps_and_prev(self, num_inference_steps: int,
                           strength: float = 1.0,
                           denoising_start: float = None,
                           denoising_end: float = None,
                           custom_timesteps=None):
        """(ts, prev_ts) with the denoising_end trim applied AFTER deriving
        prev from the untrimmed tail: diffusers' DDPM step computes
        prev_t = t - T//num_steps from num_inference_steps alone, so a
        denoising_end-trimmed run's FINAL step still steps toward the next
        timestep of the full schedule (where the successor pipeline resumes),
        not to -1. Chaining end=x then start=x is bit-exact to the unsplit
        run (tests/test_pipeline.py)."""
        denoising_start, denoising_end = check_denoising_range(
            denoising_start, denoising_end)
        full = self.timesteps(num_inference_steps, strength, denoising_start,
                              custom_timesteps=custom_timesteps)
        prev = self.prev_timesteps(full, num_inference_steps)
        if denoising_end is not None and 0.0 < denoising_end < 1.0:
            n = self.cfg.num_train_timesteps
            cutoff = int(round(n - denoising_end * n))
            keep = int(np.sum(np.asarray(full) >= cutoff))
            full, prev = full[:keep], prev[:keep]
        return full, prev

    def prev_timesteps(self, timesteps, num_inference_steps: int = None):
        """Previous timestep for each entry of ``timesteps``.

        Derived from the actual array (prev of ts[i] is ts[i+1]; the final
        step's prev is -1, i.e. "fully denoised") so that ``trailing`` and
        ``linspace`` spacings — whose strides are non-uniform after rounding —
        step to the timesteps the loop will actually visit. For the default
        ``leading`` spacing this matches the diffusers formula
        ``t - num_train_timesteps // num_inference_steps`` at every step but
        the last, where both are negative (terminal: no noise is added and
        alpha_cumprod_prev = 1). ``num_inference_steps`` is accepted for
        call-site compatibility but unused.
        """
        ts = jnp.asarray(timesteps)  # tracer-safe: ts may be traced in jit
        return jnp.concatenate([ts[1:], jnp.full((1,), -1, ts.dtype)])

    def predict_x0(self, model_output, sample, t):
        """Recover x0 from the model output under the configured
        prediction_type. All math fp32."""
        ac = self.alphas_cumprod[t].astype(jnp.float32)
        sqrt_ac = jnp.sqrt(ac)
        sqrt_1mac = jnp.sqrt(1.0 - ac)
        s = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        pt = self.cfg.prediction_type
        if pt == "epsilon":
            return (s - sqrt_1mac * m) / jnp.maximum(sqrt_ac, 1e-8)
        if pt == "v_prediction":
            return sqrt_ac * s - sqrt_1mac * m
        if pt == "sample":
            return m
        raise ValueError(pt)

    def step(self, model_output, t, prev_t, sample, noise):
        """One reverse DDPM step: posterior mean + fixed_small variance noise
        (diffusers DDPMScheduler.step semantics). ``noise`` must be supplied
        (shape of sample) — RNG is explicit so the loop scans cleanly.

        t, prev_t: scalar int32 (prev_t may be negative for the final step).
        """
        ac_t = self.alphas_cumprod[t].astype(jnp.float32)
        ac_prev = jnp.where(prev_t >= 0,
                            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
                            jnp.float32(1.0))
        beta_prod_t = 1.0 - ac_t
        beta_prod_prev = 1.0 - ac_prev
        current_alpha = ac_t / ac_prev
        current_beta = 1.0 - current_alpha

        x0 = self.predict_x0(model_output, sample, t)

        pred_coeff = jnp.sqrt(ac_prev) * current_beta / beta_prod_t
        sample_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
        prev_mean = pred_coeff * x0 + sample_coeff * sample.astype(jnp.float32)

        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta,
                            1e-20, None)
        std = jnp.sqrt(variance)
        # no noise on the final step (t' < 0)
        std = jnp.where(prev_t >= 0, std, 0.0)
        prev = prev_mean + std * noise.astype(jnp.float32)
        return prev.astype(sample.dtype), x0.astype(sample.dtype)


def classifier_free_guidance(noise_uncond, noise_text, scale,
                             guidance_rescale: float = 0.0):
    """CFG combine + optional Imagen-style rescale
    (reference: src/tryon_pipeline.py:102 rescale_noise_cfg, :1814-1820)."""
    u = noise_uncond.astype(jnp.float32)
    c = noise_text.astype(jnp.float32)
    guided = u + scale * (c - u)
    if guidance_rescale > 0.0:
        axes = tuple(range(1, guided.ndim))
        std_text = jnp.std(c, axis=axes, keepdims=True)
        std_guided = jnp.std(guided, axis=axes, keepdims=True)
        rescaled = guided * (std_text / jnp.maximum(std_guided, 1e-8))
        guided = (guidance_rescale * rescaled
                  + (1.0 - guidance_rescale) * guided)
    return guided.astype(noise_uncond.dtype)
