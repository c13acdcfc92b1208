from perceptor_tpu.schedules.cosine import (
    t_to_alpha_sigma,
    alpha_sigma_to_t,
    sigma_to_t,
    log_snr_to_alpha_sigma,
    alpha_sigma_to_log_snr,
    get_ddpm_schedule,
    get_spliced_ddpm_cosine_schedule,
    get_log_schedule,
)
from perceptor_tpu.schedules.karras import (
    karras_sigma_ramp,
    velocity_schedule_ts,
    indexed_schedule,
)
from perceptor_tpu.schedules.ddpm import (
    scaled_linear_alphas_sigmas,
    linear_alphas_sigmas,
)
from perceptor_tpu.schedules.edm import (
    edm_schedule_ts,
    edm_preconditioning,
    EDM,
)

__all__ = [
    "t_to_alpha_sigma",
    "alpha_sigma_to_t",
    "sigma_to_t",
    "log_snr_to_alpha_sigma",
    "alpha_sigma_to_log_snr",
    "get_ddpm_schedule",
    "get_spliced_ddpm_cosine_schedule",
    "get_log_schedule",
    "karras_sigma_ramp",
    "velocity_schedule_ts",
    "indexed_schedule",
    "scaled_linear_alphas_sigmas",
    "linear_alphas_sigmas",
    "edm_schedule_ts",
    "edm_preconditioning",
    "EDM",
]
