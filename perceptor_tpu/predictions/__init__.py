"""The diffusion Predictions algebra — immutable pytree value objects.

The reference's core IP (SURVEY §2.4): every diffusion model returns a
Predictions value object carrying the raw network output plus schedule
state, and derives everything else (denoised image, predicted noise, DDIM
step, guidance, thresholding, RePaint resampling) lazily from it.

TPU-native redesign vs the reference
(perceptor/models/velocity_diffusion/predictions.py:9-216,
 perceptor/models/stable_diffusion/predictions.py:10-250,
 perceptor/models/guided_diffusion/predictions.py:9-198,
 perceptor/models/monster_diffusion/prediction.py:38+):

  - ONE shared algebra (`base.PredictionAlgebra`) expressed over the
    canonical pair (denoised_xs, predicted_noise) and per-sample
    (alpha, sigma); the four parameterizations (velocity, indexed-eps on
    latents, indexed-eps on pixels, EDM denoised) are thin adapters.
  - Immutable pytrees (core.Functional): flow through jit/grad/vmap/scan.
  - Explicit PRNG keys for every stochastic method (step with eta>0,
    resample, noisy_reverse_step) instead of implicit torch.randn_like.
  - Data-dependent branches in the reference (e.g. the sigma>=1e-3 guard
    in forced_denoised_images) become per-sample jnp.where selects.
"""

from perceptor_tpu.predictions import diffusion_space
from perceptor_tpu.predictions.velocity import VelocityPredictions
from perceptor_tpu.predictions.indexed import (
    IndexedEpsPredictions,
    LatentIndexedEpsPredictions,
)
from perceptor_tpu.predictions.edm import EDMPredictions

__all__ = [
    "diffusion_space",
    "VelocityPredictions",
    "IndexedEpsPredictions",
    "LatentIndexedEpsPredictions",
    "EDMPredictions",
]
