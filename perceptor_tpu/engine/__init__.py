from perceptor_tpu.engine.guidance import (
    make_guidance_step,
    optimize,
    run_on_device,
)

__all__ = ["make_guidance_step", "optimize", "run_on_device"]
