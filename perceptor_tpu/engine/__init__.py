from perceptor_tpu.engine.guidance import (
    export_guided_sample,
    guided_sample,
    make_guidance_step,
    optimize,
    run_on_device,
)

__all__ = [
    "export_guided_sample",
    "guided_sample",
    "make_guidance_step",
    "optimize",
    "run_on_device",
]
