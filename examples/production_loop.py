"""Production-shaped guided optimization: checkpointing + statistics.

The reference leaves the optimization loop to user scripts and ships no
checkpoint/resume or metrics (SURVEY §5) — an interrupted run simply
starts over. This example shows the long-run production pattern here:

- `utils.SessionManager` — interval-policy async checkpoints (and a
  preemption-triggered flush on preemptible TPU deployments); the run
  resumes from the latest step after a restart.
- `utils.stats` — loss/grad statistics collected into a pytree bag and
  summarized host-side in windows (mean/std per 50 steps).
- `utils.StepTimer` — honest per-step wall timing.

Run: python examples/production_loop.py  (re-run it to see it resume)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout

import jax
import optax

from perceptor_tpu import drawers, engine, losses, utils
from perceptor_tpu.utils import stats

CHECKPOINT_DIR = os.path.join(os.path.dirname(__file__), "production_ckpt")
TOTAL_STEPS = 300


def main():
    drawer = drawers.Raw.random_fractal_image((1, 3, 256, 256), seed=0)

    loss = losses.CLIP("ViT-B-32")
    try:
        loss.add_texts_(["a watercolor painting of a fox"])
    except FileNotFoundError:  # offline: no BPE vocab on disk
        target = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
        loss.add_encodings_(target)
    smoothness = losses.Smoothness()

    optimizer = optax.adam(0.05)
    step, frozen = engine.make_guidance_step(
        drawer, [loss, smoothness], optimizer, loss_weights=[1.0, 0.05]
    )

    params = drawer.params
    opt_state = optimizer.init(params)
    start = 0

    manager = utils.SessionManager(
        CHECKPOINT_DIR, max_to_keep=2, save_interval_steps=100
    )
    resumed = manager.restore_latest(
        {"params": params, "opt_state": opt_state, "step": 0}
    )
    if resumed is not None:
        start, state = resumed
        params, opt_state = state["params"], state["opt_state"]
        start = int(state["step"]) + 1
        print(f"resumed from step {start - 1}")

    collector = stats.Collector()
    timer = utils.StepTimer()
    bag = stats.zeros(["loss"])

    for i in range(start, TOTAL_STEPS):
        with timer.step() as probe:
            params, opt_state, aux = step(params, opt_state, frozen)
            probe(aux["loss"])
        bag = stats.report(bag, "loss", aux["loss"])
        manager.save(i, {"params": params, "opt_state": opt_state, "step": i})
        if (i + 1) % 50 == 0:
            collector.update(bag)
            print(
                f"step {i + 1}: loss {collector.mean('loss'):.4f} "
                f"± {collector.std('loss'):.4f} over the last {collector.num('loss')}"
            )
    manager.save(TOTAL_STEPS - 1, {"params": params, "opt_state": opt_state,
                                   "step": TOTAL_STEPS - 1}, force=True)
    manager.close()

    if timer.times:
        s = timer.summary()
        print(f"{s['steps_per_sec']:.1f} steps/s (host loop incl. dispatch)")
    image = drawer.synthesize(params).clip(0.0, 1.0)
    utils.pil_image(image).save("production_loop.png")
    print("wrote production_loop.png")


if __name__ == "__main__":
    main()
