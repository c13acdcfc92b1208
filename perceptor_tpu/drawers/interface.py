"""Drawer interface.

The reference drawer is a stateful nn.Module holding nn.Parameters
(reference perceptor/drawers/interface.py:4-15). The TPU-native design is
functional: a drawer separates

  - `params` — the optimizable pytree (what optax updates),
  - `synthesize(params) -> images` — a pure, jit-safe decode,
  - `encode(images) -> params` — project images into parameter space,

and keeps a thin stateful convenience layer (`.params` attribute,
`replace_`) so user code reads like the reference. All stochastic inits
take explicit seeds.
"""

from __future__ import annotations


class DrawingInterface:
    params = None
    #: frozen decoder weights threaded by the engine as jit arguments
    #: (engine/guidance.py _gather_frozen); None when the drawer has none
    model_params = None

    def __call__(self, params=None):
        return self.synthesize(params)

    def synthesize(self, params=None):
        raise NotImplementedError

    def encode(self, images):
        raise NotImplementedError

    def replace_(self, params):
        """Swap in new parameter values (reference `replace_`, interface.py:14)."""
        self.params = params
        return self
