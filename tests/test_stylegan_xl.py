"""StyleGAN-XL tests: synthesis-network torch parity + drawer."""

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceptor_tpu import drawers
from perceptor_tpu.models.stylegan_xl import (
    GeneratorConfig,
    StyleGANXL,
    StyleGANXLGenerator,
    SynthesisConfig,
    convert_stylegan_xl,
)

REF_ROOT = "/root/reference/perceptor"


def _register_reference():
    pytest.importorskip("torch")
    pytest.importorskip("scipy")
    chain = {
        "perceptor": REF_ROOT,
        "perceptor.models": f"{REF_ROOT}/models",
        "perceptor.models.stylegan_xl": f"{REF_ROOT}/models/stylegan_xl",
    }
    for name, path in chain.items():
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = [path]
            sys.modules[name] = stub
    return importlib.import_module(
        "perceptor.models.stylegan_xl.networks_stylegan3_resetting"
    )


@pytest.mark.slow
@pytest.mark.parity_smoke
def test_parity_synthesis_network():
    import torch

    networks = _register_reference()
    torch.manual_seed(0)
    torch_net = networks.SynthesisNetwork(
        w_dim=16, img_resolution=32, img_channels=3, channel_base=512,
        channel_max=32, num_layers=6, num_critical=2, margin_size=2,
        conv_kernel=3, use_radial_filters=False,
    ).eval()

    cfg = GeneratorConfig(
        z_dim=8, c_dim=0, w_dim=16,
        synthesis=SynthesisConfig(
            w_dim=16, img_resolution=32, channel_base=512, channel_max=32,
            num_layers=6, margin_size=2,
        ),
    )
    generator = StyleGANXLGenerator(cfg, dtype=jnp.float32)
    sd = {f"synthesis.{k}": v for k, v in torch_net.state_dict().items()}
    params = convert_stylegan_xl(sd, generator)

    # sanity: the host-side filter design must match the reference buffers
    for spec in generator.layers:
        ref_up = torch_net.state_dict().get(f"{spec['name']}.up_filter")
        if spec["up_filter"] is None:
            assert ref_up is None or ref_up.numel() <= 1
        else:
            np.testing.assert_allclose(
                spec["up_filter"], ref_up.numpy(), atol=1e-6,
                err_msg=f"up filter {spec['name']}",
            )

    torch.manual_seed(1)
    ws = torch.randn(2, torch_net.num_ws, 16)
    with torch.no_grad():
        expected = torch_net(ws).numpy()
    actual = generator.synthesis(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ws.numpy())
    )
    np.testing.assert_allclose(np.asarray(actual), expected, atol=5e-4)


def test_stylegan_wrapper_and_drawer():
    model = StyleGANXL("tiny")
    latents = model.latents(2, seeds=[0, 1], truncation_psi=0.7)
    assert latents.shape == (2, model.num_ws, 16)
    images = model(latents)
    assert images.shape == (2, 3, 32, 32)
    assert bool(jnp.all(jnp.isfinite(images)))

    drawer = drawers.StyleGANXL(model=model, latents=latents)
    out = drawer.synthesize()
    assert out.shape == (2, 3, 32, 32)

    def loss(params):
        return jnp.square(drawer.synthesize(params) - 0.5).mean()

    grads = jax.grad(loss)(drawer.params)
    assert bool(jnp.any(grads != 0))
    with pytest.raises(NotImplementedError):
        drawer.encode(images)


def test_unconditional_mapping():
    model = StyleGANXL("tiny")
    # tiny is class-conditional; check the error path for missing classes
    z = jnp.zeros((1, model.config.z_dim))
    with pytest.raises(ValueError):
        model.generator.mapping(model.params, z)
