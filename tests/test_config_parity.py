"""Field-for-field parity between hand-transcribed configs and the
reference's SHIPPED config files (VERDICT r3 missing #2).

The reference instantiates models FROM config files at runtime: LDM
models from OmegaConf YAML (reference latent_diffusion/text2image.py:21-35,
face.py:43-49; 24 YAMLs under configs/ and models/), the ruDALL-E VQGAN
from drawers/rudalle/vqgan.gumbelf8-sber.config.yml, CLOOB from JSON
pretrained_configs, GLIDE CLIP from glide_clip/config.yml, and BLIP from
blip/configs/med_config.json. The rebuild transcribed those into frozen
dataclasses; these tests read the reference's own files (plain YAML/JSON
— no OmegaConf needed) and assert every transcription field-for-field,
so a transposed channel-mult fails TODAY instead of on weight-arrival
day as a shape mismatch.
"""

import json
import os

import pytest

yaml = pytest.importorskip("yaml")

REF_ROOT = "/root/reference/perceptor"


def _need_reference():
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference checkout not present")


def _load_yaml(*parts):
    _need_reference()
    path = os.path.join(REF_ROOT, *parts)
    with open(path) as f:
        return yaml.safe_load(f)


def _load_json(*parts):
    _need_reference()
    path = os.path.join(REF_ROOT, *parts)
    with open(path) as f:
        return json.load(f)


def assert_adm_unet_matches(cfg, params):
    """Rebuild ADMConfig vs an openaimodel.UNetModel params block.

    YAML `attention_resolutions` are DOWNSAMPLE FACTORS (the celebahq
    yaml says so in its own comment), matching the rebuild's
    attention_ds; order is irrelevant (membership tests in both
    implementations).
    """
    assert cfg.image_size == params["image_size"]
    assert cfg.in_channels == params["in_channels"]
    assert cfg.out_channels == params["out_channels"]
    assert cfg.model_channels == params["model_channels"]
    assert cfg.num_res_blocks == params["num_res_blocks"]
    assert tuple(cfg.channel_mult) == tuple(params["channel_mult"])
    assert set(cfg.attention_ds) == set(params["attention_resolutions"])
    if "num_heads" in params:
        assert cfg.num_heads == params["num_heads"]
    if "num_head_channels" in params:
        assert cfg.num_head_channels == params["num_head_channels"]
    assert cfg.spatial_transformer == bool(
        params.get("use_spatial_transformer", False)
    )
    if cfg.spatial_transformer:
        assert cfg.context_dim == params["context_dim"]
        assert cfg.transformer_depth == params["transformer_depth"]
    assert cfg.use_scale_shift_norm == bool(
        params.get("use_scale_shift_norm", False)
    )
    assert cfg.resblock_updown == bool(params.get("resblock_updown", False))


def assert_ddconfig_matches(vae_cfg, dd, n_levels_with_attn=None):
    """Rebuild VAEConfig vs a CompVis/taming `ddconfig` block."""
    assert vae_cfg.latent_channels == dd["z_channels"]
    assert vae_cfg.in_channels == dd["in_channels"]
    assert dd["out_ch"] == dd["in_channels"] == 3
    assert vae_cfg.base_channels == dd["ch"]
    assert tuple(vae_cfg.channel_mults) == tuple(dd["ch_mult"])
    assert vae_cfg.n_res_blocks == dd["num_res_blocks"]
    assert vae_cfg.double_z == bool(dd["double_z"])
    # attn_resolutions (pixel sizes) -> the rebuild's per-level indices:
    # encoder level i runs at resolution/2^i; decoder levels innermost-first
    resolution = dd["resolution"]
    expected_enc = set()
    for attn_res in dd["attn_resolutions"]:
        level = 0
        res = resolution
        while res > attn_res:
            res //= 2
            level += 1
        assert res == attn_res, (resolution, attn_res)
        expected_enc.add(level)
    n_levels = len(dd["ch_mult"])
    expected_dec = {n_levels - 1 - lvl for lvl in expected_enc}
    assert set(vae_cfg.encoder_attn_levels) == expected_enc
    assert set(vae_cfg.decoder_attn_levels) == expected_dec


# -- LDM txt2img-1p4B ---------------------------------------------------------


def test_txt2img_unet():
    from perceptor_tpu.models.latent_diffusion import text2image

    model = _load_yaml(
        "models/latent_diffusion/configs/latent-diffusion",
        "txt2img-1p4B-eval.yaml",
    )["model"]
    assert_adm_unet_matches(
        text2image.TXT2IMG_UNET, model["params"]["unet_config"]["params"]
    )


def test_txt2img_schedule_and_latents():
    from perceptor_tpu.models.latent_diffusion import text2image

    params = _load_yaml(
        "models/latent_diffusion/configs/latent-diffusion",
        "txt2img-1p4B-eval.yaml",
    )["model"]["params"]
    assert text2image.TIMESTEPS == params["timesteps"]
    assert text2image.LINEAR_START == params["linear_start"]
    assert text2image.LINEAR_END == params["linear_end"]
    assert text2image.SCALE_FACTOR == params["scale_factor"]
    assert params["channels"] == 4  # f8 KL latents


def test_txt2img_first_stage_and_bert():
    from perceptor_tpu.models.latent_diffusion import bert, first_stage

    params = _load_yaml(
        "models/latent_diffusion/configs/latent-diffusion",
        "txt2img-1p4B-eval.yaml",
    )["model"]["params"]
    dd = params["first_stage_config"]["params"]["ddconfig"]
    assert_ddconfig_matches(first_stage.KL_F8, dd)
    assert params["first_stage_config"]["params"]["embed_dim"] == (
        first_stage.KL_F8.latent_channels
    )
    cond = params["cond_stage_config"]["params"]
    cfg = bert.BERTConfig()
    assert cfg.width == cond["n_embed"]
    assert cfg.depth == cond["n_layer"]


# -- LDM celebahq face --------------------------------------------------------


def test_face_unet_and_schedule():
    from perceptor_tpu.models.latent_diffusion import face

    params = _load_yaml(
        "models/latent_diffusion/configs/latent-diffusion",
        "celebahq-ldm-vq-4.yaml",
    )["model"]["params"]
    assert_adm_unet_matches(face.FACE_UNET, params["unet_config"]["params"])
    assert face.TIMESTEPS == params["timesteps"]
    assert face.LINEAR_START == params["linear_start"]
    assert face.LINEAR_END == params["linear_end"]
    assert params["cond_stage_config"] == "__is_unconditional__"


def test_face_first_stage():
    from perceptor_tpu.models.latent_diffusion import first_stage

    params = _load_yaml(
        "models/latent_diffusion/configs/latent-diffusion",
        "celebahq-ldm-vq-4.yaml",
    )["model"]["params"]["first_stage_config"]["params"]
    assert_ddconfig_matches(first_stage.VQ_F4, params["ddconfig"])
    assert params["embed_dim"] == first_stage.VQ_F4.latent_channels
    from perceptor_tpu.models.latent_diffusion.first_stage import VQModel

    assert VQModel.n_embed == params["n_embed"]


# -- standalone first-stage model configs -------------------------------------


def test_vq_f4_standalone_yaml():
    from perceptor_tpu.models.latent_diffusion import first_stage

    params = _load_yaml(
        "models/latent_diffusion/models/first_stage_models/vq-f4",
        "config.yaml",
    )["model"]["params"]
    assert_ddconfig_matches(first_stage.VQ_F4, params["ddconfig"])
    assert params["embed_dim"] == 3 and params["n_embed"] == 8192


def test_kl_f8_standalone_yaml():
    from perceptor_tpu.models.latent_diffusion import first_stage

    params = _load_yaml(
        "models/latent_diffusion/models/first_stage_models/kl-f8",
        "config.yaml",
    )["model"]["params"]
    assert_ddconfig_matches(first_stage.KL_F8, params["ddconfig"])
    assert params["embed_dim"] == first_stage.KL_F8.latent_channels


# -- ruDALL-E Gumbel VQGAN ----------------------------------------------------


def test_rudalle_gumbel_vqgan_yaml():
    from perceptor_tpu.drawers import rudalle

    params = _load_yaml("drawers/rudalle", "vqgan.gumbelf8-sber.config.yml")[
        "model"
    ]["params"]
    assert rudalle.EMBED_DIM == params["embed_dim"]
    assert rudalle.N_EMBED == params["n_embed"]
    assert_ddconfig_matches(rudalle.GUMBEL_F8, params["ddconfig"])


# -- CLOOB --------------------------------------------------------------------


@pytest.mark.parametrize("epochs", ["16", "32"])
def test_cloob_json(epochs):
    from perceptor_tpu.models.cloob import CONFIGS

    ref = _load_json(
        "models/cloob/pretrained_configs",
        f"cloob_laion_400m_vit_b_16_{epochs}_epochs.json",
    )
    cfg = CONFIGS[f"{epochs}-epochs"]
    assert cfg.d_embed == ref["d_embed"]
    image = ref["image_encoder"]
    assert image["type"] == "ViT"
    assert cfg.image_size == image["image_size"]
    assert cfg.patch_size == image["patch_size"]
    assert cfg.vision_layers == image["n_layers"]
    assert cfg.vision_width == image["d_model"]
    assert cfg.vision_heads == image["n_heads"]
    text = ref["text_encoder"]
    assert cfg.text_size == text["text_size"]
    assert cfg.vocab_size == text["vocab_size"]
    assert cfg.text_layers == text["n_layers"]
    assert cfg.text_width == text["d_model"]
    assert cfg.text_heads == text["n_heads"]


# -- GLIDE CLIP ---------------------------------------------------------------


def test_glide_clip_yaml():
    from perceptor_tpu.models.glide_clip import GlideCLIPConfig

    ref = _load_yaml("models/glide_clip", "config.yml")
    cfg = GlideCLIPConfig()
    assert cfg.image_size == ref["image_size"]
    assert cfg.patch_size == ref["patch_size"]
    assert cfg.n_vocab == ref["n_vocab"]
    assert cfg.max_text_len == ref["max_text_len"]
    assert cfg.n_embd == ref["n_embd"]
    assert cfg.text_heads == ref["n_head_text"]
    assert cfg.text_blocks == ref["n_xf_blocks_text"]
    assert cfg.image_heads == ref["n_head_image"]
    assert cfg.image_blocks == ref["n_xf_blocks_image"]
    assert cfg.head_state == ref["n_head_state_text"]
    assert cfg.head_state == ref["n_head_state_image"]
    assert cfg.n_timestep == ref["n_timesteps"]
    assert cfg.logit_scale == ref["logit_scale"]


# -- BLIP ---------------------------------------------------------------------


def test_blip_med_config_json():
    from perceptor_tpu.models.blip import BLIPConfig

    ref = _load_json("models/blip/configs", "med_config.json")
    cfg = BLIPConfig()
    assert cfg.text_width == ref["hidden_size"]
    assert cfg.text_heads == ref["num_attention_heads"]
    assert cfg.text_layers == ref["num_hidden_layers"]
    assert cfg.vocab_size == ref["vocab_size"]
    assert cfg.vision_width == ref["encoder_width"]  # base vision tower
    assert ref["intermediate_size"] == 4 * cfg.text_width
    assert ref["add_cross_attention"] is True
