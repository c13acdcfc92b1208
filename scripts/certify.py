"""Golden-value certification harness for weight-arrival day (VERDICT r2 #6).

The reference's integration bar is end-to-end sampled images written for
human inspection (reference velocity_diffusion.py:196-198,
stable_diffusion.py:507-509 saving tests/*.png) plus one numeric per-step
parity test against diffusers (stable_diffusion.py:633-658: text
encodings atol 1e-3, predicted noise 5e-3, next latents <=1e-3). This
script is the one-command equivalent for the rebuild: point it at a
checkpoint directory and it

  1. loads every family's real weights (falling back to random init with
     a clear ``weights: random`` marker — the CI mode this repo runs in),
  2. runs each family's reference 50-step config through the fused
     samplers,
  3. writes images + a JSON report with per-family status and output
     statistics, and
  4. (--parity, needs torch + the reference checkout) drives the
     REFERENCE'S OWN vendored CompVis UNet with the same loaded SD
     weights for one step and asserts the reference tolerance bar:
     predicted noise atol 5e-3, next latents max-abs <= 1e-3.

Usage:
    python scripts/certify.py [--checkpoints DIR] [--out DIR]
        [--families sd,velocity,adm,ldm,monster,stylegan]  (generators)
        [--families all]    (generators + the 17-model perception zoo
                             [clip open-clip transformers-clip blip cloob
                             slip ruclip lit glide-clip owlvit midas
                             adabins vgg resmem lpips super-resolution
                             simulacra] + the drawers smoke)
        [--steps N] [--parity] [--quick]

--parity on a perception family runs that model's torch-twin pytest
parity suite (built from the reference's vendored modules) and records
pass/fail in the report.

Exit code 0 = everything it could run is green; families whose weights
are missing are reported, not failed (weight-arrival day re-runs flip
them to certified one by one).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_FAMILIES = ("sd", "velocity", "adm", "ldm", "monster", "stylegan")


def _stats(images) -> dict:
    import numpy as np

    a = np.asarray(images, np.float32)
    return {
        "shape": list(a.shape),
        "min": float(a.min()),
        "max": float(a.max()),
        "std": float(a.std()),
        "finite": bool(np.isfinite(a).all()),
    }


def _save(images, out_dir: str, name: str) -> str:
    import jax.numpy as jnp

    from perceptor_tpu import utils

    path = os.path.join(out_dir, f"{name}.png")
    utils.pil_image(jnp.clip(jnp.asarray(images), 0.0, 1.0)).save(path)
    return path


def _weights_state(*candidates) -> str:
    from perceptor_tpu.utils.checkpoints import find_checkpoint

    path = find_checkpoint(*candidates)
    return path if path is not None else "random"


def certify_sd(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
    import jax

    from perceptor_tpu.models.stable_diffusion import StableDiffusion

    name = "runwayml/stable-diffusion-v1-5"
    weights = _weights_state(
        f"stable_diffusion_{name.replace('/', '_')}", name
    )
    if quick and weights == "random":
        from perceptor_tpu.models.clip.tokenizer import SimpleTokenizer

        model = StableDiffusion(
            "tiny", fp16=False, tokenizer=SimpleTokenizer(merges=[])
        )
        size = (64, 64)
    else:
        model = StableDiffusion(name)
        size = (512, 512)
    t0 = time.time()
    images = model.sample(
        ["a photograph of an astronaut riding a horse"],
        n_steps=steps, size=size, key=jax.random.PRNGKey(0),
    )
    result = {
        "weights": weights,
        "config": f"text2image CFG {steps}-step DDIM at {size[0]}px "
        "(reference stable_diffusion.py:384-491)",
        "seconds": round(time.time() - t0, 1),
        "image": _save(images, out_dir, "stable_diffusion"),
        "stats": _stats(images),
    }
    if parity:
        result["parity"] = _sd_parity(model)
    return result


def _sd_parity(model) -> dict:
    """One-step parity vs the reference's vendored CompVis UNet + its own
    Predictions class, with the SAME weights (the reference bar,
    stable_diffusion.py:633-658). Only meaningful with real weights; with
    random init it certifies the harness itself."""
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import jax.numpy as jnp
    import torch

    from tests.test_sd_step_parity import _load_reference_predictions
    from tests.test_latent_diffusion import _register_reference_ldm  # noqa: F401
    import importlib

    ref_predictions = _load_reference_predictions()
    _register_reference_ldm()
    openaimodel = importlib.import_module(
        "perceptor.models.latent_diffusion.ldm.modules.diffusionmodules.openaimodel"
    )
    cfg = model.unet_config
    torch_model = openaimodel.UNetModel(
        image_size=64, in_channels=cfg.in_channels, out_channels=4,
        model_channels=cfg.base_channels, num_res_blocks=cfg.n_res_blocks,
        attention_resolutions=tuple(
            2 ** i for i, a in enumerate(cfg.cross_attention) if a
        ),
        channel_mult=cfg.channel_mults, num_heads=cfg.n_heads,
        use_spatial_transformer=True, transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim, legacy=False,
    ).eval()
    # push MY loaded params back into the torch twin (inverse rename):
    # round-trip via the compvis->diffusers map is 1:1, so load the
    # state dict my converter consumed if a real file exists; for random
    # init, export my flax tree into the torch layout
    from perceptor_tpu.models.stable_diffusion import convert as sd_convert
    from perceptor_tpu.utils.checkpoints import find_checkpoint, load_state_dict

    path = find_checkpoint(
        f"stable_diffusion_{model.name.replace('/', '_')}", model.name
    )
    if path is None:
        return {"status": "skipped (no real checkpoint; nothing to certify)"}
    sd = load_state_dict(path)
    sd = {k: torch.tensor(v) for k, v in sd.items()}
    is_compvis = any(k.startswith("model.diffusion_model.") for k in sd)
    if not is_compvis:
        return {"status": "skipped (diffusers layout; run the -m slow tier)"}
    torch_sd = {
        k[len("model.diffusion_model."):]: v
        for k, v in sd.items()
        if k.startswith("model.diffusion_model.")
    }
    torch_model.load_state_dict(torch_sd)

    rng = np.random.default_rng(0)
    latents = rng.normal(size=(1, 4, 64, 64)).astype(np.float32)
    context = rng.normal(size=(1, 77, cfg.context_dim)).astype(np.float32)
    from_idx, to_idx = 801, 761
    with torch.no_grad():
        ref_noise = torch_model(
            torch.tensor(latents), torch.tensor([float(from_idx)]),
            context=torch.tensor(context),
        )
        ref_pred = ref_predictions.Predictions(
            from_diffused_latents=torch.tensor(latents),
            from_indices=torch.tensor([from_idx]),
            predicted_noise=ref_noise,
            schedule_alphas=torch.tensor(np.asarray(model.schedule_alphas)),
            schedule_sigmas=torch.tensor(np.asarray(model.schedule_sigmas)),
            encode=lambda v: v, decode=lambda v: v,
        )
        ref_next = ref_pred.step(torch.tensor([to_idx])).numpy()

    mine = model.predictions_fn(
        model.params, jnp.asarray(latents), jnp.asarray([from_idx]),
        jnp.asarray(context),
    )
    noise_err = float(
        np.abs(np.asarray(mine.predicted_noise) - ref_noise.numpy()).max()
    )
    next_err = float(
        np.abs(np.asarray(mine.step(jnp.asarray([to_idx]))) - ref_next).max()
    )
    ok = noise_err <= 5e-3 and next_err <= 1e-3
    return {
        "status": "certified" if ok else "FAILED",
        "noise_max_abs_err": noise_err,
        "next_latents_max_abs_err": next_err,
        "bar": "noise<=5e-3, latents<=1e-3 (stable_diffusion.py:633-658)",
    }


def certify_velocity(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
    import jax

    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    model = VelocityDiffusion("tiny" if quick else "yfcc_2")
    t0 = time.time()
    images = model.sample(
        n_images=1, n_steps=3 if quick else steps, key=jax.random.PRNGKey(0)
    )
    return {
        "weights": _weights_state("velocity_diffusion_yfcc_2", "yfcc_2"),
        "config": f"yfcc_2 512px {steps}-step DDIM "
        "(reference velocity_diffusion.py:167-198)",
        "seconds": round(time.time() - t0, 1),
        "image": _save(images, out_dir, "velocity_diffusion_yfcc_2"),
        "stats": _stats(images),
    }


def certify_adm(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
    import jax

    from perceptor_tpu.models.guided_diffusion import GuidedDiffusion

    model = GuidedDiffusion("tiny" if quick else "standard")
    t0 = time.time()
    images = model.sample(
        n_images=1, n_steps=3 if quick else steps, key=jax.random.PRNGKey(0),
    )
    return {
        "weights": _weights_state("guided_diffusion_standard", "standard"),
        "config": f"ADM 512px {steps}-step DDIM rho=3 "
        "(reference guided_diffusion.py:158-196)",
        "seconds": round(time.time() - t0, 1),
        "image": _save(images, out_dir, "guided_diffusion"),
        "stats": _stats(images),
    }


def certify_ldm(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
    import jax

    from perceptor_tpu.models.latent_diffusion import Text2Image
    from perceptor_tpu.models.latent_diffusion import bert as bert_lib

    model = Text2Image(tiny=quick)
    try:
        model.tokenizer  # probes the vocab file
    except FileNotFoundError:
        # offline: minimal in-memory vocab (same compute path; real vocab
        # drops into models/bert-base-uncased-vocab.txt later)
        model._tokenizer = bert_lib.BERTTokenizer(
            vocab=["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
            + [chr(c) for c in range(ord("a"), ord("z") + 1)],
            max_length=model.bert_config.max_seq_len,
        )
    t0 = time.time()
    images = model.sample(
        ["a virus monster is playing guitar, oil on canvas"],
        n_steps=3 if quick else steps, size=(64, 64) if quick else (256, 256),
        key=jax.random.PRNGKey(0),
    )
    return {
        "weights": _weights_state("latent_diffusion_text2image"),
        "config": f"txt2img-1p4B 256px {steps}-step DDIM + CFG "
        "(reference text2image.py:164-179)",
        "seconds": round(time.time() - t0, 1),
        "image": _save(images, out_dir, "ldm_text2image"),
        "stats": _stats(images),
    }


def certify_monster(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
    import jax

    from perceptor_tpu.models.monster_diffusion import MonsterDiffusion

    model = MonsterDiffusion("tiny" if quick else "all")
    t0 = time.time()
    images = model.sample(
        4, n_evaluations=10 if quick else 100, key=jax.random.PRNGKey(0)
    )
    return {
        "weights": _weights_state("monster_diffusion_all", "all"),
        "config": "48px elucidated sampler, n_evaluations=100 "
        "(reference monster_diffusion.py:201-211)",
        "seconds": round(time.time() - t0, 1),
        "image": _save(images, out_dir, "monster_diffusion"),
        "stats": _stats(images),
    }


def certify_stylegan(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
    from perceptor_tpu.models.stylegan_xl import StyleGANXL

    name = "tiny" if quick else "imagenet128"
    model = StyleGANXL(name)
    t0 = time.time()
    latents = model.latents(2, seeds=[0, 1], truncation_psi=0.7)
    images = model(latents)
    return {
        "weights": _weights_state(f"stylegan_xl_{name}", name),
        "config": "seeds->w(truncation 0.7)->synthesis "
        "(reference stylegan_xl.py:54-62)",
        "seconds": round(time.time() - t0, 1),
        "image": _save(images, out_dir, "stylegan_xl"),
        "stats": _stats(images),
    }


# -- perception / encoder zoo (VERDICT r3 next #6) ---------------------------
#
# The 17 encoder models are the loss-backbone layer; on weight-arrival
# day their converters meet real files for the first time. Each entry
# certifies: construction (real weights when found, `weights: random`
# otherwise), a deterministic forward (embeddings/depth/score stats,
# finiteness), text encoding when tokenizer assets resolve, and with
# --parity the model's existing torch-twin parity tests (pytest, built
# from the reference's vendored modules).
#
# spec: (module path, class, kwargs, quick_kwargs, weight names, parity
# test file, drive kind)

PERCEPTION = {
    "clip": ("perceptor_tpu.models", "CLIP", {"name": "ViT-B-32"}, None,
             ("open_clip_ViT-B-32_openai",), "tests/test_clip.py", "clip"),
    "open-clip": ("perceptor_tpu.models.open_clip", "OpenCLIP",
                  {"architecture": "ViT-B-32", "weights": "openai"}, None,
                  ("open_clip_ViT-B-32_openai",), "tests/test_clip.py",
                  "clip"),
    "transformers-clip": (
        "perceptor_tpu.models.transformers_openai_clip",
        "TransformersOpenAICLIP", {"name": "openai/clip-vit-base-patch32"},
        None, ("transformers_clip_openai_clip-vit-base-patch32",),
        "tests/test_encoder_zoo.py", "clip"),
    "blip": ("perceptor_tpu.models.blip", "BLIP", {},
             {"name": "tiny"}, ("blip_model_base_retrieval_flickr",),
             "tests/test_blip.py", "clip"),
    "cloob": ("perceptor_tpu.models.cloob", "CLOOB", {},
              {"name": "tiny"}, ("cloob_16-epochs",),
              "tests/test_encoder_zoo.py", "clip"),
    "slip": ("perceptor_tpu.models.slip", "SLIP", {},
             {"name": "tiny"}, ("slip_SLIP_VITB16",),
             "tests/test_encoder_zoo.py", "clip"),
    "ruclip": ("perceptor_tpu.models.ruclip", "RuCLIP", {},
               {"name": "tiny"}, ("ruclip_ruclip-vit-base-patch32-224",),
               "tests/test_encoder_zoo.py", "images-only"),
    "lit": ("perceptor_tpu.models.lit", "LiT", {},
            {"name": "tiny"}, ("lit_LiT-L16L",), "tests/test_lit.py",
            "images-only"),
    "glide-clip": ("perceptor_tpu.models.glide_clip", "GlideCLIP", {},
                   {"name": "tiny"},
                   ("glide_clip_text_enc", "glide_clip_image_enc"),
                   "tests/test_glide_clip.py", "glide"),
    "owlvit": ("perceptor_tpu.models.owlvit", "OWLViT", {},
               {"name": "tiny"}, ("owlvit_google_owlvit-base-patch32",),
               "tests/test_owlvit.py", "owlvit"),
    "midas": ("perceptor_tpu.models.midas_depth", "MidasDepth", {},
              {"name": "tiny"}, ("midas_dpt_large",),
              "tests/test_midas_depth.py", "map"),
    "adabins": ("perceptor_tpu.models.adabins_depth", "AdaBinsDepth", {},
                {"tiny": True}, ("adabins_nyu",),
                "tests/test_adabins_depth.py", "map"),
    "vgg": ("perceptor_tpu.models.vgg", "VGG19", {}, None,
            ("vgg19", "vgg19_features"), "tests/test_losses_and_engine.py",
            "features"),
    "resmem": ("perceptor_tpu.models.resmem", "ResMem", {},
               {"name": "tiny"}, ("resmem",), "tests/test_resmem.py", "map"),
    "lpips": ("perceptor_tpu.models.lpips", "LPIPS", {}, None,
              ("lpips_squeeze_backbone",), "tests/test_losses_batch2.py",
              "pair"),
    "super-resolution": ("perceptor_tpu.models.super_resolution",
                         "SuperResolution", {}, {"name": "tiny"},
                         ("super_resolution_x4",),
                         "tests/test_super_resolution.py", "enhance"),
    "simulacra": ("perceptor_tpu.models.simulacra_aesthetic",
                  "SimulacraAesthetic", {"model_name": "RN50"}, None,
                  ("simulacra_RN50",), "tests/test_simulacra_real_weights.py",
                  "map"),
}


def _drive_perception(model, kind):
    """Deterministic forward through the wrapper's public API."""
    import jax
    import jax.numpy as jnp

    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64))
    out = {}
    if kind == "clip":
        out["image_encodings"] = _stats(model.encode_images(images))
        try:
            out["text_encodings"] = _stats(
                model.encode_texts(["a photograph of a cat", "a dog"])
            )
        except (FileNotFoundError, ValueError, ImportError) as e:
            out["text_encodings"] = f"unavailable ({e})"
    elif kind == "images-only":
        try:
            out["image_encodings"] = _stats(model.encode_images(images))
        except AttributeError:
            out["forward"] = _stats(model(images))
    elif kind == "glide":
        ts = jnp.asarray([100, 500])
        out["image_encodings"] = _stats(model.encode_images(images, ts))
    elif kind == "owlvit":
        encodings = model.encode_texts([["a cat", "a dog"], ["a tree", "x"]])
        preds = model.forward(images, encodings)
        out["logits"] = _stats(preds.logits)
        out["boxes"] = _stats(preds.boxes)
    elif kind == "map":
        fwd = getattr(model, "__call__", None)
        for attr in ("predict", "forward", "__call__"):
            if callable(getattr(model, attr, None)):
                fwd = getattr(model, attr)
                break
        out["forward"] = _stats(fwd(images))
    elif kind == "features":
        feats = model(images)
        leaf = feats[0] if isinstance(feats, (list, tuple)) else feats
        out["features"] = _stats(leaf)
    elif kind == "pair":
        out["distance"] = _stats(model(images, images[::-1]))
    elif kind == "enhance":
        out["enhanced"] = _stats(model.enhance(images[:1]))
    else:
        raise ValueError(kind)
    return out


def _run_parity_tests(test_path: str) -> dict:
    """Run the model's torch-twin parity tests (slow tier included)."""
    import subprocess

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", test_path, "-q", "-m", "",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    return {
        "status": "certified" if proc.returncode == 0 else "FAILED",
        "seconds": round(time.time() - t0, 1),
        "pytest": tail,
    }


def make_perception_certifier(key):
    module_path, cls_name, kwargs, quick_kwargs, weight_names, test_path, kind = (
        PERCEPTION[key]
    )

    def certify(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
        import importlib

        module = importlib.import_module(module_path)
        cls = getattr(module, cls_name)
        build_kwargs = dict(kwargs)
        if quick and quick_kwargs is not None:
            build_kwargs = dict(quick_kwargs)
        t0 = time.time()
        model = getattr(cls, "__wrapped__", cls)(**build_kwargs)
        result = {
            "weights": _weights_state(*weight_names),
            "config": f"{cls_name}({build_kwargs})",
            "forward": _drive_perception(model, kind),
            "seconds": round(time.time() - t0, 1),
        }
        if parity:
            result["parity"] = _run_parity_tests(test_path)
        return result

    return certify


def certify_drawers(out_dir: str, steps: int, quick: bool, parity: bool) -> dict:
    """Produce-an-image smoke through every generator drawer (§2.3):
    JPEG codec roundtrip, ruDALL-E GumbelVQ decode, DeepImagePrior
    forward, Raw fractal init, BruteDiffusion wrap. StyleGANXL has its
    own family entry."""
    import jax
    import jax.numpy as jnp

    from perceptor_tpu import drawers

    report = {}

    init = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64))
    jpeg = drawers.JPEG(init)
    report["jpeg"] = _stats(jpeg.synthesize(jpeg.params))

    rudalle = drawers.BruteRuDalle(
        jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 32, 32)), tiny=True
    )
    report["rudalle"] = _stats(rudalle.synthesize(rudalle.params))

    dip = drawers.DeepImagePrior(size=(64, 64), seed=0)
    report["deep_image_prior"] = _stats(dip.synthesize(dip.params))

    raw = drawers.Raw.random_fractal_image((1, 3, 64, 64), seed=0)
    report["raw_fractal"] = _stats(raw.synthesize(raw.params))

    from perceptor_tpu.models.velocity_diffusion import VelocityDiffusion

    bd = drawers.BruteDiffusion.from_image(
        VelocityDiffusion("tiny"),
        jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 32, 32)),
        t=0.7, key=jax.random.PRNGKey(4),
    )
    report["brute_diffusion"] = _stats(bd.synthesize(bd.params))

    for name, stats in report.items():
        assert stats["finite"], f"{name} produced non-finite output"
    sample = jnp.clip(jnp.asarray(dip.synthesize(dip.params)), 0, 1)
    return {
        "weights": "random (drawers are weight-free or tiny here)",
        "config": "JPEG/rudalle/DIP/raw/brute-diffusion produce-an-image",
        "image": _save(sample, out_dir, "drawers_dip"),
        "drawers": report,
    }


CERTIFIERS = {
    "sd": certify_sd,
    "velocity": certify_velocity,
    "adm": certify_adm,
    "ldm": certify_ldm,
    "monster": certify_monster,
    "stylegan": certify_stylegan,
    "drawers": certify_drawers,
    **{key: make_perception_certifier(key) for key in PERCEPTION},
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoints", default=None,
                    help="checkpoint directory (sets PERCEPTOR_TPU_CACHE)")
    ap.add_argument("--out", default="certify_out")
    ap.add_argument("--families", default=",".join(DEFAULT_FAMILIES))
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--parity", action="store_true",
                    help="one-step torch parity vs the reference's vendored "
                    "UNet at the reference tolerance bar (needs torch + "
                    "/root/reference + a real SD checkpoint)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny configs / few steps (CI self-test mode)")
    args = ap.parse_args()

    if args.checkpoints:
        os.environ["PERCEPTOR_TPU_CACHE"] = args.checkpoints
        # CACHE_DIRS is read at import time — set env BEFORE package import
    os.makedirs(args.out, exist_ok=True)

    families = (
        list(CERTIFIERS)
        if args.families.strip() == "all"
        else args.families.split(",")
    )
    report, failed = {}, []
    for family in families:
        family = family.strip()
        if family not in CERTIFIERS:
            raise SystemExit(
                f"unknown family {family!r}; choose from {sorted(CERTIFIERS)}"
            )
        try:
            report[family] = CERTIFIERS[family](
                args.out, args.steps, args.quick, args.parity
            )
            status = report[family].get("parity", {}).get("status", "")
            if status == "FAILED":
                failed.append(family)
        except Exception:
            report[family] = {"error": traceback.format_exc(limit=8)}
            failed.append(family)
        print(f"[certify] {family}: "
              f"{'ERROR' if 'error' in report[family] else 'ok'}")

    path = os.path.join(args.out, "certify_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[certify] report: {path}")
    if failed:
        print(f"[certify] FAILED: {failed}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
