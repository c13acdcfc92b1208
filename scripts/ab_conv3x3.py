"""A/B: 3x3-conv lowerings for the shapes XLA won't strip-mine.

The im2col matmul (ops/conv_matmul.py) runs at ~190 TF/s but materializes
9x the input bytes as a concatenate — 35 ms of pure bandwidth per 20-step
sample() call. Variants that keep the MXU rate without the concat:

  xla     — lax.conv (XLA's emitter; the 23-25 TF/s baseline)
  im2col  — current: 9-shift concat -> one (NHW, 9C)x(9C, Cout) matmul
  shifts  — sum of 9 dot_generals on shifted NHWC slices (no reshape,
            contracting dim = C); zero patch materialization if XLA
            fuses the slice reads into the dots
  rows3   — compromise: concat 3 ky-shifts (3C channels), then 3 dots
            over kx-shifted slices + add (3x bytes instead of 9x)

Timed as N-iteration scan chains (per-dispatch RPC floor is ~1.7 ms).
Usage: python scripts/ab_conv3x3.py [--grad]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

WITH_GRAD = "--grad" in sys.argv


def conv_xla(x, kernel, bias):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias


def conv_im2col(x, kernel, bias):
    from perceptor_tpu.ops.conv_matmul import conv3x3_as_matmul
    return conv3x3_as_matmul(x, kernel, bias)


def conv_shifts(x, kernel, bias):
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for ky in range(3):
        for kx in range(3):
            xs = jax.lax.slice(xp, (0, ky, kx, 0), (n, ky + h, kx + w, c))
            contrib = jax.lax.dot_general(
                xs, kernel[ky, kx], (((3,), (0,)), ((), ()))
            )
            out = contrib if out is None else out + contrib
    return out + bias


def conv_rows3(x, kernel, bias):
    n, h, w, c = x.shape
    kh, kw, cin, cout = kernel.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # concat the 3 ky shifts -> (n, h, w+2, 3c); kx handled by slicing
    rows = jnp.concatenate(
        [xp[:, ky : ky + h, :, :] for ky in range(3)], axis=-1
    )
    wk = kernel.transpose(1, 0, 2, 3).reshape(3, 3 * cin, cout)  # kx-major
    out = None
    for kx in range(3):
        xs = jax.lax.slice(rows, (0, 0, kx, 0), (n, h, kx + w, 3 * c))
        contrib = jax.lax.dot_general(xs, wk[kx], (((3,), (0,)), ((), ())))
        out = contrib if out is None else out + contrib
    return out + bias


VARIANTS = {
    "xla": conv_xla,
    "im2col": conv_im2col,
    "shifts": conv_shifts,
    "rows3": conv_rows3,
}

CASES = [
    ("sd-L0 2x64x64x320->320", (2, 64, 64, 320), 320),
    ("sd-L0skip 2x64x64x960->320", (2, 64, 64, 960), 320),
    ("vae 1x128x128x512->512", (1, 128, 128, 512), 512),
    ("vae 1x64x64x512->512", (1, 64, 64, 512), 512),
]


def timeit(fn, x, kernel, bias, n=50):
    if WITH_GRAD:
        base = fn

        def fn_loss(x, kernel, bias):
            return jnp.sum(base(x, kernel, bias).astype(jnp.float32) ** 2)

        gr = jax.grad(fn_loss)

        def op(x, kernel, bias):
            return gr(x, kernel, bias)
    else:
        op = fn

    @jax.jit
    def run(x, kernel, bias):
        def body(x, _):
            out = op(x, kernel, bias)
            delta = jax.lax.convert_element_type(
                jnp.max(out).astype(jnp.float32) * 1e-12, x.dtype
            )
            return x + delta, ()

        x, _ = jax.lax.scan(body, x, None, length=n)
        return x

    out = run(x, kernel, bias)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    out = run(x, kernel, bias)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}  grad={WITH_GRAD}")
    for name, xshape, cout in CASES:
        n, h, w, c = xshape
        fl = 2 * n * h * w * c * cout * 9 * (3 if WITH_GRAD else 1)
        x = jax.random.normal(key, xshape, jnp.bfloat16)
        kernel = jax.random.normal(key, (3, 3, c, cout), jnp.bfloat16) * 0.02
        bias = jnp.zeros((cout,), jnp.bfloat16)
        # correctness vs xla path first
        ref = conv_xla(x, kernel, bias)
        row = [f"{name:28s}"]
        for vname, fn in VARIANTS.items():
            err = float(jnp.max(jnp.abs(fn(x, kernel, bias).astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t = timeit(fn, x, kernel, bias)
            row.append(f"{vname} {t*1e3:6.3f}ms ({fl/t/1e12:5.1f}TF/s, err {err:.1e})")
        print("  ".join(row))


if __name__ == "__main__":
    main()
