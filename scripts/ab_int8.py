"""A/B probe: does the v5e int8 MXU path (394 TOPS vs 197 TF/s bf16)
actually materialize through XLA for the conv/matmul shapes that dominate
SD sampling?  If int8 convs land near 2x bf16, an opt-in W8A8 quantized
`sample()` mode is worth building; if XLA falls off the MXU fast path,
this saves us the detour.

Shapes: the sample() forward pool (CFG batch 2) — UNet 3x3 convs per level,
the attention projection matmuls, and a VAE decode conv.

Usage: python scripts/ab_int8.py            (TPU; serialize with other runs)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def timeit(fn, x, w, n=50):
    """Time fn(x, w) chained n times inside ONE scan program.

    Per-dispatch RPC through the axon tunnel is ~1.7 ms — a per-call loop
    floors every small op at that (the first version of this probe did
    exactly that; its small-shape rows were garbage). The carry
    re-derives x from the output so nothing can be hoisted or DCE'd.
    """

    @jax.jit
    def run(x, w):
        # UNROLLED chain (a lax.scan while-loop adds ~0.5 ms/iteration of
        # loop overhead on this backend, which floors small ops): each
        # iteration folds a data-dependent scalar back into the input so
        # nothing can be hoisted or DCE'd.
        for _ in range(n):
            out = fn(x, w)
            delta = jax.lax.convert_element_type(
                jnp.max(out).astype(jnp.float32) * 1e-9, x.dtype
            )
            x = x + delta
        return x

    out = run(x, w)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # compile + tunnel sync
    t0 = time.time()
    out = run(x, w)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / n


def conv_flops(N, H, W, Cin, Cout, k):
    return 2 * N * H * W * Cin * Cout * k * k


def main():
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}")

    # ---- conv shapes (NHWC), sample() fwd pool ----
    conv_cases = [
        ("unet L0 64x64x320", (2, 64, 64, 320), 320, 3),
        ("unet L2 16x16x1280", (2, 16, 16, 1280), 1280, 3),
        ("vae dec 256x256x512", (1, 256, 256, 512), 512, 3),
        ("vae dec 512x512x128", (1, 512, 512, 128), 128, 3),
    ]
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    for name, xshape, cout, k in conv_cases:
        N, H, W, Cin = xshape
        fl = conv_flops(N, H, W, Cin, cout, k)
        x = jax.random.normal(key, xshape, jnp.bfloat16)
        w = jax.random.normal(key, (k, k, Cin, cout), jnp.bfloat16)
        xi = (x * 10).astype(jnp.int8)
        wi = (w * 10).astype(jnp.int8)

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        @jax.jit
        def conv_int8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        tb = timeit(conv_bf16, x, w)
        ti = timeit(conv_int8, xi, wi)
        print(f"{name:26s} bf16 {tb*1e3:7.3f} ms ({fl/tb/1e12:6.1f} TF/s)   "
              f"int8 {ti*1e3:7.3f} ms ({fl/ti/1e12:6.1f} TOP/s)  speedup {tb/ti:5.2f}x")

    # ---- matmul shapes: attention projections / im2col-style ----
    mm_cases = [
        ("attn proj 8192x320x320", 8192, 320, 320),
        ("ctx proj 8192x320x2560", 8192, 320, 2560),
        ("im2col 16384x2304x512", 16384, 2304, 512),
        ("big 16384x4096x4096", 16384, 4096, 4096),
    ]
    for name, M, K, Nn in mm_cases:
        fl = 2 * M * K * Nn
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        b = jax.random.normal(key, (K, Nn), jnp.bfloat16)
        ai = (a * 10).astype(jnp.int8)
        bi = (b * 10).astype(jnp.int8)

        @jax.jit
        def mm_bf16(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        @jax.jit
        def mm_int8(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.int32)

        tb = timeit(mm_bf16, a, b)
        ti = timeit(mm_int8, ai, bi)
        print(f"{name:26s} bf16 {tb*1e3:7.3f} ms ({fl/tb/1e12:6.1f} TF/s)   "
              f"int8 {ti*1e3:7.3f} ms ({fl/ti/1e12:6.1f} TOP/s)  speedup {tb/ti:5.2f}x")


if __name__ == "__main__":
    main()
