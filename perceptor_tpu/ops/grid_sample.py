"""Differentiable grid_sample (torch.nn.functional.grid_sample semantics).

The one CUDA-era op with no toolbox equivalent until now: the reference
vendors `grid_sample_gradfix` (reference
perceptor/models/stylegan_xl/torch_utils/ops/grid_sample_gradfix.py:26-77,
bilinear / zeros / align_corners=False) and `flow_warp`
(super_resolution/arch_util.py:106-136, zeros / align_corners=True).
Both are covered here.  JAX autodiff provides exact gradients w.r.t. BOTH
input and grid to any order (the whole point of the reference's gradfix
wrapper), so no custom VJP is needed.

Layout: input (N, C, H, W); grid (N, Hg, Wg, 2) with normalized (x, y)
coordinates in [-1, 1], exactly like torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coords, size: int, align_corners: bool):
    if align_corners:
        return (coords + 1.0) * 0.5 * (size - 1)
    return ((coords + 1.0) * size - 1.0) * 0.5


def grid_sample(
    input: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """(N, C, H, W), (N, Hg, Wg, 2) -> (N, C, Hg, Wg).

    mode: "bilinear" | "nearest"; padding_mode: "zeros" | "border".
    """
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unsupported mode {mode!r}")
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    if grid.shape[-1] != 2 or grid.ndim != 4:
        raise ValueError(f"grid must be (N, Hg, Wg, 2), got {grid.shape}")

    n, c, h, w = input.shape
    xs = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    ys = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    if padding_mode == "border":
        xs = jnp.clip(xs, 0.0, w - 1)
        ys = jnp.clip(ys, 0.0, h - 1)

    def sample_one(img, ys, xs):
        """img (C, H, W); ys/xs (Hg, Wg) -> (C, Hg, Wg)."""
        if mode == "nearest":
            # torch rounds half away from... uses round-half-to-even? It
            # uses std::nearbyint (round half to even); jnp.rint matches.
            yi = jnp.rint(ys)
            xi = jnp.rint(xs)
            valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            v = img[:, yc, xc]
            return v * valid[None] if padding_mode == "zeros" else v

        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        out = None
        for dy, wy in ((0, 1.0 - (ys - y0)), (1, ys - y0)):
            for dx, wx in ((0, 1.0 - (xs - x0)), (1, xs - x0)):
                yi = y0 + dy
                xi = x0 + dx
                inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
                weight = wy * wx
                if padding_mode == "zeros":
                    weight = weight * inside
                yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
                xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
                v = img[:, yc, xc] * weight[None].astype(img.dtype)
                out = v if out is None else out + v
        return out

    out = jax.vmap(sample_one)(input, ys, xs)
    return out.astype(input.dtype)


def flow_warp(
    x: jax.Array,
    flow: jax.Array,
    interpolation: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jax.Array:
    """Warp (N, C, H, W) by per-pixel flow (N, H, W, 2) in pixel units
    (reference super_resolution/arch_util.py:106-136)."""
    n, c, h, w = x.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    vx = gx[None] + flow[..., 0]
    vy = gy[None] + flow[..., 1]
    # normalize to [-1, 1] (align_corners=True convention, matching the
    # reference's max(W-1, 1) divisor)
    vx = 2.0 * vx / max(w - 1, 1) - 1.0
    vy = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = jnp.stack([vx, vy], axis=-1)
    return grid_sample(
        x, grid, mode=interpolation, padding_mode=padding_mode,
        align_corners=align_corners,
    )
