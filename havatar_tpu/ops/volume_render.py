"""Volume rendering: alpha compositing and hierarchical inverse-CDF sampling.

Specs: ``volume_render_radiance_field`` (reference utils/nerf_util.py:28-73)
including the load-bearing details — sigmoid applied to the first 3 channels
only when ``act_feat=False`` (feature channels pass through linearly),
exclusive cumprod transmittance, background composited onto rgb[..., :3]
only — and ``sample_pdf`` (utils/nerf_util.py:76-117, jaxnerf-style
stratified u). All shape-static, fully differentiable, vmappable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def cumprod_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """tf.math.cumprod(..., exclusive=True) along the last axis
    (spec: reference utils/nerf_util.py:4-25)."""
    cp = jnp.cumprod(x, axis=-1)
    return jnp.concatenate([jnp.ones_like(cp[..., :1]), cp[..., :-1]], axis=-1)


def volume_render_radiance_field(
    radiance_field: jnp.ndarray,
    depth_values: jnp.ndarray,
    ray_directions: jnp.ndarray,
    radiance_field_noise_std: float = 0.0,
    act_feat: Optional[bool] = False,
    background_prior: Optional[jnp.ndarray] = None,
    noise_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample radiance into per-ray maps.

    Args:
      radiance_field: [R, S, C+1]; last channel is sigma, channels 0:3 are rgb
        (sigmoid-activated), channels 3:C pass through linearly when
        act_feat=False.
      depth_values: [R, S].
      ray_directions: [R, 3] (UN-normalized; its norm scales the deltas).
      radiance_field_noise_std: stddev of gaussian noise added to sigma
        (requires noise_rng when > 0).
      background_prior: [R, 3] composited as rgb += (1-acc)*bg, or None.

    Returns: (rgb_map [R, C], disp_map [R], acc_map [R], weights [R, S],
              depth_map [R]).
    """
    dists = depth_values[..., 1:] - depth_values[..., :-1]
    dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
    dists = dists * jnp.linalg.norm(ray_directions, axis=-1)[..., None]

    sigma = radiance_field[..., -1]
    if radiance_field_noise_std > 0.0:
        assert noise_rng is not None, "noise requires an rng key"
        sigma = sigma + (
            jax.random.normal(noise_rng, sigma.shape, sigma.dtype)
            * radiance_field_noise_std
        )
    sigma = jax.nn.relu(sigma)

    alpha = 1.0 - jnp.exp(-sigma * dists)
    weights = alpha * cumprod_exclusive(1.0 - alpha + 1e-10)

    # weighted reduction over samples WITHOUT materializing an activated
    # copy of the whole [R, S, C] radiance tensor (the feature channels are
    # the bulk and pass through linearly when act_feat=False — reduce them
    # straight from the input)
    rgb3 = jnp.einsum(
        "rs,rsc->rc", weights, jax.nn.sigmoid(radiance_field[..., :3]))
    if act_feat:
        featm = jnp.einsum(
            "rs,rsc->rc", weights, jax.nn.sigmoid(radiance_field[..., 3:-1]))
    else:
        featm = jnp.einsum(
            "rs,rsc->rc", weights, radiance_field[..., 3:-1])
    rgb_map = jnp.concatenate([rgb3, featm], axis=-1)
    depth_map = jnp.sum(weights * depth_values, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    if background_prior is not None:
        rgb_map = rgb_map.at[..., :3].add((1.0 - acc_map[..., None]) * background_prior)

    return rgb_map, disp_map, acc_map, weights, depth_map


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    det: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``num_samples`` new depths from per-bin weights.

    bins: [R, S-1] midpoints; weights: [R, S-2]. Returns [R, num_samples].
    Stratified-u variant per the spec (utils/nerf_util.py:87-96).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, S-1]

    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=weights.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
    else:
        assert rng is not None, "stratified sampling requires an rng key"
        s = 1.0 / num_samples
        base = jnp.arange(num_samples, dtype=weights.dtype) * s
        u = base[None, :] + jax.random.uniform(
            rng, cdf.shape[:-1] + (num_samples,), weights.dtype
        ) * (s - 1e-6)

    # searchsorted(side='right') as a branchless comparison-sum — [R, K, S]
    # comparisons on the VPU beat a vmapped binary search on TPU, and the
    # below/above fetches become one-hot contractions instead of batched
    # gathers (which lower ~10x slower).
    K = cdf.shape[-1]
    cmp = (u[..., None, :] >= cdf[..., :, None])          # [R, K, S]
    inds = jnp.sum(cmp.astype(jnp.int32), axis=-2)

    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(K - 1, inds)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
    oh_below = (iota_k == below[..., None, :]).astype(cdf.dtype)  # [R, K, S]
    oh_above = (iota_k == above[..., None, :]).astype(cdf.dtype)

    def sel(vals, oh):
        return jnp.einsum("...k,...ks->...s", vals, oh)

    cdf_below = sel(cdf, oh_below)
    cdf_above = sel(cdf, oh_above)
    # bins and cdf have the same length K (cdf = [0, cumsum(pdf)])
    bins_below = sel(bins, oh_below)
    bins_above = sel(bins, oh_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
