"""Per-pixel source-view selection.

Two mechanisms, matching the reference:
  1. Initial top-k selection from per-view NCC costs, stored as a bitmask
     (ComputeMultiViewInitialCostandSelectedViews, PatchMatch.cu:497-534).
  2. Per-iteration Monte-Carlo re-selection from candidate-cost statistics
     (the inline block of CheckerboardPropagation, PatchMatch.cu:821-878).

Bitmasks live in int32 maps (<=20 source views fit easily); the reference
uses unsigned int identically (PatchMatch.cu:25-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def decode_bits(mask: Array, num_views: int) -> Array:
    """int mask (H, W) -> bool (H, W, V)."""
    bits = jnp.arange(num_views, dtype=mask.dtype)
    return (mask[..., None] >> bits) & 1 > 0


def encode_bits(bits: Array) -> Array:
    """bool (…, V) -> int32 (…)."""
    V = bits.shape[-1]
    weights = (1 << jnp.arange(V, dtype=jnp.int32))
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def initial_cost_and_views(costs: Array, top_k: int, cost_max: float = 2.0):
    """costs (S, H, W) -> (avg top-k cost (H, W), selected bitmask (H, W)).

    Keeps the `min(num_valid, top_k)` cheapest valid views; every view at or
    below the k-th smallest cost gets its bit set (ties can set extra bits,
    matching `cost_vector_copy[i] <= cost_threshold`, PatchMatch.cu:525-529).
    Pixels with no valid view cost `cost_max` with an empty mask.
    """
    S = costs.shape[0]
    c = jnp.moveaxis(costs, 0, -1)  # (H, W, S)
    num_valid = jnp.sum(c < cost_max, axis=-1)
    k = jnp.minimum(num_valid, top_k)
    sorted_c = jnp.sort(c, axis=-1)
    csum = jnp.cumsum(sorted_c, axis=-1)
    k_idx = jnp.clip(k - 1, 0, S - 1)
    topk_sum = jnp.take_along_axis(csum, k_idx[..., None], axis=-1)[..., 0]
    threshold = jnp.take_along_axis(sorted_c, k_idx[..., None], axis=-1)[..., 0]
    has_any = k > 0
    cost = jnp.where(has_any, topk_sum / jnp.maximum(k, 1), cost_max)
    selected = jnp.where(
        has_any, encode_bits(c <= threshold[..., None]), 0
    )
    return cost.astype(costs.dtype), selected


def monte_carlo_view_weights(
    key: Array,
    cost_array: Array,        # (8, S, H, W) candidate costs
    cand_valid: Array,        # (8, H, W) bool — candidate had in-bounds source
    neighbor_sel: Array,      # (4, H, W) int bitmask of up/down/left/right pixels
    neighbor_valid: Array,    # (4, H, W) bool — gate for each neighbor's prior
    iteration: Array,         # scalar int
    num_samples: int = 15,
):
    """Per-pixel integer view weights via 15 CDF draws.

    Re-derivation of PatchMatch.cu:821-867: neighbor-bitmask priors
    (0.9/0.1), per-view good/bad counts over the 8 candidate costs with the
    iteration-decaying threshold 0.8*exp(-iter^2/90), PDF->CDF, then
    `num_samples` inverse-CDF draws histogrammed into integer weights.

    Deviation (documented): candidates without a valid source position are
    excluded from the statistics; the reference reads uninitialized
    zero-cost entries for them (PatchMatch.cu:795 `{2.0f}` initializes one
    element), which inflates border-pixel weights with garbage.

    Returns (view_weights (H, W, S) float, weight_norm (H, W),
    selected_bitmask (H, W) int32).
    """
    _, S, H, W = cost_array.shape
    c = jnp.moveaxis(cost_array, 1, -1)          # (8, H, W, S)
    valid = cand_valid[..., None]                 # (8, H, W, 1)

    sel_bits = decode_bits(neighbor_sel, S)       # (4, H, W, S)
    prior_terms = jnp.where(sel_bits, 0.9, 0.1)
    priors = jnp.sum(
        jnp.where(neighbor_valid[..., None], prior_terms, 0.0), axis=0
    )                                             # (H, W, S)

    it = iteration.astype(jnp.float32)
    cost_threshold = 0.8 * jnp.exp(it * it / -90.0)
    good = (c < cost_threshold) & valid
    bad = (c > 1.2) & valid
    count = jnp.sum(good, axis=0).astype(jnp.float32)           # (H, W, S)
    count_false = jnp.sum(bad, axis=0)
    tmpw = jnp.sum(jnp.where(good, jnp.exp(c * c / -0.18), 0.0), axis=0)

    probs = jnp.where(
        (count > 2) & (count_false < 3),
        priors * tmpw / jnp.maximum(count, 1.0),
        jnp.where(
            count_false < 3,
            priors * jnp.exp(cost_threshold * cost_threshold / -0.32),
            0.0,
        ),
    )

    prob_sum = jnp.sum(probs, axis=-1, keepdims=True)
    any_prob = prob_sum[..., 0] > 0.0
    cdf = jnp.cumsum(probs, axis=-1) / jnp.maximum(prob_sum, 1e-30)
    cdf = cdf.at[..., -1].set(1.0)

    # 15 draws; idx = #(cdf <= u) reproduces "first view with cdf > u".
    us = jax.random.uniform(key, (num_samples, H, W), jnp.float32)
    weights = jnp.zeros((H, W, S), jnp.float32)
    for s in range(num_samples):
        u = us[s] - jnp.finfo(jnp.float32).eps
        idx = jnp.sum((cdf <= u[..., None]).astype(jnp.int32), axis=-1)
        onehot = jax.nn.one_hot(idx, S, dtype=jnp.float32)
        weights = weights + jnp.where(any_prob[..., None], onehot, 0.0)

    weight_norm = jnp.sum(weights, axis=-1)
    selected = encode_bits(weights > 0.0)
    return weights, weight_norm, selected
