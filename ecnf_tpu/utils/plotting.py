"""Plotting utilities: metric history and pairwise-distance histograms.

Parity with the reference's `ecnf/utils/plotting.py:15-92`.
"""
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ecnf_tpu.ops.graph import pairwise_difference


def plot_history(history):
    """Plot a dict of scalar metric histories (reference `plotting.py:15-30`)."""
    import matplotlib.pyplot as plt
    import pandas as pd

    figure, axs = plt.subplots(len(history), 1, figsize=(7, 3 * max(len(history), 1)))
    if len(history) == 1:
        axs = [axs]
    elif len(history) == 0:
        return
    for i, key in enumerate(history):
        data = pd.Series(history[key])
        data = data.replace([np.inf, -np.inf], np.nan)
        if data.isna().sum() > 0:
            data = data.dropna()
            print(f"NaN encountered in {key} history")
        axs[i].plot(data)
        axs[i].set_title(key)
    plt.tight_layout()
    return figure


def get_pairwise_distances_for_plotting(
    samples: jax.Array, n_vertices: Optional[int] = None, max_distance: float = 7.99
) -> jax.Array:
    """Flattened off-diagonal pairwise distances, clipped for binning.

    Parity: reference `plotting.py:33-47`, dense formulation (each unordered
    pair appears twice, matching the reference's ordered edge list).
    """
    assert samples.ndim == 3  # [batch, n_nodes, dim]
    n_vertices = samples.shape[1] if n_vertices is None else n_vertices
    n_vertices = min(samples.shape[1], n_vertices)
    x = samples[:, :n_vertices]
    diff = pairwise_difference(x)
    norms = jnp.linalg.norm(diff, axis=-1)  # [B, N, N]
    # Static off-diagonal index lists (jit-safe, unlike boolean masking).
    rows, cols = np.where(~np.eye(n_vertices, dtype=bool))
    d = norms[:, rows, cols].flatten()
    return d.clip(max=max_distance)


def get_counts(
    distances: jax.Array,
    bins: jax.Array = jnp.linspace(0.0, 8.0, num=50),
    normalize: bool = True,
) -> jax.Array:
    """Histogram counts of distances per bin (reference `plotting.py:50-63`)."""
    assert distances.ndim == 1
    count_fn = lambda lower, upper: jnp.sum((distances >= lower) & (distances < upper))
    counts = jax.vmap(count_fn)(bins[:-1], bins[1:])
    if normalize:
        counts = counts / distances.shape[0]
    return counts


@partial(jax.jit, static_argnums=(1, 2, 3))
def bin_samples_by_dist(
    samples_list: List[jax.Array],
    max_distance: float = 100.0,
    max_bin_fallback: float = 10.0,
    num_bins: int = 100,
):
    """Common bins + per-array counts for a list of sample arrays.

    Parity: reference `plotting.py:66-92`.
    """
    distance_list = []
    dist_max_list = []
    for samples in samples_list:
        distance = get_pairwise_distances_for_plotting(samples, max_distance=max_distance)
        distance = jnp.where(jnp.isfinite(distance), distance, -1)
        distance_list.append(distance)
        dist_max_list.append(jnp.nanmax(distance_list[-1]))

    max_dist = jnp.nanmax(jnp.array(dist_max_list))
    max_dist = jnp.where(jnp.isfinite(max_dist), max_dist, max_bin_fallback)
    bins = jnp.linspace(0, max_dist + 0.05, num_bins)

    count_list = [get_counts(distance, bins) for distance in distance_list]
    return bins, count_list
