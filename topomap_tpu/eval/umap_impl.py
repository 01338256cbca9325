"""Self-contained UMAP (McInnes et al. 2018) for prompt-embedding projection.

The reference projects prompt embeddings with the ``umap-learn`` package
(``/root/reference/PromptEngineering/PromptTest_UMAP.py:252-266``); that package is not in
this image, so this module implements the algorithm directly at the scale the analysis
needs (tens-to-hundreds of points): exact kNN → smoothed fuzzy simplicial set (per-point
σ binary search to ``log2(k)`` connectivity, ρ = nearest-neighbor distance) → symmetrized
graph ``W + Wᵀ − W∘Wᵀ`` → spectral initialization → per-edge SGD on the fuzzy
cross-entropy with negative sampling, using the standard ``1/(1 + a·d^{2b})``
low-dimensional kernel fit from ``(min_dist, spread)``.

Deterministic for a fixed ``seed``; pure numpy (+ scipy for the a/b curve fit, with a
grid-search fallback).
"""
from __future__ import annotations

import numpy as np


def _pairwise_dist(x: np.ndarray, metric: str) -> np.ndarray:
    if metric == "cosine":
        n = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return np.clip(1.0 - n @ n.T, 0.0, None)
    d2 = np.sum(x * x, 1)[:, None] + np.sum(x * x, 1)[None, :] - 2.0 * (x @ x.T)
    return np.sqrt(np.clip(d2, 0.0, None))


def _smooth_knn(dists: np.ndarray, k: int, n_iter: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (ρ, σ): ρ = nearest nonzero neighbor distance; σ solves
    Σ_j exp(−max(0, d_j − ρ)/σ) = log2(k) by bisection (umap.umap_.smooth_knn_dist)."""
    target = np.log2(k)
    rho = np.where(dists[:, 0] > 0, dists[:, 0], 0.0)
    # ρ is the distance to the nearest neighbor with positive distance
    for i in range(dists.shape[0]):
        nz = dists[i][dists[i] > 0]
        rho[i] = nz[0] if nz.size else 0.0
    sigma = np.ones(dists.shape[0])
    for i in range(dists.shape[0]):
        lo, hi = 0.0, np.inf
        mid = 1.0
        for _ in range(n_iter):
            psum = np.sum(np.exp(-np.maximum(dists[i] - rho[i], 0.0) / mid))
            if abs(psum - target) < 1e-5:
                break
            if psum > target:
                hi = mid
                mid = (lo + hi) / 2.0
            else:
                lo = mid
                mid = mid * 2.0 if hi == np.inf else (lo + hi) / 2.0
        sigma[i] = max(mid, 1e-3 * np.mean(dists[i]) if np.mean(dists[i]) > 0 else 1e-3)
    return rho, sigma


def _fit_ab(min_dist: float, spread: float) -> tuple[float, float]:
    """Fit (a, b) so 1/(1+a d^{2b}) ≈ exp(−(d−min_dist)/spread) beyond min_dist, 1 inside."""
    xv = np.linspace(0, spread * 3, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2.0 * b))

    try:
        from scipy.optimize import curve_fit

        (a, b), _ = curve_fit(curve, xv, yv, p0=(1.0, 1.0), maxfev=2000)
        return float(a), float(b)
    except Exception:  # grid-search fallback
        best, best_err = (1.577, 0.895), np.inf
        for a in np.linspace(0.5, 3.0, 26):
            for b in np.linspace(0.5, 2.0, 31):
                err = float(np.mean((curve(xv, a, b) - yv) ** 2))
                if err < best_err:
                    best, best_err = (float(a), float(b)), err
        return best


def _spectral_init(graph: np.ndarray, dims: int, rng: np.random.Generator) -> np.ndarray:
    """Symmetric-normalized-Laplacian eigenvectors 1..dims (random jitter for ties)."""
    deg = np.maximum(graph.sum(1), 1e-12)
    d_inv_sqrt = 1.0 / np.sqrt(deg)
    lap = np.eye(len(graph)) - (d_inv_sqrt[:, None] * graph * d_inv_sqrt[None, :])
    try:
        vals, vecs = np.linalg.eigh(lap)
        emb = vecs[:, 1 : dims + 1]
        expansion = 10.0 / max(np.abs(emb).max(), 1e-12)
        return emb * expansion + rng.normal(0, 1e-4, emb.shape)
    except np.linalg.LinAlgError:
        return rng.normal(0, 1.0, (len(graph), dims))


def umap_project(
    x: np.ndarray,
    n_components: int = 2,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    spread: float = 1.0,
    n_epochs: int = 300,
    learning_rate: float = 1.0,
    negative_sample_rate: int = 5,
    metric: str = "euclidean",
    seed: int = 42,
) -> np.ndarray:
    """Embed ``[N, D] → [N, n_components]``. Deterministic for fixed ``seed``."""
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    if n <= n_components:  # degenerate: nothing to optimize
        return np.zeros((n, n_components))
    k = min(n_neighbors, n - 1)
    rng = np.random.default_rng(seed)

    full = _pairwise_dist(x, metric)
    order = np.argsort(full, axis=1)[:, 1 : k + 1]  # exact kNN, self excluded
    knn_d = np.take_along_axis(full, order, axis=1)

    rho, sigma = _smooth_knn(knn_d, k)
    w = np.zeros((n, n))
    for i in range(n):
        w[i, order[i]] = np.exp(-np.maximum(knn_d[i] - rho[i], 0.0) / sigma[i])
    graph = w + w.T - w * w.T  # fuzzy set union
    graph[graph < graph.max() / max(n_epochs, 1)] = 0.0

    a, b = _fit_ab(min_dist, spread)
    emb = _spectral_init(graph, n_components, rng)

    # per-edge epoch schedule: stronger edges updated more often (make_epochs_per_sample)
    heads, tails = np.nonzero(graph)
    weights = graph[heads, tails]
    epochs_per_sample = np.where(weights > 0, graph.max() / weights, np.inf)
    next_epoch = epochs_per_sample.copy()

    clip = 4.0
    for epoch in range(n_epochs):
        alpha = learning_rate * (1.0 - epoch / n_epochs)
        active = np.nonzero(next_epoch <= epoch)[0]
        for e in active:
            i, j = heads[e], tails[e]
            cur, other = emb[i], emb[j]
            diff = cur - other
            d2 = float(diff @ diff)
            if d2 > 0:
                grad_coef = (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2**b)
                g = np.clip(grad_coef * diff, -clip, clip)
                emb[i] += alpha * g
                emb[j] -= alpha * g
            next_epoch[e] += epochs_per_sample[e]
            for _ in range(negative_sample_rate):
                t = int(rng.integers(0, n))
                if t == i:
                    continue
                diff = emb[i] - emb[t]
                d2 = float(diff @ diff)
                grad_coef = (2.0 * b) / ((0.001 + d2) * (1.0 + a * d2**b))
                g = np.clip(grad_coef * diff, -clip, clip)
                emb[i] += alpha * g
    return emb
