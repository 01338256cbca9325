"""Prompt-embedding-space analysis tools (the reference's L7 layer).

Re-implements, over OUR text encoders, the offline studies in
``PromptEngineering/PromptTest_UMAP.py`` (2-D projection + silhouette category separation
``:252-266``, per-class compactness & confusable pairs ``:283-330``),
``PromptEngineering/Compositionality_TEST.py`` (centroid compositionality with margin 0.05 and
top-K NN coverage ``:9-11,140-170``), and ``experiment_overfit/text_concept.py`` (pairwise
cosine matrix + PCA of trained-encoder embeddings ``:44-75``; LoRA weight-norm audit attn1 vs
attn2 ``:88-130``).

All pure numpy/sklearn post-processing over embeddings produced by any encode function
``texts -> [N, D]``; UMAP is used when installed, PCA otherwise (this image has no umap).
"""
from __future__ import annotations

from collections import Counter
from typing import Callable, Sequence

import numpy as np

EncodeFn = Callable[[Sequence[str]], np.ndarray]  # texts -> [N, D]


# The reference's regularized category prompt suites (Compositionality_TEST.py:15-60).
PROMPT_CATEGORIES = {
    "element_styling": [
        "Render roads in topo road line style",
        "Render rivers in dashed outline style",
        "Render lakes in bold outline style",
        "Render forests in dense fill style",
        "Render buildings in solid fill style",
    ],
    "item_color": [
        "Set roads color to dark gray",
        "Set rivers color to bright blue",
        "Set forests outline color to dark green",
        "Set building color to yellow",
        "Set background color to pale beige",
    ],
    "visibility": [
        "Only make roads visible",
        "Make rivers hidden",
        "Make forests hidden",
        "Make buildings hidden",
        "Make lakes outline visible",
    ],
    "morphology": [
        "Modify roads to be wider",
        "Modify rivers to be expanded",
        "Modify streams to be smoother",
    ],
}


def _l2n(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def cosine_matrix(emb: np.ndarray) -> np.ndarray:
    """Pairwise cosine similarity [N,N] (``text_concept.py:44-75``)."""
    n = _l2n(np.asarray(emb, np.float64))
    return n @ n.T


def pca_project(emb: np.ndarray, dims: int = 2) -> np.ndarray:
    x = np.asarray(emb, np.float64)
    x = x - x.mean(0)
    _u, _s, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:dims].T


def project_2d(emb: np.ndarray) -> np.ndarray:
    """UMAP 2-D projection (PromptTest_UMAP.py:252-266): umap-learn when installed,
    otherwise the self-contained implementation in ``eval/umap_impl.py`` (same
    algorithm); PCA only as a last-resort fallback."""
    try:
        import umap  # noqa

        return umap.UMAP(n_components=2, random_state=42).fit_transform(np.asarray(emb))
    except Exception:
        pass
    try:
        from topomap_tpu.eval.umap_impl import umap_project

        return umap_project(np.asarray(emb), n_components=2, seed=42)
    except Exception:
        return pca_project(emb, 2)


def category_separation(emb: np.ndarray, labels: Sequence[str]) -> dict:
    """Silhouette score + per-class compactness + confusable category pairs
    (``PromptTest_UMAP.py:252-330``)."""
    from sklearn.metrics import silhouette_score

    emb = _l2n(np.asarray(emb))
    labels = np.asarray(labels)
    out: dict = {}
    if len(set(labels.tolist())) > 1:
        out["silhouette"] = float(silhouette_score(emb, labels, metric="cosine"))
    cats = sorted(set(labels.tolist()))
    centroids = {c: emb[labels == c].mean(0) for c in cats}
    out["compactness"] = {
        c: float(np.mean(emb[labels == c] @ _l2n(centroids[c][None]).T)) for c in cats
    }
    cmat = cosine_matrix(np.stack([centroids[c] for c in cats]))
    pairs = [
        (cats[i], cats[j], float(cmat[i, j]))
        for i in range(len(cats))
        for j in range(i + 1, len(cats))
    ]
    out["confusable_pairs"] = sorted(pairs, key=lambda t: -t[2])
    return out


def compositionality_check(
    encode: EncodeFn,
    composed: Sequence[tuple[str, Sequence[str]]],
    categories: dict[str, Sequence[str]] | None = None,
    sim_margin: float = 0.05,
    topk: int = 8,
) -> list[dict]:
    """Centroid compositionality (``Compositionality_TEST.py:130-170``).

    For each (composed prompt, target categories): PASS iff
    ``mean(cos to target centroids) − mean(cos to other centroids) ≥ sim_margin``;
    also reports whether all targets appear among the top-K nearest single prompts.
    """
    categories = categories or PROMPT_CATEGORIES
    singles, labels = [], []
    for cat, prompts in sorted(categories.items()):
        singles.extend(prompts)
        labels.extend([cat] * len(prompts))
    x_single = _l2n(np.asarray(encode(singles)))
    y_single = np.asarray(labels)
    cats = sorted(set(labels))
    cmat = _l2n(np.stack([x_single[y_single == c].mean(0) for c in cats]))

    results = []
    for text, targets in composed:
        z = _l2n(np.asarray(encode([text]))[0][None])
        sims = (z @ cmat.T).ravel()
        t_mask = np.asarray([c in targets for c in cats])
        mean_t = float(sims[t_mask].mean()) if t_mask.any() else float("nan")
        mean_o = float(sims[~t_mask].mean()) if (~t_mask).any() else float("nan")
        margin = mean_t - mean_o
        nn = np.argsort(-(z @ x_single.T).ravel())[:topk]
        counts = Counter(y_single[nn].tolist())
        coverage = all(counts.get(t, 0) > 0 for t in targets)
        results.append(
            {
                "text": text,
                "targets": list(targets),
                "margin": margin,
                "pass": margin >= sim_margin,
                "nn_coverage": coverage,
                "centroid_sims": dict(zip(cats, sims.tolist())),
            }
        )
    return results


def lora_weight_norm_audit(lora_tree) -> dict:
    """Per-site ‖B·A‖ norms split by attn1 (self) vs attn2 (cross) — the trained-LoRA
    audit of ``text_concept.py:88-130``. Input: a LoRA tree (``topomap_tpu.lora``)."""
    import jax

    sites: dict[str, list[float]] = {"attn1": [], "attn2": [], "other": []}

    def walk(node, path):
        if isinstance(node, dict):
            if "A" in node and "B" in node:
                delta = np.asarray(node["A"]) @ np.asarray(node["B"])
                norm = float(np.linalg.norm(delta) * float(node.get("scale", 1.0)))
                key = "attn1" if "/attn1/" in path else ("attn2" if "/attn2/" in path else "other")
                sites[key].append(norm)
                return
            for k, v in node.items():
                walk(v, f"{path}/{k}/")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}/")

    walk(lora_tree, "/")
    return {
        k: {"count": len(v), "mean": float(np.mean(v)) if v else 0.0, "max": float(max(v)) if v else 0.0}
        for k, v in sites.items()
    }
