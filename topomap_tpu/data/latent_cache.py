"""VAE-latent pre-caching — the reference's training-throughput trick, device-batched.

``LatentCachedDataset`` (``experiment_overfit/Training_sd_bert_adapter_samples_fast.py:84-140``)
encodes every gt tile through the VAE once (fp16 on CPU) so training skips per-step
``encode_first_stage``. Here the cache is built in BATCHES on the TPU (one jitted call per
chunk instead of one per tile) and stored as posterior (mean, logvar) so each training step
can still draw a fresh latent sample — matching the reference training loss exactly while
paying the encoder cost once.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from topomap_tpu.models.vae import vae_encode, vae_sample_latent
from topomap_tpu.pipeline import PipelineConfig, Params


def build_latent_cache(
    params: Params,
    cfg: PipelineConfig,
    dataset,
    batch_size: int = 8,
    store_dtype=np.float16,
) -> dict:
    """Encode every item of a PairsDataset; returns
    {"mean": [N,h,w,z] f16, "logvar": [N,h,w,z] f16, "seg": [N,H,W,3] f16, "prompt": list}."""
    enc = jax.jit(lambda img: vae_encode(params["vae"], cfg.vae, img))
    means, logvars, segs, prompts = [], [], [], []
    n = len(dataset)
    for start in range(0, n, batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size, n))]
        gt = jnp.asarray(np.stack([it["gt"] for it in items]))
        mean, logvar = enc(gt)
        means.append(np.asarray(mean, store_dtype))
        logvars.append(np.asarray(logvar, store_dtype))
        segs.append(np.stack([it["seg"] for it in items]).astype(store_dtype))
        prompts.extend(it["prompt"] for it in items)
    return {
        "mean": np.concatenate(means),
        "logvar": np.concatenate(logvars),
        "seg": np.concatenate(segs),
        "prompt": prompts,
    }


def save_latent_cache(cache: dict, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path, mean=cache["mean"], logvar=cache["logvar"], seg=cache["seg"],
        prompt=np.asarray(cache["prompt"], dtype=object),
    )


def load_latent_cache(path: str | Path) -> dict:
    data = np.load(path, allow_pickle=True)
    return {
        "mean": data["mean"],
        "logvar": data["logvar"],
        "seg": data["seg"],
        "prompt": list(data["prompt"]),
    }


def sample_cached_latents(rng, cache_batch_mean, cache_batch_logvar, scale_factor: float):
    """Fresh posterior sample from cached statistics — same distribution as encoding live."""
    return vae_sample_latent(
        rng, jnp.asarray(cache_batch_mean, jnp.float32), jnp.asarray(cache_batch_logvar, jnp.float32),
        scale_factor,
    )


class CachedBatchIterator:
    """Epoch-cycling batches over a latent cache: ``{"mean","logvar","seg","prompt"}``."""

    def __init__(self, cache: dict, batch_size: int, seed: int = 42, shuffle: bool = True):
        self.cache = cache
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle

    def __iter__(self):
        n = len(self.cache["prompt"])
        epoch = 0
        while True:
            order = np.arange(n)
            if self.shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(order)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                idx = order[i : i + self.batch_size]
                yield {
                    "mean": self.cache["mean"][idx],
                    "logvar": self.cache["logvar"][idx],
                    "seg": self.cache["seg"][idx].astype(np.float32),
                    "prompt": [self.cache["prompt"][j] for j in idx],
                }
            epoch += 1
