"""Shared test helpers."""
import jax
import jax.numpy as jnp


def unzero(params, seed=9, scale=0.02):
    """Replace every all-zero leaf (LDM zero_module inits) with small random values so the
    full trunk — time-emb adds, transformer proj_outs, zero convs, final conv — contributes
    to the output. Needed because at true LDM init the UNet output is x-only."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    new = [
        jax.random.normal(k, l.shape, l.dtype) * scale if float(jnp.abs(l).sum()) == 0 else l
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, new)
