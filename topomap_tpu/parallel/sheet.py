"""Map-parallel sheet stylization over a device mesh.

The inference-fleet scaling axis (SURVEY.md §2.9 item 2): a 10×10 map sheet is a batch of
100 tiles; shard the tile axis over the mesh (params replicated), run the jitted sampling
program once, stitch on the host side of the final gather. The ControlNet/UNet/CFG math is
untouched — parallelism is purely a sharding annotation, and GSPMD emits the (trivially
embarrassing) per-device work with one final all-gather.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from topomap_tpu.core import DDIMConfig, DiffusionSchedule
from topomap_tpu.ops.image import add_contour_lines, from_signed, stitch_tiles, tile_sheet, to_unit
from topomap_tpu.parallel.mesh import batch_sharding, pad_to_multiple, replicated
from topomap_tpu.pipeline import PipelineConfig, Params, sample


def stylize_sheet_sharded(
    params: Params,
    cfg: PipelineConfig,
    sched: DiffusionSchedule,
    mesh: Mesh,
    sheet_seg_u8: np.ndarray,
    crossattn: jnp.ndarray,
    tile: int = 512,
    steps: int = 20,
    scale: float = 9.0,
    seed: int = 42,
    control_scales=None,
    contours_u8: Optional[np.ndarray] = None,
    attn_fn=None,
) -> np.ndarray:
    """Stylize a whole sheet with tiles sharded over ``mesh``.

    ``crossattn``: [1,T,D] (shared conditioning, tiled per tile) or [N,T,D] per-tile.
    Returns the stitched uint8 sheet (host).
    """
    from topomap_tpu.ops.flash_attention import best_attention_fn

    attn_fn = attn_fn or best_attention_fn()
    h, w = sheet_seg_u8.shape[:2]
    rows, cols = h // tile, w // tile
    tiles = np.asarray(to_unit(tile_sheet(jnp.asarray(sheet_seg_u8), tile)))
    n = tiles.shape[0]
    if crossattn.shape[0] == 1:
        crossattn = jnp.tile(crossattn, (n, 1, 1))
    batch = {"seg": tiles, "ctx": np.asarray(crossattn)}
    batch, orig_n = pad_to_multiple(batch, mesh.devices.size)

    data_sh = batch_sharding(mesh)
    rep = replicated(mesh)
    seg_dev = jax.device_put(batch["seg"], data_sh)
    ctx_dev = jax.device_put(batch["ctx"], data_sh)
    params_dev = jax.tree.map(lambda x: jax.device_put(x, rep), params)

    ddim = DDIMConfig(num_steps=steps, guidance_scale=scale)

    @jax.jit
    def run(params, seg, ctx, rng):
        img = sample(
            params, cfg, sched, ddim, rng, seg, ctx,
            control_scales=control_scales, attn_fn=attn_fn,
        )
        return from_signed(img)

    out = run(params_dev, seg_dev, ctx_dev, jax.random.PRNGKey(seed))
    out = np.asarray(out)[:orig_n]
    stitched = np.asarray(stitch_tiles(jnp.asarray(out), rows, cols))
    if contours_u8 is not None:
        stitched = np.asarray(add_contour_lines(jnp.asarray(stitched), jnp.asarray(contours_u8)))
    return stitched
