"""topomap_tpu — TPU-native framework for prompt-driven stylization of topographic maps.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capability surface of
`Ganle3/Interactive-Stylization-of-Topographic-Maps-Using-Prompt-Driven-Diffusion-Models`
(see SURVEY.md at the repo root for the full structural analysis of the reference).

Subpackages
-----------
core      Diffusion math: DDPM noise schedules, q_sample, jitted lax.scan DDIM sampler with CFG.
models    Functional JAX modules: VAE, SD1.5 UNet, ControlNet (+ctrlora), CLIP/BERT text encoders,
          adapters, and the 9-class segmentation U-Net used for MIoU evaluation.
ops       Pallas TPU kernels (flash attention with fused LoRA deltas) and XLA-compiled image ops
          (tiling, masks, stitching, contour compositing).
parallel  Mesh construction and sharding rules for pjit data/tile-parallel training and inference.
text      Tokenizers and the CLIP⊕BERT conditioning-fusion modes.
data      pairs.jsonl datasets, stratified splits, synthetic map-tile generator, latent caching.
lora      Functional LoRA parameter trees and target selectors (qkv/kv/qkvo/ffn, ctrlora, CN-LoRA).
train     Losses, optimizer param groups, LR schedules, the pjit training step and loop.
eval      validate_step, DDIM preview sampling, quantitative metrics, grid writers, loss_log.json.
configs   Named experiment presets reproducing the reference's three flagship configurations.
utils     Pytree helpers, checkpoint conversion (torch state_dict → JAX), IO.
"""

__version__ = "0.1.0"
