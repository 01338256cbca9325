from topomap_tpu.models.unet import UNetConfig, unet_init, unet_apply
from topomap_tpu.models.vae import VAEConfig, vae_init, vae_encode, vae_decode, vae_sample_latent
from topomap_tpu.models.controlnet import controlnet_init, controlnet_apply
from topomap_tpu.models.text_encoders import TextEncoderConfig, text_encoder_init, text_encoder_apply
from topomap_tpu.models.adapters import AdapterConfig, adapter_init, adapter_apply
from topomap_tpu.models.unet_seg import SegUNetConfig, seg_unet_init, seg_unet_apply, predict_classes
