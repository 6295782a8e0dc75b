"""Model zoo: Flax linen re-designs of the reference's Keras graphs.

Components (shapes match reference exactly; weights are new):
  - Autoencoder               (reference: train_autoencoder.py:9-40)
  - Encoder (HQ/LQ)           (reference: GAN_functions.py:280-331)
  - Generator (HQ/LQ)         (reference: GAN_functions.py:236-278)
  - SelfAttention             (reference: GAN_functions.py:333-374) -- Pallas core
  - Discriminator             (reference: GAN_functions.py:448-493)
  - LatentSaliency            (reference: GAN_functions.py:210-234)
  - RDOptimizer               (reference: GAN_functions.py:495-557)
  - SpectralNormDense         (reference: GAN_functions.py:376-426, dead code there)
  - AdaptiveCodec             (reference: GAN_functions.py:559-722)
  - VGG19Features             (perceptual loss, reference: GAN_train.py:168-195)
"""

from contextual_image_compression_tpu.models.autoencoder import Autoencoder as Autoencoder
from contextual_image_compression_tpu.models.encoder import Encoder as Encoder
from contextual_image_compression_tpu.models.generator import Generator as Generator
from contextual_image_compression_tpu.models.discriminator import Discriminator as Discriminator
from contextual_image_compression_tpu.models.latent_saliency import (
    LatentSaliency as LatentSaliency,
)
from contextual_image_compression_tpu.models.rd_optimizer import RDOptimizer as RDOptimizer
from contextual_image_compression_tpu.models.adaptive import AdaptiveCodec as AdaptiveCodec
