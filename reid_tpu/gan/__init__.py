"""Synthetic-data GAN subsystem. Reference: `gan/` (SURVEY.md §2.6) —
DCGAN/SNGAN generator, discriminator (plain/spectral/Wasserstein/VAE heads),
VAE-GAN, categorical conditional BN, EMA generator, k-means appearance
grouping, LSRO uniform-label loss for synthetic samples."""

from .models import (
    VAE,
    CategoricalConditionalBN,
    Discriminator,
    Generator,
    SelfAttention,
)
from .train import (
    GANState,
    create_gan_state,
    ema_update,
    generate_images,
    lsro_loss,
    make_dcgan_steps,
    make_vaegan_steps,
)
from .driver import (
    generate_group_images,
    get_groups,
    make_resnet_embed_fn,
    sample_vaegan,
    train_gan_groups,
    train_lsro_baseline,
    train_vaegan,
)
