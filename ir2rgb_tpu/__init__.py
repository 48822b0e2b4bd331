"""ir2rgb_tpu — a TPU-native framework for infrared→RGB video translation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``matinraayai/ir2rgb`` reference (pix2pix / pix2pixHD / temporal-video
conditional-GAN family):

- Generators: ResNet-9/6, U-Net-256/128, pix2pixHD Global and
  Global+LocalEnhancer coarse-to-fine.
- Discriminators: 70x70 PatchGAN (``NLayerDiscriminator``) and multi-scale
  pyramids with intermediate-feature taps for feature-matching loss.
- Losses: LSGAN/vanilla GAN, L1, discriminator feature matching,
  VGG19 perceptual.
- Training: single fused jitted G+D train step, optax Adam with
  linear-decay schedule, coarse-to-fine parameter freezing, on-device
  image pool, data-parallel sharding over a `jax.sharding.Mesh`.
- Inference: batch-1 streaming with on-device previous-frame carry.
- Pallas TPU kernels for fused instance-norm+activation.

Everything is pure-functional: parameters are nested dicts of arrays
("pytrees"), modules expose ``init(key) -> params`` and
``apply(params, x, ...)``, and the whole train/infer step compiles into a
single XLA program.
"""

__version__ = "0.1.0"
