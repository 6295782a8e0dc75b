"""Training harnesses: the AE `.fit`-equivalent loop and the multi-optimizer
adversarial GAN loop, both jitted end-to-end and mesh-shardable."""
