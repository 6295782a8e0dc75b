"""Evaluation & analysis: metrics sweeps, rate-distortion curves, visualization
artifacts (the reference's GAN_test.py / test_autoencoder.py capability surface)."""
