"""wordgesture_gan_tpu — a TPU-native (JAX/XLA/Pallas) framework for
word-gesture trajectory modeling.

Re-designed from scratch with the full capabilities of the reference
WordGesture-GAN implementation (CHI'23 paper "WordGesture-GAN: Modeling
Word-Gesture Movement with Generative Adversarial Network"): swipelog
preprocessing, conditional VAE-GAN training (BicycleGAN-style two-cycle with
WGAN critics), a fitted minimum-jerk baseline, a supervised-contrastive
gesture encoder, and a batched on-device evaluation suite.
"""

from . import configs, keyboard, losses
from .configs import (
    ContrastiveConfig,
    EvaluationConfig,
    KeyboardConfig,
    ModelConfig,
    PathsConfig,
    RuntimeConfig,
    TrainingConfig,
)
from .keyboard import MinimumJerkDistributions, MinimumJerkModel, QWERTYKeyboard

__version__ = "0.1.0"
