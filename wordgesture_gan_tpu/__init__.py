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
from .keyboard import (
    MinimumJerkDistributions,
    MinimumJerkModel,
    QWERTYKeyboard,
    generate_minimum_jerk_trajectory,
    generate_minimum_jerk_trajectory_fitted,
)

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports of the major API surface (the reference
    star-exports its subpackages from src/__init__.py:7-9). Lazy so that
    importing the package for config/geometry work doesn't pull in jax."""
    _lazy = {
        # data pipeline
        "load_dataset_from_zip": "data",
        "create_train_test_split": "data",
        "create_data_loaders": "data",
        "GestureDataset": "data",
        "infer_key_positions": "data",
        "create_contrastive_datasets": "data",
        # training
        "train_gan": "train.gan_loop",
        "generate_gestures": "train.gan_loop",
        "train_contrastive": "train.contrastive_loop",
        "init_gan_state": "train.state",
        # evaluation
        "evaluate_all_metrics": "metrics",
        "evaluate_gan_and_minjerk": "eval",
        # visualization
        "plot_gestures_on_keyboard": "viz",
        "create_comparison_figure": "viz",
        "create_overlay_figure": "viz",
    }
    if name in _lazy:
        import importlib

        module = importlib.import_module(f".{_lazy[name]}", __name__)
        return getattr(module, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
