"""Configuration dataclasses for the TPU-native WordGesture-GAN framework.

Field-for-field parity with the reference configuration surface
(/root/reference/src/shared/config.py:11-121 and
/root/reference/src/contrastive/model.py:19-45), plus a TPU-specific
``RuntimeConfig`` describing the device mesh / sharding / precision knobs that
have no reference equivalent (the reference is single-GPU PyTorch).

All configs are frozen so they can be closed over by jitted functions as
static hashable values.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """GAN model architecture configuration (reference config.py:11-33)."""

    # Sequence parameters
    seq_length: int = 128          # points per gesture trace
    input_dim: int = 3             # (x, y, t)

    # Latent space
    latent_dim: int = 32

    # Generator family: "bilstm" (reference parity), "mlp" (BASELINE config 1
    # baseline variant), or "transformer" (BASELINE config 5 variant — fully
    # parallel over the sequence, no recurrence). Measured on 1x v5e (bf16,
    # synthetic 200-epoch runs): bilstm trains ~2x faster (16.2k vs 7.7k
    # gestures/s) but the transformer wins fidelity by a wide margin
    # (L2-W 1.38 vs 3.16, DTW-W 0.65 vs 2.09, FID ~0 vs 0.005-0.016).
    generator_type: str = "bilstm"

    # Generator (bidirectional LSTM)
    gen_hidden_dim: int = 48
    gen_num_layers: int = 4

    # Generator (MLP variant)
    mlp_gen_hidden_dims: Tuple[int, ...] = (384, 384, 384)

    # Generator (Transformer variant)
    tfm_d_model: int = 64
    tfm_num_heads: int = 4
    tfm_num_layers: int = 4
    tfm_mlp_ratio: int = 4

    # Discriminator (MLP variant)
    disc_hidden_dims: Tuple[int, ...] = (192, 96, 48, 24)
    use_temporal_disc: bool = True   # Conv1D temporal critic instead of MLP

    # Prototype input: when False the generator only sees (x, y) and must
    # learn timing from spatial curvature (reference config.py:30).
    prototype_has_time: bool = False

    # Output head for the time channel:
    #   "tanh"     — reference parity: all three channels through tanh
    #                (reference models.py:123,163). The normalized clock has
    #                mean increment 1/(L-1) ≈ 0.008, so tiny absolute errors
    #                in adjacent t values produce huge RELATIVE dt errors
    #                (and non-monotone time), which blow up every
    #                velocity = dxy/dt metric — measured velocity/accel
    #                correlations collapse to ~0 for tanh-headed generators
    #                even when their spatial fidelity is excellent.
    #   "monotone" — xy through tanh; t parameterized as the cumsum of a
    #                softmax over L-1 increment logits (t0=0, tL-1=1):
    #                monotone and normalized by construction, timing errors
    #                become relative, and "slow at corners" is directly
    #                learnable. Initialized logits ≈ 0 give uniform time.
    time_head: str = "tanh"

    # Variational encoder (MLP)
    enc_hidden_dims: Tuple[int, ...] = (192, 96, 48, 32)

    # Mixed-precision compute dtype for all model applies ("float32" or
    # "bfloat16"). Params/optimizer/losses stay float32; see
    # models/layers.py:cast_floats. The TPU-native completion of the AMP
    # scaffolding the reference built and disabled
    # (/root/reference/src/shared/utils.py:60-129, train_gan.py:90-92).
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class TrainingConfig:
    """GAN training configuration (reference config.py:36-66)."""

    batch_size: int = 512
    learning_rate: float = 2e-4
    num_epochs: int = 200

    # WGAN: critic updates per generator update
    n_critic: int = 5

    # Cosine-annealing floor
    lr_scheduler_eta_min: float = 1e-5

    # Per-model global-norm gradient clipping (0 disables)
    grad_clip_norm: float = 1.0

    # Loss weights (paper Section 4.2)
    lambda_feat: float = 1.0
    lambda_rec: float = 4.0
    lambda_lat: float = 0.5
    lambda_kld: float = 0.02

    # Timing-dynamics auxiliaries on the cycle-2 reconstruction (repo
    # addition; 0 = reference-parity off). lambda_dt weights an L1 on the
    # per-segment time-increment pattern, lambda_speed a (1 − Pearson) loss
    # on the |v| profiles — the terms that actually carry the tempo warp
    # the velocity/speed/time-delta correlation metrics measure
    # (losses.time_delta_loss / speed_profile_loss).
    lambda_dt: float = 0.0
    lambda_speed: float = 0.0

    # Δt-pattern Pearson loss (losses.time_delta_corr_loss) — the
    # differentiable twin of the time-delta-correlation eval metric; where
    # lambda_dt penalizes increment magnitudes, this one supervises the
    # increment *shape* the metric actually measures. 0 = off.
    lambda_dtc: float = 0.0

    # MSGAN mode-seeking regularizer (losses.mode_seeking_loss) on a second
    # prior draw in cycle 1: maximizes output distance per unit latent
    # distance, attacking mode collapse (the precision≫recall signature).
    # Costs one extra differentiated generator forward per step when on.
    # 0 = off (reference parity).
    lambda_ms: float = 0.0

    # Hinged conditional-diversity loss (losses.diversity_hinge_loss) on the
    # same second prior draw: penalize the pair of generations only while
    # their mean-L1 distance is below div_margin, then shut off. The bounded
    # replacement for lambda_ms (whose ratio objective rewards unbounded
    # spread — measured precision 0.981→0.172 at λ_ms=1, runs/r5_eval_ms1.log).
    # div_margin=None means "measure it from the data": the training loop
    # substitutes the corpus's mean within-word L1 distance
    # (data.pipeline.within_word_diversity) before compiling the step.
    # 0 = off (reference parity).
    lambda_div: float = 0.0
    div_margin: Optional[float] = None

    # Dataset balancing / split
    max_samples_per_word: int = 5
    train_ratio: float = 0.8

    # Checkpointing / logging cadence
    save_every: int = 10
    log_every: int = 100

    # Score (real ++ fake) in ONE spectral-norm critic forward per update
    # (one power-iteration advance) instead of the reference's two
    # sequential forwards — torch's spectral_norm advances u on every
    # training forward, so the reference scores fakes with the sigma
    # refreshed by the real pass (trainer.py:84-113). When per-layer power
    # iterations dominated critic launch overhead this fusion was ~7%
    # faster per step on v5e; batching every layer's power iteration into
    # one computation (layers.batched_spectral_normalize) removed that
    # overhead, making the fusion perf-neutral (13.55 vs 13.51 ms/step).
    # Default False = the reference's exact two-forward u schedule (what
    # the cross-impl parity harness certifies); True remains available and
    # was shown quality-neutral over a 4-seed paired ablation
    # (runs/r3_fused_critic_ablation.log).
    fused_critic_forward: bool = False


@dataclass(frozen=True)
class EvaluationConfig:
    """Evaluation configuration (reference config.py:69-88)."""

    n_samples: int = 2000
    truncation: float = 1.0

    # FID feature autoencoder
    fid_autoencoder_epochs: int = 100
    fid_autoencoder_lr: float = 1e-3
    fid_hidden_dim: int = 32
    # Framework extension (not a reference field): "positional" adds a time
    # ramp to the FID AE decoder so the encoder must embed gesture SHAPE —
    # the reference/paper decoder ("paper") broadcasts the latent with no
    # positional signal, can only emit a constant trace (reconstruction
    # floor ≈ per-gesture mean abs deviation, 0.25 on synthetic data), and
    # yields features near-blind to shape/timing (FID ≈ 0 for generators
    # that merely match the mean-point distribution). Same encoder topology
    # and feature dimensionality in both modes.
    fid_feature_mode: str = "positional"   # "positional" | "paper"

    # k-NN manifold precision/recall
    precision_recall_k: int = 3

    # Savitzky-Golay jerk filter
    savgol_window: int = 21
    savgol_poly_order: int = 3


@dataclass(frozen=True)
class KeyboardConfig:
    """Virtual QWERTY layout (reference config.py:100-113)."""

    width: float = 1.0
    height: float = 1.0
    rows: Tuple[str, ...] = ("qwertyuiop", "asdfghjkl", "zxcvbnm")
    row_offsets: Tuple[float, ...] = (0.0, 0.05, 0.15)
    key_width: float = 0.1
    key_height: float = 0.333


@dataclass(frozen=True)
class ContrastiveConfig:
    """Contrastive gesture encoder configuration
    (reference src/contrastive/model.py:19-45)."""

    embedding_dim: int = 64
    temperature: float = 0.07

    learning_rate: float = 1e-3
    batch_words: int = 32
    gestures_per_word: int = 2
    num_epochs: int = 100

    use_cosine_annealing: bool = True
    eta_min: float = 1e-5

    seq_length: int = 128
    input_dim: int = 3


@dataclass(frozen=True)
class PathsConfig:
    """Local run paths (replaces the reference ModalConfig, config.py:92-97 —
    no remote sandbox indirection on the TPU host)."""

    checkpoint_dir: str = "checkpoints"
    data_path: str = "dataset/swipelogs.zip"
    cache_dir: str = ""            # "" → alongside the zip
    wandb_project: str = "wordgesture-gan-tpu"
    random_seed: int = 42


@dataclass(frozen=True)
class RuntimeConfig:
    """TPU runtime: mesh shape, precision, and step-fusion knobs.

    No reference equivalent — the reference trains on one CUDA device
    (src/gan/trainer.py:37). Here the train step is jit-compiled over a
    1-D ``data`` mesh axis; gradients are all-reduced over ICI by XLA.
    """

    # Number of devices on the data-parallel mesh axis (-1 → all local devices)
    data_axis_size: int = -1
    mesh_axis_names: Tuple[str, ...] = ("data",)

    # Donate train state buffers to the step for in-place updates
    donate_state: bool = True

    # Precision policy: "float32" or "bfloat16" (mixed — bf16 compute,
    # fp32 params/optimizer/losses). CLIs copy this into
    # ModelConfig.compute_dtype, which the apply functions consult.
    precision: str = "float32"

    # Epoch strategy: False (default) runs a host loop of per-batch jitted
    # steps; True fuses the whole epoch into one lax.scan program. Measured on
    # v5e (58 × B=512 batches, bf16): at round-2 kernels per-step won 20.3 vs
    # 23.1 ms/batch; re-measured after the round-3 kernel work (unrolled
    # critic loop, fused critic forward) the gap is a wash — 13.7 vs 13.4
    # ms/batch. Default stays per-step for per-batch host visibility
    # (loss logging, non-finite abort); scan is the multi-chip choice where
    # one program per epoch minimizes dispatch over DCN, and is what the
    # multichip dryrun exercises.
    scan_epoch: bool = False


DEFAULT_MODEL_CONFIG = ModelConfig()
DEFAULT_TRAINING_CONFIG = TrainingConfig()
DEFAULT_EVALUATION_CONFIG = EvaluationConfig()
DEFAULT_KEYBOARD_CONFIG = KeyboardConfig()
DEFAULT_CONTRASTIVE_CONFIG = ContrastiveConfig()
DEFAULT_PATHS_CONFIG = PathsConfig()
DEFAULT_RUNTIME_CONFIG = RuntimeConfig()


def asdict(cfg) -> dict:
    """Dataclass → plain dict (for logging / checkpointa metadata)."""
    return dataclasses.asdict(cfg)
