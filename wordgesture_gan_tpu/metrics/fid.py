"""FID with a learned autoencoder feature space, trained as a jitted inner
loop on device (reference /root/reference/src/gan/evaluation.py:393-468: a
100-epoch torch loop + scipy sqrtm; here one lax.scan per epoch and an
eigh-based trace).
"""

from __future__ import annotations

import hashlib
import pickle
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import DEFAULT_EVALUATION_CONFIG, DEFAULT_MODEL_CONFIG, EvaluationConfig, ModelConfig
from ..models.gan import autoencoder_apply, autoencoder_encode, autoencoder_init


def _ae_cache_path(train_data: np.ndarray, eval_config: EvaluationConfig,
                   cache_dir: str) -> Path:
    """Cache key mirrors the reference's data-signature idea
    (evaluation.py:30-35) but keys on everything that changes the trained
    AE: ALL training hyperparameters plus a strided digest of the full
    dataset (the reference's first-rows-only slice collides for any two
    datasets sharing a prefix)."""
    stride = max(1, len(train_data) // 64)
    h = hashlib.md5()
    h.update(repr((
        train_data.shape,
        eval_config.fid_hidden_dim,
        eval_config.fid_autoencoder_lr,
        eval_config.fid_autoencoder_epochs,
        getattr(eval_config, "fid_feature_mode", "paper"),
    )).encode())
    h.update(np.ascontiguousarray(train_data[::stride]).tobytes())
    return Path(cache_dir) / f".cache_fid_ae_{h.hexdigest()[:12]}.pkl"


def train_fid_autoencoder(
    train_data: np.ndarray,
    model_config: ModelConfig = DEFAULT_MODEL_CONFIG,
    eval_config: EvaluationConfig = DEFAULT_EVALUATION_CONFIG,
    seed: int = 0,
    batch_size: int = 512,
    verbose: bool = True,
) -> Tuple[Dict, float]:
    """Train the FID feature AE with L1 reconstruction for
    ``fid_autoencoder_epochs`` epochs; each epoch is one on-device scan over
    shuffled batches (partial tail batch handled by masking, matching the
    torch loader's drop_last=False). Returns (params, final epoch loss)."""
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    positional = getattr(eval_config, "fid_feature_mode", "paper") == "positional"
    params = autoencoder_init(init_key, model_config, eval_config.fid_hidden_dim,
                              positional=positional)
    tx = optax.adam(eval_config.fid_autoencoder_lr)
    opt_state = tx.init(params)

    data = jnp.asarray(train_data, jnp.float32)
    n = data.shape[0]
    n_batches = -(-n // batch_size)
    padded_n = n_batches * batch_size

    def epoch_fn(carry, epoch_key):
        params, opt_state = carry
        perm = jax.random.permutation(epoch_key, n)
        pad = jnp.concatenate([perm, jnp.zeros(padded_n - n, jnp.int32)])
        mask = (jnp.arange(padded_n) < n).astype(jnp.float32)
        batches = jnp.take(data, pad, axis=0).reshape(n_batches, batch_size, *data.shape[1:])
        masks = mask.reshape(n_batches, batch_size)

        def step(carry, xs):
            params, opt_state = carry
            batch, m = xs

            def loss_fn(p):
                recon = autoencoder_apply(p, batch)
                per_elem = jnp.abs(recon - batch).mean(axis=(1, 2))
                return (per_elem * m).sum() / jnp.maximum(m.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (batches, masks))
        return (params, opt_state), losses.mean()

    run = jax.jit(lambda c, ks: jax.lax.scan(epoch_fn, c, ks))
    epoch_keys = jax.random.split(key, eval_config.fid_autoencoder_epochs)
    (params, _), epoch_losses = run((params, opt_state), epoch_keys)
    final_loss = float(epoch_losses[-1])
    if verbose:
        print(f"  FID autoencoder trained: final L1 {final_loss:.4f}")
    if final_loss > 0.1:
        mode = getattr(eval_config, "fid_feature_mode", "paper")
        floor = float(np.abs(train_data - np.median(train_data, axis=1, keepdims=True)).mean())
        print(
            f"  WARNING: FID feature AE reconstruction L1 {final_loss:.3f} is weak "
            f"(constant-trace floor on this data: {floor:.3f}, mode={mode!r}). "
            + ("The paper decoder has no positional signal and cannot beat that "
               "floor — its features only encode each gesture's central point, so "
               "FID comparisons are near-blind to shape/timing. Use "
               "fid_feature_mode='positional' for an informative feature space."
               if mode == "paper" else
               "FID comparisons on this feature space may be unreliable.")
        )
    return params, final_loss


def load_or_train_fid_autoencoder(
    train_data: np.ndarray,
    model_config: ModelConfig = DEFAULT_MODEL_CONFIG,
    eval_config: EvaluationConfig = DEFAULT_EVALUATION_CONFIG,
    cache_dir: Optional[str] = None,
    verbose: bool = True,
) -> Tuple[Dict, float]:
    """Disk-cached AE training (reference evaluation.py:405-440)."""
    cpath = _ae_cache_path(train_data, eval_config, cache_dir) if cache_dir else None
    if cpath is not None and cpath.exists():
        if verbose:
            print(f"  Loading cached FID autoencoder from {cpath}")
        with open(cpath, "rb") as f:
            cached = pickle.load(f)
        params = jax.tree.map(jnp.asarray, cached["params"])
        return params, cached["final_loss"]

    params, final_loss = train_fid_autoencoder(
        train_data, model_config, eval_config, verbose=verbose
    )
    if cpath is not None:
        cpath.parent.mkdir(parents=True, exist_ok=True)
        with open(cpath, "wb") as f:
            pickle.dump(
                {"params": jax.tree.map(np.asarray, params), "final_loss": final_loss}, f
            )
        if verbose:
            print(f"  Cached FID autoencoder to {cpath}")
    return params, final_loss


def fid_from_features(real_features, fake_features) -> float:
    """Fréchet distance between Gaussian feature fits, with the reference's
    1e-6 diagonal jitter (evaluation.py:461-468).

    Runs in float64 numpy on the host: the covariances are tiny
    (hidden_dim², 32×32 by default) but near-singular when n is small, and
    the reference's scipy path is f64 — an f32 device eigh costs ~0.5%
    relative error here for zero savings (measured in the cross-impl parity
    harness). ops/sqrtm.frechet_distance remains the device/jit variant.
    Covariances are explicitly symmetrized and the result clamped at 0: FID
    is nonnegative by definition, but for near-identical distributions the
    eigen-trace can overshoot tr(Σr)+tr(Σf) by float error (the reference's
    scipy path has the same exposure via the real-part take)."""
    real_features = np.asarray(real_features, np.float64)
    fake_features = np.asarray(fake_features, np.float64)
    dim = real_features.shape[1]
    mu_r = real_features.mean(axis=0)
    mu_f = fake_features.mean(axis=0)
    cov_r = np.cov(real_features, rowvar=False) + np.eye(dim) * 1e-6
    cov_f = np.cov(fake_features, rowvar=False) + np.eye(dim) * 1e-6
    cov_r = 0.5 * (cov_r + cov_r.T)
    cov_f = 0.5 * (cov_f + cov_f.T)

    # tr((Σr Σf)^1/2) = tr((Σr^1/2 Σf Σr^1/2)^1/2) — two symmetric eigs.
    w_r, v_r = np.linalg.eigh(cov_r)
    sqrt_r = (v_r * np.sqrt(np.maximum(w_r, 0.0))) @ v_r.T
    w = np.linalg.eigvalsh(sqrt_r @ cov_f @ sqrt_r)
    trace_sqrt = np.sum(np.sqrt(np.maximum(w, 0.0)))
    diff = mu_r - mu_f
    fid = diff @ diff + np.trace(cov_r) + np.trace(cov_f) - 2.0 * trace_sqrt
    return float(max(fid, 0.0))


@partial(jax.jit, static_argnames=("batch", "n_chunks"))
def _encode_scanned(params, data_padded, batch: int, n_chunks: int):
    """All encode chunks as one scanned device program (one dispatch)."""
    chunks = data_padded.reshape(n_chunks, batch, *data_padded.shape[1:])
    _, out = jax.lax.scan(lambda _, x: (None, autoencoder_encode(params, x)), None, chunks)
    return out.reshape(n_chunks * batch, -1)


def encode_features(params: Dict, gestures: np.ndarray, batch: int = 4096) -> jnp.ndarray:
    # Params as jit args (device-put once) — closing over host arrays bakes
    # them into the program, which is pathological to compile remotely.
    params_dev = jax.device_put(params)
    n = len(gestures)
    if n == 0:
        latent_dim = params["post_pool"]["w"].shape[1]
        return jnp.zeros((0, latent_dim), jnp.float32)
    from ..utils.chunking import chunk_layout, pad_to_chunks

    batch, n_chunks = chunk_layout(n, batch)
    padded = pad_to_chunks(gestures, batch, n_chunks)
    return _encode_scanned(params_dev, jnp.asarray(padded), batch, n_chunks)[:n]
