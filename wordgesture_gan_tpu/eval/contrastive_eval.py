"""Contrastive encoder evaluation: self-similarity retrieval (recall@k, mAP),
similarity search, t-SNE visualization, and real-vs-min-jerk centroid
quality — framework equivalent of the reference's EVAL_SCRIPT
(/root/reference/eval_contrastive.py:68-271), with the retrieval math
vectorized on device.
"""

from __future__ import annotations

import random
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DEFAULT_CONTRASTIVE_CONFIG, ContrastiveConfig
from ..keyboard import MinimumJerkModel, QWERTYKeyboard
from ..train.contrastive_loop import embed_gestures
from ..utils.logging import log


def evaluate_recall(
    embeddings: np.ndarray,
    labels: np.ndarray,
    k_values: Sequence[int] = (1, 5, 10, 20),
) -> Dict[str, float]:
    """Self-similarity retrieval: recall@k (any same-label neighbor in top-k)
    and mAP over the top-max(k) list (reference eval_contrastive.py:68-113),
    vectorized (the reference loops per query for AP)."""
    emb = jnp.asarray(embeddings)
    lab = np.asarray(labels)
    n = len(emb)
    sim = np.array(emb @ emb.T)      # writable host copy
    np.fill_diagonal(sim, -np.inf)

    max_k = min(max(k_values), n - 1)
    topk = np.argsort(-sim, axis=1)[:, :max_k]
    neighbor_labels = lab[topk]                              # (n, max_k)
    correct = (neighbor_labels == lab[:, None]).astype(np.float32)

    results = {}
    for k in k_values:
        ka = min(k, max_k)
        results[f"recall@{k}"] = float(correct[:, :ka].any(axis=1).mean())

    precision_at_k = np.cumsum(correct, axis=1) / np.arange(1, max_k + 1)
    hits = correct.sum(axis=1)
    ap = np.where(hits > 0, (precision_at_k * correct).sum(axis=1) / np.maximum(hits, 1), 0.0)
    results["mAP"] = float(ap.mean())
    return results


def similarity_search(
    query_embedding: np.ndarray,
    database_embeddings: np.ndarray,
    database_words: List[str],
    top_k: int = 10,
) -> List[Dict]:
    """Top-k nearest database gestures to a query embedding
    (reference eval_contrastive.py:116-133)."""
    sims = database_embeddings @ query_embedding.reshape(-1)
    order = np.argsort(-sims)[:top_k]
    return [
        {"index": int(i), "word": database_words[int(i)], "similarity": float(sims[i])}
        for i in order
    ]


def create_tsne_plot(
    embeddings: np.ndarray,
    words: List[str],
    output_path: str,
    n_samples: int = 2000,
    top_n_words: int = 20,
) -> None:
    """t-SNE scatter with the top-N most frequent words colored
    (reference eval_contrastive.py:136-176)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    if len(embeddings) > n_samples:
        keep = np.random.choice(len(embeddings), n_samples, replace=False)
        embeddings = embeddings[keep]
        words = [words[i] for i in keep]

    top_words = [w for w, _ in Counter(words).most_common(top_n_words)]
    color_of = {w: i for i, w in enumerate(top_words)}

    log(f"Running t-SNE on {len(embeddings)} samples...")
    coords = TSNE(n_components=2, perplexity=min(30, len(embeddings) - 1),
                  random_state=42).fit_transform(embeddings)

    fig, ax = plt.subplots(figsize=(14, 12))
    other = np.array([w not in color_of for w in words])
    if other.any():
        ax.scatter(coords[other, 0], coords[other, 1], c="lightgray", alpha=0.3, s=5, label="other")
    for word, ci in color_of.items():
        mask = np.array([w == word for w in words])
        if mask.any():
            ax.scatter(coords[mask, 0], coords[mask, 1], c=[plt.cm.tab20(ci)],
                       alpha=0.7, s=20, label=word)
    ax.set_title(f"t-SNE of Gesture Embeddings (n={len(embeddings)}, top {top_n_words} words colored)")
    ax.set_xlabel("t-SNE 1")
    ax.set_ylabel("t-SNE 2")
    ax.legend(bbox_to_anchor=(1.02, 1), loc="upper left", fontsize=8)
    fig.savefig(output_path, dpi=150, bbox_inches="tight")
    log(f"Saved t-SNE plot to {output_path}")
    plt.close(fig)


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def evaluate_centroids(
    state: Dict,
    gestures_by_word: Dict[str, List[np.ndarray]],
    keyboard: QWERTYKeyboard,
    config: ContrastiveConfig = DEFAULT_CONTRASTIVE_CONFIG,
    sample_counts: Sequence[int] = (5, 10, 20, 50),
    seed: int = 42,
    verbose: bool = True,
) -> Dict[str, float]:
    """Real-gesture centroids vs fitted-min-jerk centroids at several sample
    counts; reports recall@1 and the gap (reference eval_contrastive.py:179-271)."""
    say = log if verbose else (lambda *_: None)

    eligible = [w for w, g in gestures_by_word.items() if len(g) >= 2]
    random.seed(seed)
    random.shuffle(eligible)
    split = int(len(eligible) * 0.8)
    train_words = set(eligible[:split])
    test_words = eligible[split:]
    say(f"  Train words: {len(train_words)}, Test words: {len(test_words)}")

    say("Fitting MinimumJerkModel on training data...")
    mj_model = MinimumJerkModel(keyboard).fit(
        {w: gestures_by_word[w] for w in train_words}, verbose=verbose
    )

    # Flatten test gestures → queries; compute real per-word centroids.
    queries, query_words = [], []
    for word in test_words:
        for g in gestures_by_word[word]:
            queries.append(np.asarray(g, np.float32))
            query_words.append(word)
    query_emb = embed_gestures(state, np.stack(queries), config)
    say(f"  Embedded {len(query_emb)} gestures")

    word_list = list(test_words)
    word_idx = {w: i for i, w in enumerate(word_list)}
    q_ids = np.array([word_idx[w] for w in query_words])

    real_matrix = np.stack([
        _normalize_rows(query_emb[q_ids == i].mean(axis=0)) for i in range(len(word_list))
    ])

    def recall1(centroid_matrix: np.ndarray) -> float:
        sim = query_emb @ centroid_matrix.T
        return float((np.argmax(sim, axis=1) == q_ids).mean())

    real_r1 = recall1(real_matrix)
    results = {"real_recall@1": real_r1}

    say("")
    say("=" * 60)
    say("Centroid Quality: Real vs Min Jerk")
    say("=" * 60)
    say(f"  Real centroids recall@1: {real_r1:.4f}")
    say("")
    say("  Samples    recall@1    Gap vs Real")

    rng = np.random.default_rng(seed)
    for n_samples in sample_counts:
        # Generate ALL words' trajectories, embed in one batched pass, then
        # per-word segment means — one device round-trip per sample count
        # instead of one per word.
        trajs = np.stack([
            mj_model.generate_trajectory(word, num_points=config.seq_length, rng=rng)
            for word in word_list
            for _ in range(n_samples)
        ])
        emb = embed_gestures(state, trajs, config)
        emb = emb.reshape(len(word_list), n_samples, -1)
        mj_r1 = recall1(_normalize_rows(emb.mean(axis=1)))
        gap = real_r1 - mj_r1
        say(f"  {n_samples:3d}         {mj_r1:.4f}      {gap:+.4f}")
        results[f"minjerk_{n_samples}_recall@1"] = mj_r1

    say("=" * 60)
    return results
