"""Synthetic swipelog generation in the "How We Swipe" on-disk format.

The reference dataset's ``swipelogs.zip`` is a large stripped blob, so the
framework bundles a generator that synthesizes `.log` files with the exact
column layout the parser consumes (reference dataset/README.md:14-44 and
data.py:167-231). Trajectories are noisy minimum-jerk paths through key
centers rendered in pixel space, so the full pipeline — parser, normalizer,
canonical-transform fit — is exercised end-to-end with realistic geometry.

This is a data *stand-in*, not part of the reference's surface; training and
eval run unchanged on the real zip when present.
"""

from __future__ import annotations

import zipfile
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from ..keyboard import QWERTYKeyboard, generate_minimum_jerk_trajectory

HEADER = (
    "sentence timestamp keyb_width keyb_height event x_pos y_pos x_radius y_radius "
    "angle word is_err"
)

_DEFAULT_WORDS = (
    "the and you that was for are with his they this have from one had word but what "
    "some can out other were all there when your how said each she which their time "
    "will way about many then them write would like these her long make thing see him "
    "two has look more day could come did number sound most people over know water "
    "than call first who may down side been now find any new work part take get place "
    "made live where after back little only round man year came show every good give "
    "under name very through just form sentence great think say help low line differ "
    "turn cause much mean before move right boy old too same tell does set three want "
    "air well also play small end put home read hand port large spell add even land "
    "here must big high such follow act why ask men change went light kind off need "
    "house picture try again animal point mother world near build self earth father"
).split()


def load_word_list(wordfreq_path: Optional[str] = None, max_words: int = 2000) -> List[str]:
    """Word vocabulary for synthesis: the bundled wordfreq table when
    available (``count word`` rows, ascending by count — reference
    dataset/wordfreq.txt), else a built-in common-word list. Returns the
    ``max_words`` most frequent words, most frequent first."""
    if wordfreq_path and Path(wordfreq_path).exists():
        entries = []
        with open(wordfreq_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2 and parts[0].isdigit() and len(parts[1]) >= 2 and parts[1].isalpha():
                    entries.append((int(parts[0]), parts[1].lower()))
        if entries:
            entries.sort(key=lambda e: -e[0])
            return [w for _, w in entries[:max_words]]
    return [w for w in _DEFAULT_WORDS if len(w) >= 2]


def _render_word_trace(
    keyboard: QWERTYKeyboard,
    word: str,
    rng: np.random.Generator,
    keyb_w: float,
    keyb_h: float,
) -> Optional[np.ndarray]:
    """One noisy trace for a word in pixel coordinates: a fitted-style
    minimum-jerk path in canonical space, perturbed, mapped to pixels, with a
    velocity-profile-consistent millisecond clock."""
    centers = keyboard.get_key_centers_for_word(word)
    if len(centers) < 2:
        return None

    n_raw = int(rng.integers(24, 96))
    traj = generate_minimum_jerk_trajectory(
        centers, num_points=n_raw, include_midpoints=True, offset_std=0.035, rng=rng
    ).astype(np.float64)

    # Sensor jitter on top of the smooth path.
    traj[:, :2] += rng.normal(0, 0.006, (n_raw, 2))

    # Canonical [-1,1] → pixels. Canonical x spans ±0.9; leave a margin.
    px = (traj[:, 0] + 1.0) / 2.0 * keyb_w
    py = (traj[:, 1] + 1.0) / 2.0 * keyb_h

    # Time: tau in [0,1] → total duration 300–1200 ms with per-sample jitter,
    # kept monotone.
    duration = rng.uniform(300, 1200)
    t = traj[:, 2] * duration
    t = np.maximum.accumulate(t + rng.normal(0, 2.0, n_raw))
    t = t - t[0]
    return np.column_stack([px, py, t])


def word_frequencies(wordfreq_path: Optional[str], words: Sequence[str]) -> Optional[np.ndarray]:
    """Sampling probabilities for ``words`` from the wordfreq table (None →
    uniform). Makes synthetic word occurrence Zipf-like, as in real logs."""
    if not (wordfreq_path and Path(wordfreq_path).exists()):
        return None
    counts = {}
    with open(wordfreq_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and parts[0].isdigit():
                counts[parts[1].lower()] = int(parts[0])
    weights = np.array([counts.get(w, 1) for w in words], dtype=np.float64)
    return weights / weights.sum()


def generate_log_content(
    keyboard: QWERTYKeyboard,
    words: Sequence[str],
    rng: np.random.Generator,
    n_sentences: int = 8,
    words_per_sentence: int = 5,
    keyb_w: float = 1080.0,
    keyb_h: float = 360.0,
    error_rate: float = 0.03,
    word_probs: Optional[np.ndarray] = None,
) -> str:
    """One user's `.log` file content (header + event rows)."""
    lines = [HEADER]
    clock = float(rng.integers(10_000, 50_000))

    for sent_idx in range(n_sentences):
        chosen = rng.choice(len(words), size=words_per_sentence, replace=True, p=word_probs)
        for wi in chosen:
            word = words[int(wi)]
            trace = _render_word_trace(keyboard, word, rng, keyb_w, keyb_h)
            if trace is None:
                continue
            is_err = 1 if rng.random() < error_rate else 0
            for j, (x, y, t) in enumerate(trace):
                event = (
                    "touchstart" if j == 0
                    else "touchend" if j == len(trace) - 1
                    else "touchmove"
                )
                ts = int(clock + t)
                lines.append(
                    f"s{sent_idx} {ts} {keyb_w:.0f} {keyb_h:.0f} {event} "
                    f"{x:.2f} {y:.2f} 10.0 10.0 0.0 {word} {is_err}"
                )
            clock += trace[-1, 2] + float(rng.uniform(150, 600))

    return "\n".join(lines)


def write_synthetic_swipelogs_zip(
    out_path: str,
    n_users: int = 40,
    seed: int = 0,
    wordfreq_path: Optional[str] = None,
    n_sentences: int = 8,
    words_per_sentence: int = 5,
    max_vocab: int = 500,
) -> str:
    """Write a synthetic ``swipelogs.zip`` with ``n_users`` `.log` members."""
    keyboard = QWERTYKeyboard()
    words = load_word_list(wordfreq_path, max_words=max_vocab)
    probs = word_frequencies(wordfreq_path, words)
    rng = np.random.default_rng(seed)

    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        for u in range(n_users):
            content = generate_log_content(
                keyboard, words, rng,
                n_sentences=n_sentences, words_per_sentence=words_per_sentence,
                word_probs=probs,
            )
            zf.writestr(f"user{u:04d}.log", content)
    return out_path
