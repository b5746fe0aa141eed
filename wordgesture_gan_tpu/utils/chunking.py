"""Shared chunk sizing + padding for scanned whole-dataset device programs.

Four eval/serve paths (GAN generation, variable-length generation,
contrastive embedding, FID feature encoding) map an apply-function over a
large host array as ONE scanned device program. They share the same
pre-flight math, centralized here so the policy lives in one place:

  * chunk size is a power of two ≤ the requested batch — odd batch sizes are
    compile poison for the recurrence kernels (measured on v5e: B=2000 takes
    ~190 s to compile, B=2048 ~10 s, B=512 ~3 s) and powers of two keep the
    shape universe small for the persistent compilation cache;
  * inputs are zero-padded to whole chunks (callers crop the output back
    to n rows).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def chunk_layout(n: int, batch: int) -> Tuple[int, int]:
    """(chunk_size, n_chunks) for n rows at a requested max batch. n >= 1."""
    batch = min(batch, 1 << (n - 1).bit_length())
    return batch, -(-n // batch)


def pad_to_chunks(array, chunk: int, n_chunks: int, dtype=np.float32) -> np.ndarray:
    """Zero-pad a host array's leading axis to exactly chunk * n_chunks rows."""
    array = np.asarray(array, dtype)
    padded = np.zeros((chunk * n_chunks, *array.shape[1:]), dtype)
    padded[: len(array)] = array
    return padded
