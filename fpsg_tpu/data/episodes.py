"""Host-side episodic samplers (parity with ``src/datasets/utils.py``).

These exist for the host-driven eval path and for reproducing the
reference's sampling semantics in tests; the training hot path uses the
on-device :func:`fpsg_tpu.data.corpus.sample_episode_batch`.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def extract_episode_indices(
    rng: np.random.Generator,
    n_examples: int,
    n_support: int,
    n_query: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Support/query index split without replacement
    (``extract_episode``, datasets/utils.py:4-28). ``n_query == -1`` uses
    the rest of the class."""
    if n_query == -1:
        n_query = n_examples - n_support
    perm = rng.permutation(n_examples)[: n_support + n_query]
    return perm[:n_support], perm[n_support:]


class EpisodicBatchSampler:
    """Yields a random item index per episode, ``n_episodes`` times
    (datasets/utils.py:31-42): the item's class defines the episode, giving
    class-frequency-weighted class sampling."""

    def __init__(self, n_items: int, n_way: int, n_episodes: int, seed=None):
        self.n_items = n_items
        self.n_way = n_way
        self.n_episodes = n_episodes
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.n_episodes

    def __iter__(self) -> Iterator[np.ndarray]:
        for _ in range(self.n_episodes):
            yield self.rng.permutation(self.n_items)[: self.n_way]


class SequentialBatchSampler:
    """Every item once, one per batch — deterministic full-test-set eval
    (datasets/utils.py:45-54, fixed ``--sequential_eval`` behavior)."""

    def __init__(self, n_items: int):
        self.n_items = n_items

    def __len__(self) -> int:
        return self.n_items

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(self.n_items):
            yield np.array([i])
