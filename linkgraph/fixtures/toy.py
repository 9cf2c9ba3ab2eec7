"""ToyExample replica — exact copy of the reference's golden fixture.

Mirrors ``/root/reference/ToyExample/`` (Example.txt + delta_{add,del}{0,1}
.txt) so the oracle and the engine can be checked on the reference's own
graph.  See FIXTURES.md F3.
"""

from __future__ import annotations

import numpy as np

# Example.txt: 18 undirected edges over ids 0..13 (3 and 9 isolated).
BASE_EDGES = [
    (0, 1), (0, 2), (0, 4), (1, 2), (1, 4), (2, 4), (2, 6), (4, 5),
    (5, 6), (5, 7), (5, 8), (6, 7), (6, 8), (10, 11), (10, 12), (10, 13),
    (11, 12), (11, 13),
]
N_BASE_NODES = 14

# Per-timestep delta batches; within a timestep deletions apply first
# (reference: main_louvain.cpp:1221 del phase before :1458 add phase).
DELTAS = [
    {"del": [(0, 1), (1, 2)], "add": [(3, 9), (4, 6), (14, 15)]},
    {"del": [(10, 11), (10, 12), (10, 13)], "add": [(3, 10), (9, 10), (14, 16)]},
]


def base_edge_array() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric (src, dst, w) arrays for the base graph, w=1."""
    e = np.array(BASE_EDGES, dtype=np.int64)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    w = np.ones(len(src), dtype=np.float64)
    return src, dst, w


def delta_arrays(ts: int, op: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Directed-as-written (src, dst, w) arrays for one delta batch."""
    pairs = DELTAS[ts][op]
    if not pairs:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.float64))
    e = np.array(pairs, dtype=np.int64)
    return e[:, 0], e[:, 1], np.ones(len(e), dtype=np.float64)
