"""Appearance-based loop-closure retrieval (the FabMap slot).

Replaces the gated openFabMap integration (src/GlobalMapping/FabMap.{h,cpp},
compiled only with HAVE_FABMAP; Star/SURF BoW against a pre-trained
Chow-Liu tree). TPU-native design: every keyframe gets a compact global
descriptor — photometrically-normalized coarse intensity + gradient-energy
layout — and retrieval is one MXU matmul of the query descriptor against
the stacked keyframe descriptor matrix, with best-vs-second-best ratio
acceptance (the analog of FabMap's p >= 0.8 gate, FabMap.cpp:126-204).

Like the reference, this is optional (cfg.system.use_fabmap) and excludes
temporally-adjacent keyframes from matching.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


@jax.jit
def _descriptor(img_l3, gx_l3, gy_l3):
    """Descriptor from pyramid level-3 data: [normalized intensity grid;
    normalized gradient-magnitude grid], each zero-mean/unit-norm so the
    dot product is a lighting-invariant correlation."""
    def norm(x):
        x = x - jnp.mean(x)
        return x / jnp.maximum(jnp.linalg.norm(x), 1e-6)

    g = jnp.sqrt(gx_l3 * gx_l3 + gy_l3 * gy_l3)
    d = jnp.concatenate([norm(img_l3).reshape(-1), norm(g).reshape(-1)])
    return d / jnp.sqrt(2.0)  # unit norm overall


@jax.jit
def _score(query, descs):
    return jnp.einsum("d,nd->n", query, descs, precision=_HI)


class AppearanceIndex:
    """Keyframe descriptor store + matmul retrieval."""

    def __init__(self, accept_score: float = 0.55, ratio: float = 1.15,
                 min_id_gap: int = 3, level: int = 3):
        self.accept_score = accept_score
        self.ratio = ratio
        self.min_id_gap = min_id_gap
        self.level = level
        self._ids: List[int] = []
        self._descs: List[np.ndarray] = []
        self._mat: Optional[jnp.ndarray] = None

    def compute_descriptor(self, pyr) -> np.ndarray:
        l = self.level
        return np.asarray(_descriptor(pyr.images[l], pyr.gx[l], pyr.gy[l]))

    def add(self, kf_id: int, pyr) -> None:
        """== FabMap::compareAndAdd's add half (FabMap.cpp:126-204)."""
        self._ids.append(kf_id)
        self._descs.append(self.compute_descriptor(pyr))
        self._mat = None  # rebuild lazily

    def query(self, pyr, query_id: int) -> Optional[int]:
        """Best-matching keyframe id, or None if no confident match."""
        if len(self._ids) < 2:
            return None
        if self._mat is None:
            self._mat = jnp.asarray(np.stack(self._descs))
        q = jnp.asarray(self.compute_descriptor(pyr))
        scores = np.asarray(_score(q, self._mat))
        # exclude temporal neighbors (appearance matches of the immediate
        # past are not loop closures)
        ids = np.asarray(self._ids)
        scores = np.where(np.abs(ids - query_id) < self.min_id_gap * 8,
                          -1.0, scores)
        order = np.argsort(scores)[::-1]
        best, second = order[0], (order[1] if len(order) > 1 else order[0])
        if scores[best] < self.accept_score:
            return None
        if scores[second] > 0 and scores[best] < self.ratio * scores[second]:
            return None  # ambiguous place
        return int(ids[best])
