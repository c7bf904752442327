"""Deterministic pseudo-random hyperplanes for sign sketches and LSH
buckets.

One generator serves every sketch family (similarity's ``h:``/``s:``
planes, dedup's ``e:`` planes): component (h, i) is the first md5 hex
digit of ``"<prefix>:<h>:<i>"`` centered to [-7.5, 7.5] — seed-free, so
the SAME literals are inlined into both the Spark plans and the DuckDB
oracles by construction. A single definition also keeps the embedding
dimensionality in one place: a plane row shorter than the vectors would
make ``zip_with`` NULL-pad and silently zero every sketch.
"""

from __future__ import annotations

import hashlib

#: dimensionality of the ``embeddings.embedding`` column (TESTDATA.md).
EMBEDDING_DIM = 64


def md5_planes(prefix: str, n_planes: int, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    return [
        [
            int(hashlib.md5(f"{prefix}:{h}:{i}".encode()).hexdigest()[0], 16) - 7.5
            for i in range(dim)
        ]
        for h in range(n_planes)
    ]
