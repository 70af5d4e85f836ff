#!/usr/bin/env python
"""Build the sf1 retrieval-scale fixture: one more DECADE of embedding
density than the largest driver testdata (r9 verdict task 5).

The driver generates sf0.001/0.01/0.1 only; the retrieval stack's
flatness/recall-trend claims are proven across those, and this fixture
extends the sweep one decade further WITHOUT touching /root/testdata
(read-only) or inventing new oracle inputs: the 2000 sf0.1 vectors are
kept VERBATIM (vec_ids 0..1999, so the query vectors and every
engine constant keep their meaning) and 18000 derived vectors are added
(vec_id 2000.., each a seeded Gaussian perturbation sigma=0.05 of a
random original, label inherited — cluster structure persists, density
x10). The remaining nine tables are symlinked from sf0.1: embedding-
only queries never read them, and load_dir just needs the paths to
exist. Deterministic (fixed seed) so two builds byte-agree.

Usage: python scripts/gen_scale_fixture.py  ->  .scale_fixtures/sf1/
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_fixtures",
    "sf1",
)
TARGET_N = 20_000
SIGMA = 0.05
SEED = 20260816


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    base = pd.read_parquet(f"{SRC}/embeddings.parquet")
    n0 = len(base)
    vecs = np.asarray(base["embedding"].to_list(), dtype=np.float32)
    labels = base["label"].to_numpy()
    rng = np.random.RandomState(SEED)
    idx = rng.randint(0, n0, size=TARGET_N - n0)
    noise = rng.normal(0.0, SIGMA, size=(TARGET_N - n0, vecs.shape[1]))
    new = (vecs[idx] + noise).astype(np.float32)
    out = pd.DataFrame(
        {
            "vec_id": np.concatenate(
                [base["vec_id"].to_numpy(), np.arange(n0, TARGET_N)]
            ).astype(np.int64),
            "embedding": list(vecs) + list(new),
            "label": np.concatenate([labels, labels[idx]]).astype(np.int32),
        }
    )
    out.to_parquet(f"{DST}/embeddings.parquet", index=False)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents".split()
    ):
        link = f"{DST}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)
    print(f"wrote {DST}: {TARGET_N} vectors ({n0} original + derived)")


if __name__ == "__main__":
    sys.exit(main())
