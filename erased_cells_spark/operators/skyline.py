"""Distributed skyline (Pareto frontier) query: the rows not DOMINATED
by any other row — dominance means <= on every criterion and < on at
least one (all criteria minimized; negate a column to maximize it).
The multi-criteria shortlist shape: "documents that are not beaten on
(length, noise, staleness) simultaneously by anything else".

Plan — the canonical two-phase distributed skyline:
  1. LOCAL phase: each partition reduces to its own Pareto frontier
     inside one vectorized numpy pass (mapInPandas; no shuffle). Sound
     because dominance is transitive: if q dominates p then q's
     partition keeps q (or something dominating q), so p can never be
     in the global frontier — local filtering loses nothing.
  2. GLOBAL phase: the union of local frontiers (typically tiny) is
     coalesced to one partition and reduced once more by the same
     kernel.
The naive relational form is a NOT EXISTS anti self-join with an
inequality-only predicate — a cartesian NLJ at any scale; that form is
exactly what the DuckDB oracle runs, so the twin pits the two-phase
plan against the textbook definition. Exact integer comparisons
throughout; duplicates of a frontier point all survive (neither
dominates the other under the strict-in-one rule).

Skew/size caveat: phase 2 assumes the union of local frontiers fits one
task — true for anti-correlated-to-moderate data (frontier size grows
~log^(d-1) n); a pathological all-incomparable dataset (every row on
the frontier) degrades to a single-task pass over everything, which the
caller can see coming from the phase-1 reduction ratio."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _pareto_block(mat: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the Pareto-minimal rows of an (n, d) int
    matrix. O(n * frontier) with vectorized inner comparisons: rows are
    visited in lexicographic order so no later row can dominate an
    earlier KEPT row (the first criterion never decreases, and equality
    on it forces equality-or-worse on the tiebreak columns)."""
    n = mat.shape[0]
    order = np.lexsort(mat.T[::-1])  # by col0, then col1, ...
    keep_rows: list[np.ndarray] = []
    keep_idx: list[int] = []
    for oi in order:
        row = mat[oi]
        if keep_rows:
            front = np.vstack(keep_rows)
            dominated = np.any(
                np.all(front <= row, axis=1) & np.any(front < row, axis=1)
            )
            if dominated:
                continue
        keep_rows.append(row)
        keep_idx.append(oi)
    mask = np.zeros(n, dtype=bool)
    mask[keep_idx] = True
    return mask


def skyline(df: DataFrame, criteria: list[str]) -> DataFrame:
    """Pareto frontier of `df` under minimize-all `criteria` (integer
    columns). Returns the full surviving rows."""
    if not criteria:
        raise ValueError("criteria must be non-empty")
    cols = list(df.columns)
    cidx = [cols.index(c) for c in criteria]

    def reduce_part(pdfs):
        for pdf in pdfs:
            if len(pdf):
                mat = pdf.iloc[:, cidx].to_numpy(dtype=np.int64)
                yield pdf[_pareto_block(mat)]

    def reduce_all(pdfs):
        # phase 2 must see ALL survivors at once (a frontier point of one
        # partition can dominate another partition's) — concat the single
        # coalesced partition's batches before reducing
        batches = [p for p in pdfs if len(p)]
        if batches:
            yield from reduce_part([pd.concat(batches)])

    local = df.mapInPandas(reduce_part, df.schema)
    return local.coalesce(1).mapInPandas(reduce_all, df.schema)
