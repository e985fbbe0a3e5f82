"""Durable materialization for deliberately-reused intermediates.

MinHash signatures, IVF assignments, and per-round CC labels are each
read >= 2x by their consumers; without materialization Catalyst expands
every consumer into its own copy of the producing subtree (the round-1
double-compute disease, PLANS.md). ``localCheckpoint`` fixes the
recompute but stores blocks UNREPLICATED on executors — on a real
cluster an executor loss makes the intermediate unrecoverable and fails
the job. This module makes the durable alternative a code path instead
of a docstring promise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize(df: DataFrame, persist_dir: str | None, name: str) -> DataFrame:
    """Materialize an intermediate that downstream plans read >= 2x.

    * ``persist_dir=None`` (default): ``localCheckpoint`` — in-session,
      no filesystem I/O, right for local mode / tests / single-session
      benches; blocks are unreplicated, so not executor-loss-safe.
    * ``persist_dir=<path>``: write parquet to ``<persist_dir>/<name>``
      and re-read it — the production path: survives executor loss, is
      restartable, and the artifact is shareable across jobs (signature
      tables and IVF assignments ARE reused across dedup runs, which is
      why they were worth materializing in the first place).

    Both paths cut lineage; results are byte-identical either way
    (tests/test_materialize.py proves it per operator).
    """
    if persist_dir is None:
        return df.localCheckpoint()
    path = os.path.join(persist_dir, name)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
