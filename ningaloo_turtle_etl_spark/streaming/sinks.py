"""Idempotent streaming sinks — ST7 (EntryBatchProcess re-runnability,
tagging-etl.Rmd:116-130: done records skipped, failed retried)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def upsert_parquet_batch(
    batch_df: DataFrame, target_path: str, key_cols: list[str]
) -> None:
    """Merge-on-key writer for ``foreachBatch``: new keys are appended,
    existing keys are replaced by the incoming batch — re-running the same
    batch is a no-op (idempotent, the ST7 contract).

    Local-parquet implementation rewrites the target (read → anti-join →
    union). On a real deployment the same function body is a Delta/Iceberg
    ``MERGE INTO`` — the foreachBatch seam is identical.
    """
    import shutil

    spark = batch_df.sparkSession
    staged = batch_df.dropDuplicates(key_cols)
    if _exists(spark, target_path):
        current = spark.read.parquet(target_path)
        keep = current.join(staged.select(*key_cols), on=key_cols, how="left_anti")
        merged = keep.unionByName(staged)
    else:
        merged = staged
    # Write-then-swap: the merge plan reads target_path, so materialize to a
    # sibling temp dir distributed (never through the driver), then rename.
    tmp_path = target_path.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(tmp_path)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.replace(tmp_path, target_path)


def foreach_batch_upserter(target_path: str, key_cols: list[str]):
    """Adapter: `writeStream.foreachBatch(foreach_batch_upserter(path, keys))`."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet_batch(batch_df, target_path, key_cols)

    return _apply


def _exists(spark, path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
