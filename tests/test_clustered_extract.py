"""assume_clustered extraction path: identical output to the shuffle path
when the input layout guarantees conversation clustering."""

from __future__ import annotations

import pandas as pd

from kglinker.data.transcripts import transcripts_df
from kglinker.extract.stage import extract_mentions


def _norm(df):
    df = df.copy()
    df["kb_id"] = df["kb_id"].astype("float64")
    return (df.sort_values(["conv_id", "turn_idx", "start"])
            .reset_index(drop=True))


def test_clustered_path_matches_shuffle_path(spark, artifacts_bcast, tmp_path):
    # write conversation-contiguous parquet: the generator emits whole
    # conversations per partition; one file per partition, small enough
    # that read-back never splits a file
    p = str(tmp_path / "clustered")
    transcripts_df(spark, 300, partitions=4).write.parquet(p)
    t = spark.read.parquet(p)
    got = _norm(extract_mentions(t, artifacts_bcast,
                                 assume_clustered=True).toPandas())
    want = _norm(extract_mentions(t, artifacts_bcast,
                                  num_partitions=8).toPandas())
    assert len(got) == len(want) > 500
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_clustered_plan_has_no_exchange(spark, artifacts_bcast, tmp_path):
    p = str(tmp_path / "c2")
    transcripts_df(spark, 50, partitions=2).write.parquet(p)
    t = spark.read.parquet(p)
    plan = extract_mentions(t, artifacts_bcast, assume_clustered=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    default_plan = extract_mentions(t, artifacts_bcast) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in default_plan
