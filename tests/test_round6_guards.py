"""Round-6 guard rails (ADVICE r5 correctness items applied during the
optimization round): connected-components must not return partial labels,
and uncertainty-weighted ensemble combine must survive zero-uncertainty
rows."""

import pytest
from pyspark.sql import functions as F

from sits_spark import api
from sits_spark import queries as Q


def test_dedup_groups_raises_instead_of_partial_labels(spark, monkeypatch):
    """With the round budget forced to 1, any dataset whose LSH pair graph
    needs >= 1 propagation round must RAISE, not silently return the
    unconverged labels (ADVICE r5: chains longer than _CC_MAX_ROUNDS would
    otherwise produce wrong group ids with no signal)."""
    sf = "/root/testdata/sf0.01"
    assert Q.doc_minhash_lsh(spark, sf).count() > 0  # graph has edges
    monkeypatch.setattr(Q, "_CC_MAX_ROUNDS", 1)
    with pytest.raises(RuntimeError, match="fixpoint"):
        Q.doc_dedup_groups(spark, sf).count()


def test_dedup_groups_converges_normally(spark):
    sf = "/root/testdata/sf0.01"
    out = Q.doc_dedup_groups(spark, sf)
    assert out.where(F.col("group_id") > F.col("doc_id")).count() == 0


def test_combine_predictions_zero_uncertainty_rows(spark):
    """A model reporting zero uncertainty must not poison the combined
    probabilities with NaN (1/0 -> inf, inf/inf -> NaN before the fix);
    the zero-uncertainty model should dominate the weights instead."""
    a = spark.createDataFrame([(1, 0.8, 0.0)], "sid int, p_x double, u double")
    b = spark.createDataFrame([(1, 0.2, 0.5)], "sid int, p_x double, u double")
    row = (
        api.combine_predictions(
            [a, b], ["sid"], ["p_x"], type="uncertainty", uncert_col="u"
        )
        .collect()[0]
    )
    assert row["p_x"] == pytest.approx(0.8, abs=1e-9)
    assert row["p_x"] == row["p_x"]  # not NaN
