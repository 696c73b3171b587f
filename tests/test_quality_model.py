"""Trained quality classifier (NB over hashed + engineered features):
the distillation contract — agreement with the silver rule — plus the
weights-artifact properties (bounded, cached, discriminative)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deisa_ray_spark.functions.quality_model import (
    QCM_LEN_BASE,
    QCM_TTR_BASE,
    QCM_V,
    txt_quality_infer,
    txt_quality_train,
    _trained,
)
from tests.conftest import SF_DIR


def test_agreement_contract_and_nondegenerate_classes(spark):
    inf = txt_quality_infer(spark, SF_DIR).select("y_rule", "agree").toPandas()
    pos = inf.y_rule.mean()
    assert 0.05 < pos < 0.95, f"silver rule degenerate (pos={pos:.3f})"
    agree = inf.agree.mean()
    # measured 1.000 at all SFs incl. the generated sf1; conservative floor
    assert agree >= 0.95, f"agreement {agree:.3f}"


def test_weight_artifact_bounded_and_discriminative(spark):
    w = txt_quality_train(spark, SF_DIR).toPandas()
    assert len(w) <= QCM_V, "weight table exceeds the feature space"
    assert w.fid.is_unique
    # the engineered ttr buckets straddle the rule threshold: buckets
    # below 4 (ttr < 0.4) must carry NEGATIVE weight, buckets >= 4 that
    # occur in positive docs carry positive weight
    ttr = w[(w.fid >= QCM_TTR_BASE) & (w.fid < QCM_TTR_BASE + 11)]
    low = ttr[ttr.fid - QCM_TTR_BASE < 4]
    if len(low):
        assert (low.w_fp < 0).all(), "sub-threshold ttr bucket with + weight"
    hi = ttr[(ttr.fid - QCM_TTR_BASE >= 4) & (ttr.c_pos > ttr.c_neg)]
    assert len(hi) and (hi.w_fp > 0).all()
    # length buckets exist too
    assert ((w.fid >= QCM_LEN_BASE) & (w.fid < QCM_LEN_BASE + 21)).any()


def test_weights_are_session_cached(spark):
    w1, b1 = _trained(spark, SF_DIR)
    w2, b2 = _trained(spark, SF_DIR)
    assert w1 is w2 and b1 is b2, "trained artifact rebuilt instead of cached"


def test_inference_is_broadcast_no_python(spark):
    plan = txt_quality_infer(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_keep_frontier_is_integer_exact(spark):
    """kept is a pure function of the integer logit — no float column
    participates in the decision."""
    inf = txt_quality_infer(spark, SF_DIR)
    bad = inf.filter(
        ((F.col("logit_fp") >= 0) & (F.col("kept") == 0))
        | ((F.col("logit_fp") < 0) & (F.col("kept") == 1))
    ).count()
    assert bad == 0


def test_pr_grid_covers_logit_range(spark):
    """PR_THRESHOLDS is a compile-time grid chosen to span PAST the
    observed logit extremes (~±1.3e7). If a regenerated or larger
    corpus pushes logit_fp outside ±16e6, the curve's recall-1 /
    recall-0 anchors silently disappear and the invariants test breaks
    with no pointer to the cause — fail HERE with one instead."""
    from deisa_ray_spark.functions.quality_model import (
        PR_THRESHOLDS,
        txt_quality_infer,
    )

    lo, hi = (
        txt_quality_infer(spark, SF_DIR)
        .agg(F.min("logit_fp"), F.max("logit_fp"))
        .collect()[0]
    )
    assert PR_THRESHOLDS[0] <= lo, (
        f"corpus logit min {lo} fell below the PR_THRESHOLDS grid floor "
        f"{PR_THRESHOLDS[0]} — widen the grid in quality_model.py"
    )
    assert hi < PR_THRESHOLDS[-1], (
        f"corpus logit max {hi} reached the PR_THRESHOLDS grid top "
        f"{PR_THRESHOLDS[-1]} — widen the grid in quality_model.py"
    )


def test_pr_curve_invariants(spark):
    """The sweep must behave like a PR curve: positives predicted shrink
    monotonically as the threshold rises, the lowest threshold reaches
    recall 1 vs BOTH rules, the frontier row (thr=0) reproduces infer's
    perfect silver agreement, and the holdout panel is non-degenerate
    (the model actually separates Gopher-kept docs at the frontier)."""
    from deisa_ray_spark.functions.quality_model import txt_quality_pr_curve

    rows = sorted(
        txt_quality_pr_curve(spark, SF_DIR).collect(), key=lambda r: r["thr_fp"]
    )
    n = rows[0]["tp"] + rows[0]["fp"] + rows[0]["fn"] + rows[0]["tn"]
    prev_pos = None
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert r["tp_h"] + r["fp_h"] + r["fn_h"] + r["tn_h"] == n
        pos = r["tp"] + r["fp"]
        if prev_pos is not None:
            assert pos <= prev_pos, "predicted positives must shrink"
        prev_pos = pos
    assert rows[0]["recall_x1e6"] == 1_000_000
    assert rows[0]["recall_h_x1e6"] == 1_000_000
    frontier = [r for r in rows if r["thr_fp"] == 0][0]
    assert frontier["fp"] == 0 and frontier["fn"] == 0  # silver is circular
    assert frontier["tp_h"] > 0 and frontier["precision_h_x1e6"] > 500_000
