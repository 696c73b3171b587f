"""The data card must be internally consistent with the artifacts it
summarizes — shares sum to ~1e6, counts cross-check against the owning
queries — so a drift in any composed section breaks loudly here even
before the oracle mirror runs."""

from __future__ import annotations

from collections import defaultdict

from deisa_ray_spark.functions.report import report_data_card
from tests.conftest import SF_DIR


def _card(spark):
    rows = report_data_card(spark, SF_DIR).collect()
    by_sec = defaultdict(dict)
    for r in rows:
        by_sec[r["section"]][r["metric"]] = (r["v_int"], r["v_x1e6"])
    return by_sec


def test_card_sections_and_share_closure(spark):
    card = _card(spark)
    assert set(card) == {
        "corpus", "mixture_source", "mixture_lang", "dedup", "quality",
        "contamination",
    }
    n_docs = card["corpus"]["n_docs"][0]
    for sec in ("mixture_source", "mixture_lang"):
        counts = [v for v, _s in card[sec].values()]
        shares = [s for _v, s in card[sec].values()]
        assert sum(counts) == n_docs
        # truncating DIV loses < 1 millionth per group
        assert 1_000_000 - len(shares) <= sum(shares) <= 1_000_000
    assert card["corpus"]["n_sources"][0] == len(card["mixture_source"])
    assert card["corpus"]["n_langs"][0] == len(card["mixture_lang"])


def test_card_cross_checks_owning_queries(spark):
    from deisa_ray_spark.functions.dedup import dedup_span_extents
    from deisa_ray_spark.functions.quality_model import txt_quality_infer

    card = _card(spark)
    ext = dedup_span_extents(spark, SF_DIR).collect()
    assert card["dedup"]["n_dup_extents"][0] == len(ext)
    assert card["dedup"]["dup_words"][0] == sum(r["n_words"] for r in ext)
    inf = txt_quality_infer(spark, SF_DIR).collect()
    assert card["quality"]["model_kept"][0] == sum(r["kept"] for r in inf)
    assert card["quality"]["silver_kept"][0] == sum(r["y_rule"] for r in inf)
