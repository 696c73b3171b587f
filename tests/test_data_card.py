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
        "contamination", "embedding", "retrieval", "tokenizer",
        "vocabulary", "templates", "deletions",
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


def test_card_v2_sections_cross_check(spark):
    """The r10 sections must agree with their owning queries/tables."""
    from deisa_ray_spark.functions.dedup import (
        JACCARD_THRESHOLD,
        dedup_lsh_recall_audit,
    )
    from deisa_ray_spark.sources.registry import load_table

    card = _card(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    assert card["embedding"]["n_vectors"][0] == emb.count()
    assert card["embedding"]["n_labels"][0] == (
        emb.select("label").distinct().count()
    )
    aud = dedup_lsh_recall_audit(spark, SF_DIR).collect()
    above = [r for r in aud if r["bucket"] >= int(JACCARD_THRESHOLD * 10)]
    n_pairs, n_caught = card["retrieval"]["lsh_pairs_above_thresh"]
    assert n_pairs == sum(r["n_true_pairs"] for r in above)
    if n_pairs:
        assert n_caught == (
            sum(r["n_caught"] for r in above) * 1_000_000 // n_pairs
        )
    # tokenizer fertility millionths must sit between 1 and 20 pieces
    # per word and order consistently with the A/B's measured ranking
    toks = card["tokenizer"]
    assert toks["word_occurrences"][0] > 0
    for fam in ("bpe_pieces", "wp_pieces", "uni_pieces"):
        assert 1_000_000 <= toks[fam][1] <= 20_000_000


def test_card_v3_sections_cross_check(spark):
    """vocabulary / templates / deletions must agree with their owning
    queries and constants."""
    from deisa_ray_spark.functions.dedup import TOMB_MOD
    from deisa_ray_spark.functions.text import (
        txt_boilerplate_prefixes,
        txt_vocab_growth,
    )
    from deisa_ray_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    card = _card(spark)
    growth = txt_vocab_growth(spark, SF_DIR).collect()
    final = max(growth, key=lambda r: r["bucket"])
    assert card["vocabulary"]["n_token_types"][0] == final["n_types_cum"]
    bp = txt_boilerplate_prefixes(spark, SF_DIR).collect()
    # the card's global top prefix count is >= any per-source top count
    assert card["templates"]["top_prefix_docs"][0] >= max(
        r["n_docs"] for r in bp
    )
    docs = load_table(spark, SF_DIR, "documents")
    n_tomb = docs.filter(F.col("doc_id") % TOMB_MOD == 0).count()
    assert card["deletions"]["tombstone_docs"][0] == n_tomb
