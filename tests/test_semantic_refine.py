"""Adaptive SemDeDup refinement (functions/dedup.py): cells over the
pairwise cap must REFINE (extend their sign-bit key) instead of being
silently excluded, and cells still oversized at the deepest stage must
surface with ``skipped = 1`` — never vanish.

Pins the round-5 fix for the scale degeneracy called out in VERDICT r4:
at ≥10⁹ vectors a fixed 256-cell split put every cell over the cap, so
the old left-semi gate inspected nothing and said nothing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from deisa_ray_spark.functions.dedup import (
    _semantic_bucket_report,
    semantic_bucket_assign,
)

STAGES = (2, 4, 6)
CAP = 2


def _vec(bits: str, tail: float) -> list[float]:
    """8-dim embedding whose leading sign bits spell ``bits``; ``tail``
    desynchronizes the trailing dims so cosine stays below threshold."""
    e = [1.0 if b == "1" else -1.0 for b in bits]
    e += [tail, -tail / 2 + 0.1][: 8 - len(bits)] + [0.25] * (8 - len(bits) - 2)
    return [float(x) for x in e[:8]]


@pytest.fixture(scope="module")
def cells(spark):
    # Cell "11...": 5 vectors — oversized at depth 1 (cap 2), but their
    # next two sign bits split them 2/3; the 3-group ("1101") splits
    # again at depth 3 into 2/1. Everything lands bounded by depth 3.
    rows = [
        (0, _vec("110000", 0.7)),
        (1, _vec("110011", -0.9)),
        (2, _vec("110100", 0.3)),
        (3, _vec("110111", -0.5)),
        (4, _vec("110110", 0.8)),
        # Cell "00...": exactly cap-sized at depth 1 — must stay depth 1.
        (5, _vec("000000", 0.6)),
        (6, _vec("001111", -0.4)),
        # Cell "01...": 3 vectors identical through all 6 sign bits —
        # unsplittable at every stage → skipped=1 at the deepest depth.
        (7, _vec("010101", 0.9)),
        (8, _vec("010101", -0.9)),
        (9, _vec("010101", 0.1)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    return df.select(
        "vec_id",
        "e",
        *[
            F.concat_ws(
                "",
                *[
                    F.when(F.element_at("e", i + 1) >= 0, F.lit("1")).otherwise(
                        F.lit("0")
                    )
                    for i in range(n)
                ],
            ).alias(f"_b{d + 1}")
            for d, n in enumerate(STAGES)
        ],
    )


def test_every_vector_assigned_exactly_once(cells):
    out = semantic_bucket_assign(cells, CAP, STAGES).toPandas()
    assert sorted(out.vec_id) == list(range(10))


def test_oversized_cells_refine_not_skip(cells):
    out = semantic_bucket_assign(cells, CAP, STAGES).toPandas()
    by_id = out.set_index("vec_id")
    # the splittable 5-group refines to depths 2/3, nothing skipped
    assert by_id.loc[[0, 1], "depth"].tolist() == [2, 2]
    assert set(by_id.loc[[2, 3, 4], "depth"]) == {3}
    assert by_id.loc[[0, 1, 2, 3, 4], "skipped"].sum() == 0
    # each refined cell is genuinely under the cap
    sizes = out[out.skipped == 0].groupby("bucket").size()
    assert (sizes <= CAP).all()


def test_cap_sized_cell_stays_coarse(cells):
    out = semantic_bucket_assign(cells, CAP, STAGES).toPandas().set_index("vec_id")
    assert out.loc[[5, 6], "depth"].tolist() == [1, 1]
    assert out.loc[5, "bucket"] == "00"


def test_unsplittable_cell_is_skipped_with_telemetry(cells):
    out = semantic_bucket_assign(cells, CAP, STAGES).toPandas().set_index("vec_id")
    sk = out.loc[[7, 8, 9]]
    assert (sk.skipped == 1).all()
    assert (sk.depth == len(STAGES)).all()
    assert set(sk.bucket) == {"010101"}


def test_report_marks_skipped_cells_uninspected(cells):
    rep = _semantic_bucket_report(semantic_bucket_assign(cells, CAP, STAGES)).toPandas()
    sk = rep[rep.skipped == 1]
    assert len(sk) == 1
    row = sk.iloc[0]
    assert row.n_vectors == 3 and row.n_dups == 0 and row.n_kept == 3
    # totals conserve the corpus
    assert rep.n_vectors.sum() == 10
    assert (rep.n_dups + rep.n_kept == rep.n_vectors).all()


def _pure_model(vecs: dict[int, list[float]], cap: int, stages: tuple):
    """Reference implementation of the adaptive assignment (plain dicts)."""
    def bits(v, n):
        return "".join("1" if x >= 0 else "0" for x in v[:n])

    out = {}
    rest = dict(vecs)
    for depth, n in enumerate(stages, start=1):
        counts: dict[str, int] = {}
        for v in rest.values():
            counts[bits(v, n)] = counts.get(bits(v, n), 0) + 1
        fit = {i: v for i, v in rest.items() if counts[bits(v, n)] <= cap}
        for i, v in fit.items():
            out[i] = (bits(v, n), depth, 0)
        rest = {i: v for i, v in rest.items() if i not in fit}
    for i, v in rest.items():
        out[i] = (bits(v, stages[-1]), len(stages), 1)
    return out


@pytest.mark.parametrize("seed,cap", [(0, 1), (1, 2), (2, 4)])
def test_assignment_matches_pure_model(spark, seed, cap):
    """The one-pass stats/window implementation must agree with the
    straightforward iterative-refinement model on random sign patterns."""
    import numpy as np

    rng = np.random.RandomState(seed)
    vecs = {i: [float(x) for x in rng.randn(8)] for i in range(120)}
    rows = [(i, v) for i, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id long, e array<double>")
    cells = df.select(
        "vec_id",
        "e",
        *[
            F.concat_ws(
                "",
                *[
                    F.when(F.element_at("e", i + 1) >= 0, F.lit("1")).otherwise(
                        F.lit("0")
                    )
                    for i in range(n)
                ],
            ).alias(f"_b{d + 1}")
            for d, n in enumerate(STAGES)
        ],
    )
    got = {
        int(r.vec_id): (r.bucket, int(r.depth), int(r.skipped))
        for r in semantic_bucket_assign(cells, cap, STAGES).collect()
    }
    assert got == _pure_model(vecs, cap, STAGES)


def test_sem_bucket_truncates_not_pads_short_embeddings(spark):
    """A vector shorter than the requested bit depth yields a
    dim-length key (matching the oracle's [1:n] slice), never
    zero-padding to a fixed width."""
    from deisa_ray_spark.functions.dedup import _sem_bucket

    df = spark.createDataFrame([(0, [1.0, -1.0, 1.0])], "vec_id long, e array<double>")
    got = df.select(_sem_bucket(F.col("e"), 24).alias("b")).first().b
    assert got == "101"


def _write_embeddings(spark, tmp_path, rows):
    """Stage a minimal embeddings table under a tmp sf_dir (the loader
    only needs vec_id/label/embedding)."""
    import os

    sf_dir = str(tmp_path)
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    return sf_dir


def test_semantic_decontaminate_empty_bench_slice(spark, tmp_path):
    """A corpus whose vec_ids contain no multiple of BENCH_MOD must
    degrade to the oracle's empty per-label aggregate (its m CTE joins
    an empty b), not crash in np.stack([]) (r12 ADVICE)."""
    from deisa_ray_spark.functions.dedup import dedup_decontaminate_semantic

    rows = [(i, 0, [1.0, 2.0, 3.0]) for i in (1, 2, 3, 5, 98)]
    sf_dir = _write_embeddings(spark, tmp_path, rows)
    out = dedup_decontaminate_semantic(spark, sf_dir)
    assert out.columns == ["label", "n_removed", "n_kept", "top_bench_cosine"]
    assert out.count() == 0


def test_zero_norm_embedding_fails_loudly(spark, tmp_path):
    """Zero-norm vectors have no cosine; the numpy kernels must raise a
    loud ValueError instead of silently dropping NaN pairs that the
    HOF/DuckDB forms would rank as greater-than-everything (r12
    ADVICE)."""
    import pytest

    from deisa_ray_spark.functions.dedup import (
        dedup_decontaminate_semantic,
        dedup_embedding_cosine,
    )

    rows = [(0, 0, [0.0, 0.0, 0.0]), (1, 0, [1.0, 0.0, 0.0]), (2, 0, [1.0, 1.0, 0.0])]
    sf_dir = _write_embeddings(spark, tmp_path, rows)
    with pytest.raises(Exception, match="zero-norm"):
        dedup_embedding_cosine(spark, sf_dir).collect()
    with pytest.raises(Exception, match="zero-norm"):
        dedup_decontaminate_semantic(spark, sf_dir).collect()
