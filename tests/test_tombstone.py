"""dedup_tombstone_propagation invariants: deletion only removes nodes,
so a surviving document's canonical can only INCREASE (the old minimum
died or its component split — never a new smaller member), no tombstoned
id may appear anywhere in the output, and every new canonical is itself
a surviving document from the doc's old component or the doc itself."""

from __future__ import annotations

from deisa_ray_spark.functions.dedup import TOMB_MOD, dedup_tombstone_propagation
from tests.conftest import SF_DIR


def test_tombstone_propagation_invariants(spark):
    rows = dedup_tombstone_propagation(spark, SF_DIR).collect()
    assert rows, "the tombstone slice must hit at least one cluster at test SF"
    for r in rows:
        assert r["doc_id"] % TOMB_MOD != 0  # only survivors are reported
        assert r["canon_after"] % TOMB_MOD != 0  # no deleted canonical
        # node removal can only raise the component minimum
        assert r["canon_after"] > r["canon_before"], r
        # the doc itself is always an upper bound for its canonical
        assert r["canon_after"] <= r["doc_id"], r
