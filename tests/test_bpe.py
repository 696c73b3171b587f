"""BPE tokenizer semantics: the Spark merge rounds must equal a pure
Python Sennrich-style reference (learn_bpe over word frequencies,
greedy left-to-right within-word merge), including the edge cases the
sentinel-replace encoding must get right (overlapping pairs, merged
symbols re-matching as the RIGHT element but never the LEFT within a
round, symbol-boundary alignment)."""

from __future__ import annotations

import re

from deisa_ray_spark.functions.bpe import (
    BPE_MERGES,
    bpe_train_from_words,
    txt_bpe_encode,
    txt_bpe_train,
)
from deisa_ray_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def _ref_bpe(word_freq: dict[str, int], k: int):
    """Reference BPE: returns (merge list, final symbol lists)."""
    words = {w: list(w) + ["</w>"] for w in word_freq}
    merges = []
    for rnd in range(1, k + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + word_freq[w]
        if not pc:  # every word fully merged — pairs exhausted
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, a + b, c))
        for w, syms in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = out
    return merges, words


def _freq_df(spark, freqs: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in freqs.items()], "w string, cnt bigint"
    )


def _vocab_syms(vocab_df):
    out = {}
    for r in vocab_df.collect():
        out[r["w"]] = r["s"].strip("\x01").split("\x01\x01")
    return out


def test_bpe_matches_reference_on_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    wf: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in r["text"].lower().split(" "):
            if re.fullmatch(r"[a-z]+", w):
                wf[w] = wf.get(w, 0) + 1
    ref_merges, ref_words = _ref_bpe(wf, BPE_MERGES)

    got = sorted(
        tuple(r) for r in txt_bpe_train(spark, SF_DIR).collect()
    )
    assert got == sorted(ref_merges)

    enc = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in txt_bpe_encode(spark, SF_DIR).collect()
    }
    ref_ntok = {w: len(s) for w, s in ref_words.items()}
    for r in docs.select("doc_id", "text").collect():
        want = sum(
            ref_ntok[w]
            for w in r["text"].lower().split(" ")
            if re.fullmatch(r"[a-z]+", w)
        )
        assert enc[r["doc_id"]] == want


def test_bpe_greedy_overlap_semantics(spark):
    # "aaaa" with dominant (a,a): greedy left-to-right gives [aa, aa],
    # never the overlapping [a, aa, a] or a triple-merge
    freqs = {"aaaa": 10, "ab": 1}
    merges, vocab = bpe_train_from_words(_freq_df(spark, freqs), k=1)
    m = merges.collect()[0]
    assert (m["lhs"], m["rhs"], m["merged"]) == ("a", "a", "aa")
    assert _vocab_syms(vocab)["aaaa"] == ["aa", "aa", "</w>"]


def test_bpe_merged_symbol_matches_only_as_whole(spark):
    # after (a,b)->ab, the 'a' inside "ab" must not re-match pair
    # (a, x): sentinel wrapping aligns matches to whole symbols
    freqs = {"aba": 10}
    merges, vocab = bpe_train_from_words(_freq_df(spark, freqs), k=2)
    got = [(m["lhs"], m["rhs"], m["merged"]) for m in merges.collect()]
    ref, ref_words = _ref_bpe(freqs, 2)
    assert got == [(a, b, ab) for _, a, b, ab, _ in ref]
    assert _vocab_syms(vocab)["aba"] == ref_words["aba"]


def test_bpe_tie_breaks_lexicographic(spark):
    # equal counts: smallest (lhs, rhs) pair wins deterministically
    freqs = {"xy": 3, "uv": 3}
    merges, _ = bpe_train_from_words(_freq_df(spark, freqs), k=1)
    m = merges.collect()[0]
    assert (m["lhs"], m["rhs"]) == ("u", "v")


def test_bpe_survives_pair_exhaustion(spark):
    # a vocab whose pairs run dry before k rounds: the empty best frame
    # must pass the vocab through unchanged (a cross join would
    # annihilate it), and train reports only the rounds that merged
    freqs = {"ab": 5}
    # round 1: (a,b) -> ab; round 2: (ab,</w>) -> ab</w>; round 3+: dry
    merges, vocab = bpe_train_from_words(_freq_df(spark, freqs), k=5)
    got = [(m["round"], m["merged"]) for m in merges.collect()]
    assert got == [(1, "ab"), (2, "ab</w>")]
    assert _vocab_syms(vocab)["ab"] == ["ab</w>"]


def test_bpe_word_filter_rejects_trailing_newline(spark):
    # Java's $ matches before a trailing \n (RE2/fullmatch do not);
    # WORD_RE must pin Spark to the oracle's strict acceptance
    freqs_df = spark.createDataFrame(
        [("ab\n", 100), ("cd", 1)], "w string, cnt bigint"
    )
    from deisa_ray_spark.functions.bpe import WORD_RE
    import pyspark.sql.functions as F

    kept = [r["w"] for r in freqs_df.filter(F.col("w").rlike(WORD_RE)).collect()]
    assert kept == ["cd"]


def test_bpe_fuzz_matches_reference(spark):
    """Property check: arbitrary word-frequency tables produce exactly
    the reference merge table and final symbol sequences. Random-ish
    but deterministic corpora (seeded), heavy on repeated substrings —
    the regime where greedy-merge bugs hide."""
    import random

    rng = random.Random(7)
    alphabet = "abc"
    for trial in range(6):
        n_words = rng.randint(1, 12)
        freqs = {}
        for _ in range(n_words):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 7))
            )
            freqs[w] = freqs.get(w, 0) + rng.randint(1, 9)
        k = rng.randint(1, 6)
        merges, vocab = bpe_train_from_words(_freq_df(spark, freqs), k=k)
        ref_merges, ref_words = _ref_bpe(freqs, k)
        got = sorted(tuple(m) for m in merges.collect())
        assert got == sorted(ref_merges), (trial, freqs, got, ref_merges)
        got_syms = _vocab_syms(vocab)
        for w, syms in ref_words.items():
            assert got_syms[w] == syms, (trial, w, freqs)


def test_free_local_checkpoint_releases_union_of_checkpoints(spark):
    from deisa_ray_spark.functions.dedup import free_local_checkpoint

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persistent()
    a = spark.range(10).localCheckpoint()
    b = spark.range(20).localCheckpoint()
    u = a.unionAll(b)
    assert n_persistent() == base + 2
    free_local_checkpoint(u)  # Union root: must walk to the leaves
    assert n_persistent() == base


def test_bpe_cache_eviction_keeps_returned_frames_usable(spark):
    """Eviction on a new sf_dir key must only drop the cache's own
    reference — frames already handed to callers stay collectable (a
    free_local_checkpoint there would destroy them irrecoverably)."""
    from deisa_ray_spark.functions import bpe

    from .conftest import SF_DIR

    other = (
        "/root/testdata/sf0.01"
        if SF_DIR.rstrip("/").endswith("0.001")
        else "/root/testdata/sf0.001"
    )
    merges_a, vocab_a = bpe._bpe_trained(spark, SF_DIR)
    n_merges, n_vocab = merges_a.count(), vocab_a.count()
    bpe._bpe_trained(spark, other)  # evicts the SF_DIR entry
    assert merges_a.count() == n_merges
    assert vocab_a.count() == n_vocab


def test_ivf_quantizer_fit_once_per_session_and_sf(spark):
    """The fitted coarse quantizer is a session-cached model artifact:
    repeated constructions reuse the same frames instead of re-running
    the eager k-means fit."""
    from deisa_ray_spark.functions import similarity

    from .conftest import SF_DIR

    a = similarity._ivf_cells(spark, SF_DIR)
    b = similarity._ivf_cells(spark, SF_DIR)
    assert a[0] is b[0] and a[1] is b[1]
