"""Unigram-LM semantics: the Spark hard-EM trainer (substring seeding,
Viterbi forward/backtrack, usage-ranked pruning, Laplace ln-weight
re-estimation) and the Viterbi encoder must equal a pure-Python
reference, including the fixed-point ln rounding, the (score DESC,
n_pieces ASC, backpointer ASC) tie-break, and the over-length UNK
collapse."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from deisa_ray_spark.functions.unigram import (
    UNI_KEEP_DEN,
    UNI_KEEP_NUM,
    UNI_MAX_PIECE,
    UNI_MAX_WORD,
    UNI_ROUNDS,
    UNI_SCALE,
    UNI_SEED,
    uni_encode_words,
    uni_train_from_words,
)


def _ref_ln_weights(pieces: dict[str, int]) -> dict[str, int]:
    tot, n = sum(pieces.values()), len(pieces)
    return {
        p: int(round(math.log((u + 1) * 1.0 / (tot + n)) * UNI_SCALE))
        for p, u in pieces.items()
    }


def _ref_viterbi(word: str, w_fp: dict[str, int]):
    """Forward DP with the exact tie-break; returns (score, np, pieces)."""
    best: list[tuple[int, int, int] | None] = [(0, 0, 0)] + [None] * len(word)
    for j in range(1, len(word) + 1):
        cands = []
        for i in range(max(0, j - UNI_MAX_PIECE), j):
            if best[i] is None:
                continue
            piece = word[i:j]
            if piece in w_fp:
                cands.append((best[i][0] + w_fp[piece], best[i][1] + 1, i))
        if cands:
            best[j] = min(cands, key=lambda c: (-c[0], c[1], c[2]))
    assert best[len(word)] is not None, "single chars keep every word segmentable"
    pieces = []
    cur = len(word)
    while cur > 0:
        bp = best[cur][2]
        pieces.append(word[bp:cur])
        cur = bp
    return best[len(word)][0], best[len(word)][1], pieces


def _ref_uni_train(word_freq: dict[str, int]):
    """Reference trainer; returns the final {piece: (usage, w_fp)}."""
    dp_words = {w: c for w, c in word_freq.items() if len(w) <= UNI_MAX_WORD}
    sub_cnt: dict[str, int] = {}
    for w, c in dp_words.items():
        for i in range(len(w)):
            for L in range(1, min(UNI_MAX_PIECE, len(w) - i) + 1):
                p = w[i : i + L]
                sub_cnt[p] = sub_cnt.get(p, 0) + c
    multis = sorted(
        [(p, c) for p, c in sub_cnt.items() if len(p) > 1],
        key=lambda x: (-x[1], x[0]),
    )[:UNI_SEED]
    vocab = {p: c for p, c in sub_cnt.items() if len(p) == 1}
    vocab.update(dict(multis))
    w_fp = _ref_ln_weights(vocab)
    for _ in range(UNI_ROUNDS):
        usage: dict[str, int] = {p: 0 for p in vocab}
        for w, c in dp_words.items():
            for piece in _ref_viterbi(w, w_fp)[2]:
                usage[piece] += c
        multis = sorted(
            [(p, u) for p, u in usage.items() if len(p) > 1],
            key=lambda x: (-x[1], x[0]),
        )
        nm = len(multis)
        kept = dict(multis[: (nm * UNI_KEEP_NUM) // UNI_KEEP_DEN])
        vocab = {p: u for p, u in usage.items() if len(p) == 1}
        vocab.update(kept)
        w_fp = _ref_ln_weights(vocab)
    return {p: (vocab[p], w_fp[p]) for p in vocab}


def _wf_df(spark, word_freq: dict[str, int]):
    return spark.createDataFrame(
        [(w, c) for w, c in word_freq.items()], "w string, cnt long"
    )


_WORDS = [
    "data", "database", "dataset", "stream", "streaming", "spark",
    "sparkly", "shuffle", "partition", "part", "parts", "join",
    "joining", "scan", "scans", "columnar", "column", "verylongwordhere",
]


def _rand_wf(rng: random.Random) -> dict[str, int]:
    picks = rng.sample(_WORDS, rng.randint(5, len(_WORDS)))
    return {w: rng.randint(1, 50) for w in picks}


def test_train_matches_reference(spark):
    rng = random.Random(91)
    for _ in range(3):
        wf = _rand_wf(rng)
        ref = _ref_uni_train(wf)
        model, _dp, _ml = uni_train_from_words(_wf_df(spark, wf))
        got = {
            r["piece"]: (r["usage"], r["w_fp"]) for r in model.collect()
        }
        assert got == ref


def test_encode_matches_reference(spark):
    rng = random.Random(17)
    wf = _rand_wf(rng)
    wf["verylongwordhere"] = 3  # force the over-length UNK path
    ref_model = _ref_uni_train(wf)
    w_fp = {p: fp for p, (_u, fp) in ref_model.items()}
    df = _wf_df(spark, wf)
    model, _dp, ml = uni_train_from_words(df)
    enc = {r["w"]: (r["n_pieces"], r["unk"], r["score_fp"]) for r in uni_encode_words(df, model, ml).collect()}
    assert set(enc) == set(wf)
    for w in wf:
        if len(w) > UNI_MAX_WORD:
            assert enc[w] == (1, 1, 0)
        else:
            score, np_, _pieces = _ref_viterbi(w, w_fp)
            assert enc[w] == (np_, 0, score), w


def test_singles_survive_pruning(spark):
    wf = {"aaab": 9, "ab": 4, "b": 2}
    model, _dp, _ml = uni_train_from_words(_wf_df(spark, wf))
    singles = {r["piece"] for r in model.collect() if r["is_single"]}
    assert {"a", "b"} <= singles
