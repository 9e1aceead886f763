"""Focused equivalence test for the r9 optimization that moved
q_unigram_tokenizer_estep's Viterbi recurrence from 12 distributed
rounds into a per-word higher-order-function DP.

A pure-Python reference implements the SAME published recurrence
(min-cost segmentation over the 200-piece + single-char vocabulary,
cost = -ln(count/total) in rounded micro-units, ties broken by the
lexicographically smaller lpad(cost,12,'0')||path encoding) end to end
from the raw fixture texts — fully independent of both the Spark plan
and the DuckDB oracle — and must reproduce the query's top-30 rows
exactly.
"""

from __future__ import annotations

import math

MAX_LEN, MAX_PIECE, TOP_V = 12, 4, 200


def _reference_estep(texts: list[str]):
    # kept: distinct words (length 1..12) with counts
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if 1 <= len(w) <= MAX_LEN:
                wc[w] = wc.get(w, 0) + 1
    # pieces: substrings length 1..4, frequency-weighted
    pcnt: dict[str, int] = {}
    for w, c in wc.items():
        for p in range(1, MAX_LEN + 1):
            for l in range(1, MAX_PIECE + 1):
                if p + l - 1 <= len(w):
                    piece = w[p - 1 : p - 1 + l]
                    pcnt[piece] = pcnt.get(piece, 0) + c
    top = sorted(pcnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_V]
    vocab = {p for p, _ in top} | {p for p in pcnt if len(p) == 1}
    tot = sum(cnt for p, cnt in pcnt.items() if p in vocab)
    sq = {
        p: int(round(-math.log(pcnt[p] / tot) * 1e6))
        for p in vocab
    }
    # per-word Viterbi carrying the sortable string encoding
    seg_count: dict[str, int] = {}
    for w, c in wc.items():
        best = ["000000000000"]
        for i in range(1, len(w) + 1):
            cands = []
            for L in range(1, min(MAX_PIECE, i) + 1):
                piece = w[i - L : i]
                if piece in sq:
                    prev = best[i - L]
                    cost = int(prev[:12]) + sq[piece]
                    cands.append(f"{cost:012d}" + prev[12:] + piece + " ")
            best.append(min(cands))
        for piece in best[len(w)][12:].strip().split(" "):
            seg_count[piece] = seg_count.get(piece, 0) + c
    ranked = sorted(seg_count.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    return [(p, n, sq[p]) for p, n in ranked]


def test_unigram_estep_matches_pure_python_reference(spark, sf_smoke):
    from healthcare_etl_spark.plans.registry import get_registry
    from healthcare_etl_spark.sources import load_table

    texts = [
        r["text"]
        for r in load_table(spark, sf_smoke, "documents").select("text").collect()
    ]
    expected = _reference_estep(texts)

    rows = get_registry()["q_unigram_tokenizer_estep"].fn(spark, sf_smoke).collect()
    got = [(r["piece"], r["seg_count"], r["piece_cost_micro"]) for r in rows]
    assert got == expected
