"""Distributed BPE (byte-pair-encoding) vocabulary training ([ext]).

The tokenizer-training step of an LLM data pipeline (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL'16):
start from characters, repeatedly merge the most frequent adjacent
symbol pair.  The reference engine has no tokenizer surface; this is
the Spark-first formulation:

* The corpus collapses to a **word-frequency table** first (classic BPE
  trick) — all further work is over the vocabulary, whose size is
  bounded by the language, not the corpus.  At 100 TB the one
  corpus-sized job is that initial word count; every merge round then
  touches |vocab| rows.
* Per round: adjacent pairs explode map-side → one (left, right)
  grouped sum → a **single-row** argmax collect (deterministic
  tiebreak: freq DESC, left ASC, right ASC) → a native ``aggregate``
  fold rewrites each word's symbol array with the merged pair (no
  Python UDF — the fold is the streaming one-pass merge).
* Each round ends in ``localCheckpoint``: the merge fold nests one
  level of expression tree per round, and without lineage truncation
  plan analysis goes exponential (same mechanics as the iterative
  graph operators).

Verification: non-SQL-expressible (iterative argmax) — pinned in
pytest against a pure-Python reference BPE on the same corpus
(``tests/test_units.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """One-pass left-to-right merge of adjacent (left, right) symbol
    occurrences in an array<string> — the BPE rewrite step as a native
    ``aggregate`` fold.

    State is ``(out, prev)``: ``prev`` holds the last unflushed symbol;
    seeing ``right`` while ``prev == left`` flushes the merged token.
    Left-to-right order matches the sequential reference semantics
    (``aaa`` with merge (a,a) → ``[aa, a]``).
    """
    merged = left + right
    init = F.named_struct(
        F.lit("out"), F.array().cast("array<string>"),
        F.lit("prev"), F.lit(None).cast("string"),
    )

    def step(acc: Column, s: Column) -> Column:
        flush_merge = F.named_struct(
            F.lit("out"), F.concat(acc["out"], F.array(F.lit(merged))),
            F.lit("prev"), F.lit(None).cast("string"),
        )
        carry = F.named_struct(
            F.lit("out"),
            F.when(acc["prev"].isNull(), acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["prev"]))
            ),
            F.lit("prev"), s,
        )
        return F.when(
            acc["prev"].isNotNull() & (acc["prev"] == left) & (s == right),
            flush_merge,
        ).otherwise(carry)

    def finish(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(syms, init, step, finish)


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for len<2)."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.named_struct(
                F.lit("l"), F.element_at(syms, i),
                F.lit("r"), F.element_at(syms, i + 1),
            ),
        )
    )


def bpe_train(
    word_counts: DataFrame,
    word_col: str,
    count_col: str,
    num_merges: int,
    min_freq: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    Returns ``[(round, left, right, freq), ...]`` in merge order —
    the merge table IS the tokenizer (apply with
    :func:`bpe_apply` / ``_merge_pair`` in sequence).  Stops early when
    the best pair's frequency drops below ``min_freq``.

    Each round costs one |vocab|-sized pair aggregation and ONE row to
    the driver (the argmax); the corpus itself is never touched after
    the word count that produced ``word_counts``.
    """
    seqs = word_counts.select(
        F.col(count_col).cast("long").alias("__n"),
        F.split(F.col(word_col), "").alias("__syms"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(num_merges):
        best = (
            seqs.select("__n", F.explode(_adjacent_pairs(F.col("__syms"))).alias("__p"))
            .groupBy("__p.l", "__p.r")
            .agg(F.sum("__n").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["freq"] < min_freq:
            break
        l, rt, freq = best[0]["l"], best[0]["r"], int(best[0]["freq"])
        merges.append((r, l, rt, freq))
        seqs = seqs.select(
            "__n", _merge_pair(F.col("__syms"), l, rt).alias("__syms")
        ).localCheckpoint(eager=True)
    return merges


def bpe_apply(tokens_arr: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply a learned merge table to an array<string> of characters —
    the (bounded-depth) native-expression tokenizer.  Practical for
    small merge tables; ship large vocabularies to a broadcast
    longest-match table instead."""
    out = tokens_arr
    for _, l, r, _ in merges:
        out = _merge_pair(out, l, r)
    return out
