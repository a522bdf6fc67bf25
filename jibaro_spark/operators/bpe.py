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
  tiebreak: freq DESC, left ASC, right ASC) → one boundary-anchored
  ``regexp_replace`` rewrites each word's segmentation (no Python UDF).
* Each round ends in ``localCheckpoint``: the merge rewrite nests one
  level of expression tree per round, and without lineage truncation
  plan analysis goes exponential (same mechanics as the iterative
  graph operators).

VALUE-SIZE contract (bigval fuzz class, r11): the previous merge step
was an ``aggregate`` fold whose accumulator did an immutable
array-concat per element — O(len²) copying per word per round, a
measured wall cliff on a 100k-char unbroken token (the realistic
corpus state a whitespace tokenizer produces from minified/binary-ish
text).  Words are now carried as ``U+FFFF``-separated segmentation
STRINGS and each merge round is a single ``regexp_replace`` whose
leftmost-non-overlapping greedy semantics are exactly the sequential
BPE merge (``aaa`` with merge (a,a) → ``aa·a``) — linear per word per
round.  Fence: ``U+FFFF`` is a Unicode non-character that cannot
appear in well-formed text; words containing it would corrupt their
own segmentation boundaries, so callers feeding adversarial bytes must
pre-filter (the operator never mixes segmentations ACROSS words, so
the blast radius of a violation is that word alone).

Verification: non-SQL-expressible (iterative argmax) — pinned in
pytest against a pure-Python reference BPE on the same corpus
(``tests/test_units.py``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Segmentation separator: a Unicode non-character (see module fence).
_SEP = "￿"


def _merge_pattern(left: str, right: str) -> str:
    """Java-regex pattern matching the ``left·SEP·right`` token pair at
    segment boundaries only (zero-width anchors, so adjacent
    candidates resolve exactly like the sequential left-to-right
    greedy merge)."""
    return (
        f"(?:^|(?<={_SEP}))"
        f"{re.escape(left)}{_SEP}{re.escape(right)}"
        f"(?={_SEP}|$)"
    )


def _merge_replacement(left: str, right: str) -> str:
    """Replacement string for the merged token (escape the two chars
    Spark's regexp_replace treats specially in replacements)."""
    merged = left + right
    return merged.replace("\\", "\\\\").replace("$", "\\$")


def _merge_pair_str(seg: Column, left: str, right: str) -> Column:
    """One merge round over a SEP-joined segmentation string — linear
    in the word length (regex scan, no accumulation copying).
    Leftmost non-overlapping greedy replacement == the sequential BPE
    merge: after a match the scan resumes past the consumed text, so
    ``a·a·a`` under (a,a) becomes ``aa·a``."""
    return F.regexp_replace(
        seg, F.lit(_merge_pattern(left, right)), F.lit(_merge_replacement(left, right))
    )


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """One-pass left-to-right merge of adjacent (left, right) symbol
    occurrences in an array<string> — array façade over the linear
    string form (kept for :func:`bpe_apply` and external callers).
    """
    seg = F.array_join(syms, _SEP)
    return F.when(F.size(syms) == 0, syms).otherwise(
        F.split(_merge_pair_str(seg, left, right), _SEP)
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for len<2).

    ``zip_with`` over two ``slice``s, NOT ``transform(sequence, i ->
    element_at(syms, i))``: when ``syms`` is an un-materialized
    expression (e.g. a ``split``), every ``element_at`` inside a
    lambda re-evaluates it — O(len) per element, O(len²) per word, a
    measured hang on the bigval class's 100k-char tokens (r11).  The
    slice form evaluates ``syms`` a bounded number of times and the
    lambda only touches its own O(1) element arguments."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.named_struct(F.lit("l"), a, F.lit("r"), b),
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
    the word count that produced ``word_counts``.  Words are carried
    as segmentation strings (module note) so each round's rewrite is
    linear even on degenerate 100k-char single-token words.
    """
    seqs = word_counts.select(
        F.col(count_col).cast("long").alias("__n"),
        F.array_join(F.split(F.col(word_col), ""), _SEP).alias("__w"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(num_merges):
        best = (
            seqs.select(
                "__n",
                F.explode(_adjacent_pairs(F.split(F.col("__w"), _SEP))).alias("__p"),
            )
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
            "__n", _merge_pair_str(F.col("__w"), l, rt).alias("__w")
        ).localCheckpoint(eager=True)
    return merges


def bpe_apply(tokens_arr: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply a learned merge table to an array<string> of characters —
    the (bounded-depth) native-expression tokenizer.  One string
    conversion, one linear regex pass per merge, one split back.
    Practical for small merge tables; ship large vocabularies to a
    broadcast longest-match table instead."""
    seg = F.array_join(tokens_arr, _SEP)
    for _, l, r, _ in merges:
        seg = _merge_pair_str(seg, l, r)
    return F.when(F.size(tokens_arr) == 0, tokens_arr).otherwise(
        F.split(seg, _SEP)
    )
