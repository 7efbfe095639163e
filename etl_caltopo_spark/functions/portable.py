"""Engine-portable hash family shared by the graded sketch/LSH ids.

The family is deliberately simple enough that a DuckDB oracle can
replay it with list_transform/list_sum SQL (no engine hash function on
either side):

- string fingerprint: position-weighted code-point sum mod the
  Mersenne prime 2³¹−1 (:func:`portable_string_hash` /
  :func:`portable_string_hash_sql`);
- MinHash permutations: fixed-literal universal hashes
  (aᵢ·x + bᵢ) mod p over the same prime (``MH_A`` / ``MH_B``).

Moved out of queries/extended10.py in round 5 so llm/dedup.py can
band on the same family without an import cycle (VERDICT r4 #2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2³¹ − 1 — the modulus of the whole family
MH_P = 2147483647

#: fixed-literal MinHash permutation coefficients: h_i(x) = (a_i·x + b_i) mod p
MH_A = (131, 1031, 8101, 65537, 524287, 100003, 999983, 4493)
MH_B = (7, 911, 5021, 30011, 70001, 110017, 2029, 65111)


def portable_string_hash_col(col: Column) -> Column:
    """Column-expression form of :func:`portable_string_hash` — usable
    inside higher-order-function lambdas (transform/aggregate) where
    only a Column, not a name, is in scope.

    LINEAR per-char walk (wide-values probe r14): the original form
    indexed the string positionally (``col.substr(jj, 1)`` /
    ``var[j]``), and positional character access is O(position) on
    UTF-8 in BOTH engines — O(n²) per token, which turns one 200KB
    unbroken token (a base64 blob, a DNA read, minified JS) into a
    multi-minute hang.  ``split('')`` materializes the code points
    once (O(n)) and the two-arg transform lambda supplies the 1-based
    position, so the weighted sum is value-identical for EVERY string
    (same code points, same weights — verified char-semantics parity:
    astral chars stay whole code points, no trailing empties on
    either engine) at O(n).  HANDOFF knowledge #37."""
    code_weighted = F.aggregate(
        F.transform(
            F.split(col, ""),
            lambda ch, i0: F.ascii(ch).cast("long")
            * (((i0.cast("long") + 1) * 2654435761 + 40503) % 65536),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    # hash('') is DEFINED as 0: Spark's sequence(1, 0) yields the
    # descending [1, 0] (summing two zero-ascii terms — accidentally
    # 0) while DuckDB's range(1, 1) is [] and list_sum([]) is NULL;
    # both sides pin the empty case explicitly so an empty shingle/
    # token can never split the engines (code-review r6)
    return F.when(F.length(col) == 0, F.lit(0)).otherwise(
        code_weighted % MH_P
    )


def portable_string_hash(col_name: str) -> Column:
    """Engine-portable string fingerprint: position-weighted code-point
    sum mod 2³¹−1.  The DuckDB mirror is
    :func:`portable_string_hash_sql` with the same weights and
    modulus."""
    return portable_string_hash_col(F.col(col_name))


def portable_string_hash_sql(var: str) -> str:
    """The DuckDB expression computing :func:`portable_string_hash` of
    the string-valued SQL expression ``var`` (a column name inside the
    caller's CTE).

    Mirrors the LINEAR split-based walk (r14): ``var[j]`` positional
    indexing is O(j) on UTF-8 in DuckDB too, so the old range-indexed
    form was equally quadratic; ``string_split(var, '')`` + the
    two-parameter lambda (element, 1-based index) computes the same
    weighted sum in O(n).  string_split('', '') is [''] and
    ascii('') is 0, so the empty case still sums to 0 before the
    explicit pin."""
    return (
        f"CAST(coalesce(list_sum(list_transform(string_split({var}, ''), "
        f"(c, j) -> ascii(c) "
        f"* (((j * 2654435761) + 40503) % 65536))), 0) % {MH_P} AS BIGINT)"
    )


def minhash_signature_cols(x_col: str = "x") -> list[Column]:
    """The 8 MinHash aggregate columns ``h0..h7`` over fingerprint
    column ``x_col`` (call inside a groupBy().agg())."""
    return [
        F.min((F.lit(a) * F.col(x_col) + F.lit(b)) % MH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(zip(MH_A, MH_B))
    ]


def minhash_signature_sql(x_col: str = "x") -> str:
    """The matching DuckDB aggregate list for ``h0..h7``."""
    return ", ".join(
        f"min(({a} * {x_col} + {b}) % {MH_P}) AS h{i}"
        for i, (a, b) in enumerate(zip(MH_A, MH_B))
    )
