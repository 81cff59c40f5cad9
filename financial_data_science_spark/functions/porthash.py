"""Portable (engine-agnostic) hash primitives, recomputable in ANSI SQL.

The production dedup/similarity path hashes with ``xxhash64`` — one fast
JVM hash, the right choice at 100 TB.  But xxhash64 exists in no other
engine, so any query built on it can only get a rows-only correctness
check.  This module provides a *portable* hash family built purely from
integer arithmetic (`* + % >> & xor`) that Spark and DuckDB evaluate to
identical values, so the driver's value-hash oracle can recompute an
entire MinHash/SimHash/hyperplane-LSH pipeline in SQL
(CORRECTNESS gate, VERDICT r2 "oracle the rows-only queries").

Every function here has a Spark ``Column`` builder and a twin ``sql_*``
DuckDB-text builder; keep them in lockstep — the tests assert equality
through both engines.

Design: 31-bit polynomial character hash + multiplicative finalizer.
All intermediates stay below 2^63 (ANSI-mode overflow-safe in Spark,
BIGINT-safe in DuckDB): h < 2^31, h*FIN < 2^31 * 2.7e9 < 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = (1 << 31) - 1          # Mersenne prime 2^31-1
FIN1 = 2654435761            # Knuth multiplicative constants
FIN2 = 2246822519
LCG_A = 1013904223
LCG_B = 1664525


# ------------------------------------------------------------ Spark side

def charhash(token: Column, base: int = 131) -> Column:
    """Polynomial hash of a string's code points, mod 2^31-1.

    ``h = (h*base + codepoint) % MOD`` folded left-to-right.  The token
    should be a cheap reference (an exploded column or lambda variable) —
    it is re-evaluated once per character.
    """
    chars = F.transform(
        F.sequence(F.lit(1), F.length(token)),
        lambda i: F.ascii(token.substr(i, F.lit(1))),
    )
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(base) + c) % F.lit(MOD),
    )


def tokhash31(token: Column, base: int = 131) -> Column:
    """Finalized 31-bit token hash: multiplicative spread of the raw
    polynomial (short tokens otherwise hash to tiny values, biasing
    SimHash sign votes toward 0-bits)."""
    return (charhash(token, base) * F.lit(FIN1)) % F.lit(MOD)


def gram_hashes31(toks: Column, k: int, base: int = 131) -> Column:
    """Distinct finalized 31-bit hashes of every k-token gram of ``toks``
    — bit-identical to ``array_distinct(transform(word_shingles,
    tokhash31))`` but with each character folded ONCE.

    ``tokhash31`` over space-joined gram strings re-folds every character
    of every token once per gram it appears in (~k x the text for
    k-grams) inside an interpreted higher-order lambda — the measured
    wall of the portable decontamination pass (r8 verdict item 2).  A
    polynomial hash composes: with raw = charhash(t) and pw = base^len(t)
    mod M, the hash of ``a + " " + b`` is
    ``(((raw_a*base + 32) % M) * pw_b + raw_b) % M`` (32 = codepoint of
    the separator space).  So: ONE struct fold per token yields
    (raw, pw); each k-gram is then k-1 multiply-adds over k slices of
    that parts array (the zip_with-of-shifted-slices shape from
    word_shingles, which references the parts once per offset — never
    per gram).  All intermediates stay < 2^63: the inner term is
    reduced mod M (< 2^31) before the < 2^31 ``pw`` multiply.

    Distinctness matches the old path: array_distinct keeps the FIRST
    occurrence of each hash value, and string-distinct upstream (the
    old path) never reorders hash first-occurrences.

    Every multiply-referenced intermediate (the token array, the parts
    array) is LET-BOUND via :func:`let_` — higher-order functions are
    CodegenFallback, and interpreted evaluation has no common-
    subexpression elimination, so a bare ``parts`` expression would be
    re-evaluated once per slice reference (measured SLOWER than the
    per-gram re-fold it replaces).
    """

    def _build(toks: Column) -> Column:
        return let_(
            _token_parts(toks, base),
            lambda p: F.array_distinct(_gram_hash_chain(p, toks, k, base)),
        )

    return let_(toks, _build)


def gram_structs31(toks: Column, k: int, base: int = 131) -> Column:
    """``array<struct<s,h>>`` of DISTINCT k-grams: the space-joined gram
    STRING paired with its composed finalized 31-bit hash.

    For consumers that need the string key too (the max_df stop-shingle
    census joins on it) — same one-char-fold-per-token economics as
    :func:`gram_hashes31`, same distinct-order contract (array_distinct
    over (s, h) structs keeps first string occurrence, since h is a
    function of s)."""

    def _strings(toks: Column, m: Column) -> Column:
        g = F.slice(toks, 1, m)
        for j in range(1, k):
            g = F.zip_with(
                g, F.slice(toks, j + 1, m),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return g

    def _build(toks: Column) -> Column:
        def _zip(parts: Column) -> Column:
            m = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
            return F.array_distinct(
                F.zip_with(
                    _strings(toks, m),
                    _gram_hash_chain(parts, toks, k, base),
                    lambda s, h: F.struct(s.alias("s"), h.alias("h")),
                )
            )

        return let_(_token_parts(toks, base), _zip)

    return let_(toks, _build)


def _token_parts(toks: Column, base: int) -> Column:
    """Per-token (raw polynomial, base^len mod M) structs — one char
    fold per token, the composition inputs for the gram builders."""
    return F.transform(
        toks,
        lambda t: F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.length(t)),
                lambda i: F.ascii(t.substr(i, F.lit(1))),
            ),
            F.struct(
                F.lit(0).cast("long").alias("raw"),
                F.lit(1).cast("long").alias("pw"),
            ),
            lambda acc, c: F.struct(
                ((acc["raw"] * F.lit(base) + c) % F.lit(MOD)).alias("raw"),
                ((acc["pw"] * F.lit(base)) % F.lit(MOD)).alias("pw"),
            ),
        ),
    )


def _gram_hash_chain(parts: Column, toks: Column, k: int, base: int) -> Column:
    """Non-distinct finalized gram hashes from a let-bound parts array."""
    m = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    g = F.transform(F.slice(parts, 1, m), lambda p: p["raw"])
    for j in range(1, k):
        g = F.zip_with(
            g,
            F.slice(parts, j + 1, m),
            lambda h, p: ((h * F.lit(base) + F.lit(32)) % F.lit(MOD)
                          * p["pw"] + p["raw"]) % F.lit(MOD),
        )
    return F.transform(g, lambda h: (h * F.lit(FIN1)) % F.lit(MOD))


def let_(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and bind it as a lambda variable inside
    ``body`` — the single-element-transform let-binding.

    Interpreted expression trees (everything containing a higher-order
    function is CodegenFallback) re-evaluate a subexpression at every
    reference; projecting it as a column first doesn't help because
    CollapseProject inlines single-use-site aliases back into their
    references.  ``element_at(transform(array(v), x -> body(x)), 1)``
    forces one evaluation of ``v`` with O(1) references to ``x``.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def tokhash62(token: Column) -> Column:
    """62-bit token hash: two independent 31-bit polynomials packed as
    ``hi*2^31 + lo`` — the portable stand-in for xxhash64 where a wide
    bit pattern is needed (SimHash votes).

    Both polynomials fold in ONE pass over the char array (struct
    accumulator, let-bound result) — bit-identical to two separate
    ``tokhash31`` folds at half the char work, and the chars array
    (sequence + per-char substr) is built once instead of twice."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(token)),
        lambda i: F.ascii(token.substr(i, F.lit(1))),
    )
    both = F.aggregate(
        chars,
        F.struct(
            F.lit(0).cast("long").alias("r131"),
            F.lit(0).cast("long").alias("r137"),
        ),
        lambda acc, c: F.struct(
            ((acc["r131"] * F.lit(131) + c) % F.lit(MOD)).alias("r131"),
            ((acc["r137"] * F.lit(137) + c) % F.lit(MOD)).alias("r137"),
        ),
    )
    return let_(
        both,
        lambda b: ((b["r131"] * F.lit(FIN1)) % F.lit(MOD)) * F.lit(1 << 31)
        + ((b["r137"] * F.lit(FIN1)) % F.lit(MOD)),
    )


def keyhash(key: Column, salt: int = 0) -> Column:
    """Portable integer-key hash in [0, MOD): multiplicative spread +
    xor-shift over a long key.  The deterministic-sampling primitive —
    split/sample decisions become pure per-row arithmetic (no shuffle, no
    RNG state), reproducible across engines and reruns."""
    h = ((key.cast("long") + 1 + F.lit(salt * LCG_A)) % F.lit(MOD)) * F.lit(FIN1) % F.lit(MOD)
    h = h.bitwiseXOR(F.shiftright(h, 15))
    return (h * F.lit(FIN2)) % F.lit(MOD)


def plane_sign(p: int, i: Column) -> Column:
    """Deterministic ±1 sign of component ``i`` of pseudo-hyperplane ``p``
    from an LCG + xor-shift mix — balanced per plane, no string hashing."""
    h = (F.lit((p + 1) * LCG_A) + (i + 1) * F.lit(LCG_B)) % F.lit(1 << 31)
    h = (h * F.lit(FIN1)) % F.lit(MOD)
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = (h * F.lit(FIN2)) % F.lit(MOD)
    bit = F.shiftright(h, 13).bitwiseAND(F.lit(1))
    return F.when(bit == 1, 1.0).otherwise(-1.0)


def plane_sign_col(p: Column, i: Column) -> Column:
    """:func:`plane_sign` with a RUNTIME plane index (both args Columns)
    — identical arithmetic, used by the one-pass multi-plane fold in
    similarity.hyperplane_bucket (the int-p form stays for oracle-SQL
    twinning and per-plane call sites).  Casts guard ANSI int overflow
    on the transform-index argument."""
    h = ((p.cast("long") + 1) * F.lit(LCG_A) + (i.cast("long") + 1) * F.lit(LCG_B)) % F.lit(
        1 << 31
    )
    h = (h * F.lit(FIN1)) % F.lit(MOD)
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = (h * F.lit(FIN2)) % F.lit(MOD)
    bit = F.shiftright(h, 13).bitwiseAND(F.lit(1))
    return F.when(bit == 1, 1.0).otherwise(-1.0)


# ----------------------------------------------------------- DuckDB side
# Twin SQL-text builders; `tok` / `i` etc. are SQL expressions (strings).

def sql_charhash(tok: str, base: int = 131) -> str:
    # lambda vars suffixed with the base so nested uses never shadow
    a, c, ch = f"a{base}", f"c{base}", f"ch{base}"
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({tok}, ''), {ch} -> ascii({ch})::BIGINT)), "
        f"({a}, {c}) -> ({a} * {base} + {c}) % {MOD})"
    )


def sql_tokhash31(tok: str, base: int = 131) -> str:
    return f"(({sql_charhash(tok, base)}) * {FIN1}) % {MOD}"


def sql_tokhash62(tok: str) -> str:
    return f"({sql_tokhash31(tok, 131)}) * {1 << 31} + ({sql_tokhash31(tok, 137)})"


def sql_keyhash(key: str, salt: int = 0) -> str:
    h0 = f"((({key})::BIGINT + 1 + {salt * LCG_A}) % {MOD}) * {FIN1} % {MOD}"
    h1 = f"xor(({h0}), ({h0}) >> 15)"
    return f"(({h1}) * {FIN2}) % {MOD}"


def sql_plane_sign(p: str, i: str) -> str:
    """±1.0 as SQL; ``p``/``i`` are 0-based integer SQL expressions."""
    h0 = f"((({p}) + 1)::BIGINT * {LCG_A} + (({i}) + 1)::BIGINT * {LCG_B}) % {1 << 31}"
    h1 = f"(({h0}) * {FIN1}) % {MOD}"
    h2 = f"xor(({h1}), ({h1}) >> 15)"
    h3 = f"(({h2}) * {FIN2}) % {MOD}"
    return f"(CASE WHEN (({h3}) >> 13) & 1 = 1 THEN 1.0 ELSE -1.0 END)"


#: DuckDB expression for Spark's tokens(): whitespace split, empties removed
SQL_TOKENS = (
    "list_filter(regexp_split_to_array(trim({text}), '\\s+'), w -> w != '')"
)
