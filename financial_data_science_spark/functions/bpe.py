"""Distributed BPE (byte-pair-encoding) vocabulary training.

The tokenizer-training workload of an LLM data pipeline, Spark-first:
the corpus collapses to a (word, freq) table (groupBy — unique words are
orders of magnitude fewer than tokens), each merge iteration is one
pair-count aggregation (explode adjacent symbol pairs, sum word freqs)
plus a map-side merge rewrite, and ONLY the single winning pair row ever
reaches the driver per iteration (the same bounded-collect discipline as
the IVF centroid loop).  No RNG, integer counts, lexicographic
tie-breaks — a SQL oracle replays training decision-for-decision.

Representation: a word is its symbols joined by single spaces with a
trailing end-of-word marker (``h e l l o </w>``).  A merge of pair
(a, b) is ``replace(' '||s||' ', ' a b ', ' ab ')`` applied
``passes`` times: one replace pass is left-to-right non-overlapping
(identical in Spark's ``replace`` and DuckDB's), so adjacent
occurrences sharing a boundary space need another pass — ``passes=4``
converges for same-pair runs up to 2^4 symbols, and BOTH engines apply
the identical bounded-pass operator, so results match even in the
(corpus-irrelevant) ultra-run corner.

Reference scope note: the reference repo stops at token *counting*
(unstructured text recipes); BPE *training* is part of the
training-data-pipeline surface this engine adds (SURVEY §2 extension),
mirroring the classic Sennrich et al. (2016) greedy merge procedure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def words_to_symbols(word: str | Column) -> Column:
    """``'hello'`` -> ``'h e l l o </w>'``: char symbols + end-of-word
    marker, space-joined (the BPE working representation)."""
    w = F.col(word) if isinstance(word, str) else word
    chars = F.filter(F.split(w, "(?!^)"), lambda t: t != "")
    return F.concat(F.array_join(chars, " "), F.lit(" " + EOW))


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over whitespace-split tokens — the corpus collapse
    that makes BPE training cheap: every later stage is per unique word."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = F.filter(F.split(F.trim(c), "\\s+"), lambda t: t != "")
    # fan the corpus scan (r15): tokenize-explode + the map-side partial
    # count otherwise serialize on a single-row-group scan task; integer
    # counts are order-independent, so the word histogram is identical.
    # No-op at scale (operators/layout.py).
    from financial_data_science_spark.operators.layout import fan_out_scan

    return (
        fan_out_scan(docs).select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word freq: one explode +
    one hash aggregate (map-side combinable), the whole per-iteration
    shuffle."""
    arr = F.split(F.col("s"), " ")
    n = F.size(arr)
    pairs = F.expr(
        "transform(sequence(1, size(split(s, ' ')) - 1), "
        "i -> struct(split(s, ' ')[i - 1] AS a, split(s, ' ')[i] AS b))"
    )
    return (
        syms.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_expr(s: Column, a: str, b: str, passes: int) -> Column:
    """Bounded-pass greedy merge of pair (a, b) inside the padded symbol
    string — pure JVM string ops, map-side."""
    e = F.concat(F.lit(" "), s, F.lit(" "))
    pat, rep = f" {a} {b} ", f" {a}{b} "
    for _ in range(passes):
        e = F.replace(e, F.lit(pat), F.lit(rep))
    return F.trim(e)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    passes: int = 4,
    lowercase: bool = True,
    min_freq: int = 1,
) -> tuple[list[dict], DataFrame]:
    """Train ``num_merges`` BPE merges over the corpus.

    Returns ``(merges, symbols)``: merges as a list of dicts
    ``{it, left, right, merged, cnt}`` in training order, and the final
    (word-symbols, freq) frame.  Per iteration: one pair-count aggregate,
    ONE collected row (the argmax pair, ties cnt desc / a asc / b asc),
    one map-side rewrite; lineage is truncated with localCheckpoint per
    sweep (the pagerank discipline) so plans stay flat.

    ``min_freq`` is the standard frequency-threshold stopping rule
    (Sennrich et al. 2016 use 2 in practice): training stops early when
    the best remaining pair occurs fewer than ``min_freq`` times —
    merges below that threshold memorize corpus noise, not structure."""
    wf = word_frequencies(docs, text_col, lowercase)
    syms = wf.select(
        words_to_symbols("word").alias("s"), "freq"
    ).localCheckpoint(eager=True)
    merges: list[dict] = []
    for it in range(1, num_merges + 1):
        # deterministic argmax without a sort: min of (-cnt, a, b) is
        # cnt desc with (a, b) lexicographic tie-break — one two-phase
        # hash aggregate, one row to the driver
        top = (
            _pair_counts(syms)
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("negcnt"),
                        F.col("a"),
                        F.col("b"),
                    )
                ).alias("m")
            )
            .collect()
        )
        if not top or top[0]["m"] is None:
            break
        m = top[0]["m"]
        a, b, cnt = m["a"], m["b"], int(-m["negcnt"])
        if cnt < min_freq:
            break
        merges.append(
            {"it": it, "left": a, "right": b, "merged": a + b, "cnt": cnt}
        )
        syms = syms.select(
            _merge_expr(F.col("s"), a, b, passes).alias("s"), "freq"
        ).localCheckpoint(eager=True)
    return merges, syms


def bpe_train_batched(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 64,
    batch: int = 8,
    passes: int = 4,
    lowercase: bool = True,
    min_freq: int = 1,
) -> tuple[list[dict], DataFrame]:
    """BPE training with BATCHED merges: per sweep, take the top
    ``batch`` pairs whose symbols are mutually DISJOINT (greedy over the
    collected top rows, driver-side over <= 4*batch rows) and apply them
    all in one map-side rewrite.  A 32k-merge production vocab becomes
    ~vocab/batch sweeps instead of vocab sweeps — per-sweep cost is
    job overhead at any corpus size (SCALE.md: corpus-size-flat), so
    batching is THE dial for real tokenizer builds.

    Disjointness makes the batch order-free: no selected pair shares a
    symbol with another AND no selected pair's merged symbol collides
    with another pick's symbols or merged symbol (two picks minting the
    same token — e.g. ('a','bc') and ('ab','c') both producing 'abc' —
    would break the one-rank-per-symbol invariant a tokenizer vocab
    needs), so applying them in any order gives the same result, and
    each pair's count is exact at selection time (classic BPE
    interactions only arise between overlapping pairs).  With
    ``batch=1`` this IS classic greedy BPE (oracle-pinned: the
    `bpe_train_batched` gate query runs batch=1 against the classic
    training-replay SQL).  Merge ranks still record one merge per row,
    in (cnt desc, a, b) order within each sweep.  ``min_freq`` stops as
    in :func:`bpe_train` (sub-threshold picks are dropped; a sweep
    whose best pair is sub-threshold ends training).

    Measured trade (sf1 docs, 256 merges): batch=32 is 1.5x faster than
    classic (per-sweep cost at this corpus is dominated by compiling the
    batch's chained-replace projection, not data) and diverges from the
    classic vocabulary materially (~1/3 of merged symbols differ —
    disjoint-greedy skips pairs classic would have created by stacking
    merges within a sweep).  Keep ``batch`` small (<= 8) when vocab
    fidelity to classic BPE matters; go wide when sweep count (job
    overhead x vocab/batch) is the binding cost, i.e. real 32k vocabs."""
    wf = word_frequencies(docs, text_col, lowercase)
    syms = wf.select(
        words_to_symbols("word").alias("s"), "freq"
    ).localCheckpoint(eager=True)
    merges: list[dict] = []
    it = 0
    while len(merges) < num_merges:
        # pull enough top rows that `batch` disjoint pairs usually
        # survive the greedy filter; 4x is ample in practice
        top = (
            _pair_counts(syms)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(4 * batch)
            .collect()
        )
        if not top:
            break
        if int(top[0]["cnt"]) < min_freq:
            break
        used: set = set()
        chosen = []
        for r in top:
            if len(chosen) >= min(batch, num_merges - len(merges)):
                break
            if int(r["cnt"]) < min_freq:
                continue
            # skip when the pair's symbols OR its minted token collide
            # with an earlier pick: ('a','bc') after ('ab','c') would
            # re-mint 'abc' under a second rank otherwise
            if r["a"] in used or r["b"] in used or r["a"] + r["b"] in used:
                continue
            chosen.append((r["a"], r["b"], int(r["cnt"])))
            used.update((r["a"], r["b"], r["a"] + r["b"]))
        if not chosen:
            break
        col = F.col("s")
        for a, b, cnt in chosen:
            it += 1
            merges.append(
                {"it": it, "left": a, "right": b, "merged": a + b, "cnt": cnt}
            )
            col = _merge_expr(col, a, b, passes)
        syms = syms.select(col.alias("s"), "freq").localCheckpoint(eager=True)
    return merges, syms


def save_bpe_merges(merges: list[dict], spark, store, name: str) -> None:
    """Persist a trained merge table through the named parquet Store
    (datasets.lookup.Store — S19, the IVFPQ-index pattern): one table
    ``{name}__merges`` (it, left, right, merged, cnt), rank-ordered.  A
    trained tokenizer is a first-class artifact — train once on the full
    corpus, then every later session (segmentation jobs, vocab audits)
    reloads the merges without touching the corpus again."""
    df = spark.createDataFrame(
        [
            (m["it"], m["left"], m["right"], m["merged"], m["cnt"])
            for m in merges
        ],
        "it int, left string, right string, merged string, cnt bigint",
    )
    store.dump(df, f"{name}__merges")


def load_bpe_merges(spark, store, name: str) -> list[dict]:
    """Load a persisted merge table back into the list-of-dicts shape
    :func:`bpe_apply` consumes, in training-rank order.  The table is
    num_merges rows — driver-literal scale by construction (even a 32k
    production vocab is a few hundred KB)."""
    rows = store.load(spark, f"{name}__merges").orderBy("it").collect()
    return [
        {
            "it": int(r["it"]),
            "left": r["left"],
            "right": r["right"],
            "merged": r["merged"],
            "cnt": int(r["cnt"]),
        }
        for r in rows
    ]


def bpe_apply(
    text: Column, merges: list[dict], passes: int = 4, lowercase: bool = True
) -> Column:
    """Apply trained merges to a text column -> array of BPE tokens (per
    word, flattened in order).  The merge list rides inline as literal
    replace chains — num_merges x passes JVM string ops per word, no
    shuffle, no UDF."""
    c = F.lower(text) if lowercase else text
    toks = F.filter(F.split(F.trim(c), "\\s+"), lambda t: t != "")

    def seg(w: Column) -> Column:
        s = F.concat(
            F.array_join(F.filter(F.split(w, "(?!^)"), lambda t: t != ""), " "),
            F.lit(" " + EOW),
        )
        for m in merges:
            pat = f" {m['left']} {m['right']} "
            rep = f" {m['merged']} "
            e = F.concat(F.lit(" "), s, F.lit(" "))
            for _ in range(passes):
                e = F.replace(e, F.lit(pat), F.lit(rep))
            s = F.trim(e)
        return F.split(s, " ")

    return F.flatten(F.transform(toks, seg))
