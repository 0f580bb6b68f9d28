"""Training-pipeline batch 12 (round 8): a distributed BPE merge
trainer — the tokenizer-construction step of an LLM data pipeline —
a distributed fixed-point logistic-regression quality-classifier
trainer (``q_quality_lr_train`` / ``q_quality_lr_eval``), and the
end-to-end gate for the Delta writer's new row-level DML
(``q_delta_merge``).

Reference scope: roapi serves tables as-is (`columnq/src/table/mod.rs`)
and has no tokenizer surface; this extends the engine with the public
byte-pair-encoding algorithm (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units", ACL).

- ``text_bpe_train`` — learn the first N merge rules from the corpus:
  pre-tokenize into lowercase word tokens (the shared ``tokens_col``
  pipeline), aggregate to the word-frequency table once, then N rounds
  of (adjacent-symbol-pair count -> argmax -> apply merge). Exactly the
  published trainer: Sennrich et al. train on the word-count table,
  never the raw corpus, and so do we — the iteration state is
  Heaps'-law-bounded (the word vocabulary), not corpus-sized.
- ``text_bpe_fertility`` — apply the learned merges and report, per
  source, tokens, BPE pieces, and fertility (pieces per word token):
  the standard audit of how well a subword vocabulary fits each shard
  of a corpus (high fertility = out-of-domain text that fragments).

Determinism (the oracle contract): pair argmax ties break on
(count DESC, pair-string ASC); both engines compare ASCII strings
byte-wise, so the learned merge sequence is bit-identical. Merge
application uses a wrapped-symbol encoding — every symbol is wrapped in
its own pair of ``,`` delimiters (``the`` -> ``,t,,h,,e,,#,`` with
``#`` the end-of-word marker) — so a single left-to-right
non-overlapping ``replace`` of ``,a,,b,`` with ``,ab,`` consumes whole
symbols only and never shares a boundary character between adjacent
matches. That makes plain ``replace`` EXACTLY the greedy merge pass of
the reference algorithm (including runs: ``aaaa`` with pair ``(a,a)``
-> ``(aa)(aa)``), on both Spark and DuckDB; pinned against an
independent Python greedy implementation in
``tests/test_pipeline12.py``.

Scale shape at 100 TB:
- the corpus is scanned once to build the word-count table (one
  explode + one hash agg with map-side partial aggregation); every
  training iteration thereafter touches only that table
  (vocabulary-sized, tens of millions of rows at web scale — a small
  Spark job, nothing driver-resident);
- per iteration the driver collects exactly ONE row (the argmax pair)
  — bounded state, same pattern as the IVF centroid collect;
- merge application is a narrow per-row ``replace`` projection on the
  cached vocab table, no shuffle;
- scoring (fertility) joins the corpus token stream to the
  piece-count side dimension via the size-capped ``maybe_broadcast``,
  so the corpus is scanned once with no corpus-sized shuffle when the
  vocab fits the broadcast cap, and degrades to one hash join keyed on
  the token when it does not.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from roapi_spark.functions.text import _TOKENS_SQL_DUCK, docs, tokens_col
from roapi_spark.plans.registry import register
from roapi_spark.plans.util import maybe_broadcast
from roapi_spark.util import pround, pround_sql

BPE_MERGES = 8  # unrolled in the DuckDB oracle; keep the two in lockstep
EOW = "#"  # end-of-word marker symbol (tokens are [a-z] only)

# split a wrapped symbol string back into its symbol list (both engines)
_SYMS_SPARK = "filter(split(s, ','), x -> x != '')"
_SYMS_DUCK = "list_filter(string_split(s, ','), x -> x <> '')"

# adjacent pairs of a symbol list l, as 'left|right' strings
_PAIRS_SPARK = (
    "transform(slice(l, 1, size(l)-1), (x, i) -> concat(x, '|', element_at(l, i+2)))"
)
_PAIRS_DUCK = "list_transform(range(1, len(l)), j -> l[j] || '|' || l[j+1])"

# process-local memo: training is iterative (one tiny driver collect per
# merge), so queries sharing a corpus reuse the learned merge sequence
_MEMO: dict[tuple, tuple[list[tuple], DataFrame]] = {}


def _wrapped_init_col() -> F.Column:
    """word token -> wrapped initial symbol string: chars + EOW marker,
    each symbol wrapped in its own ',' pair ('the' -> ',t,,h,,e,,#,')."""
    chars = F.expr("filter(split(tok, ''), x -> x != '')")
    arr = F.concat(chars, F.array(F.lit(EOW)))
    return F.concat(F.lit(","), F.array_join(arr, ",,"), F.lit(","))


def bpe_train_state(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> tuple[list[tuple], DataFrame]:
    """Learn ``n_merges`` BPE merges; return (merge rows, final vocab DF).

    Merge rows are ``(rank, lft, rgt, merged, pair_count)``; the vocab
    DataFrame carries ``(tok, s, c)`` with ``s`` the post-merge wrapped
    symbol string — the input to piece counting / tokenization.
    """
    path = os.path.join(sf_dir, "documents.parquet")
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(path),
        os.path.getmtime(path),
        n_merges,
    )
    hit = _MEMO.get(key)
    if hit is not None:
        return hit

    wc = (
        docs(spark, sf_dir)
        .select(F.explode(tokens_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    vocab = wc.withColumn("s", _wrapped_init_col()).select("tok", "s", "c").cache()

    merges: list[tuple] = []
    cur = vocab
    for r in range(n_merges):
        top = (
            cur.select(F.expr(_SYMS_SPARK).alias("l"), "c")
            .select(F.explode(F.expr(_PAIRS_SPARK)).alias("pr"), "c")
            .groupBy("pr")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pr").asc())
            .limit(1)
            .collect()
        )
        if not top:  # degenerate corpus: nothing left to merge
            break
        pr, cnt = top[0]["pr"], int(top[0]["cnt"])
        lft, rgt = pr.split("|", 1)
        merged = lft + rgt
        merges.append((r + 1, lft, rgt, merged, cnt))
        cur = cur.withColumn(
            "s",
            F.replace(
                F.col("s"), F.lit(f",{lft},,{rgt},"), F.lit(f",{merged},")
            ),
        )

    _MEMO[key] = (merges, cur)
    return merges, cur


def _oracle_chain(n_merges: int = BPE_MERGES) -> str:
    """The shared unrolled-iteration CTE chain: v1..v{n+1} vocab states
    and m1..m{n} chosen merges, generated to stay in lockstep with the
    Spark loop (same tie-break, same wrapped-replace application)."""
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # each v{i} is referenced twice (p{i} and v{i+1}) — un-materialized,
    # the chain expands to 2^n copies of the corpus scan
    parts = [
        f"""v1 AS MATERIALIZED (
      SELECT tok,
             ',' || array_to_string(list_append(string_split(tok, ''), '{EOW}'), ',,') || ',' AS s,
             c
      FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest({_TOKENS_SQL_DUCK}) AS tok FROM documents)
            GROUP BY tok)
    )"""
    ]
    for i in range(1, n_merges + 1):
        sel = f"(SELECT pr FROM m{i})"
        parts.append(
            f"""p{i} AS (
      SELECT unnest({_PAIRS_DUCK}) AS pr, c
      FROM (SELECT {_SYMS_DUCK} AS l, c FROM v{i})
    ), m{i} AS MATERIALIZED (
      SELECT pr, SUM(c) AS cnt FROM p{i} GROUP BY pr
      ORDER BY cnt DESC, pr ASC LIMIT 1
    ), v{i + 1} AS MATERIALIZED (
      SELECT tok,
             replace(s,
               ',' || string_split({sel}, '|')[1] || ',,' || string_split({sel}, '|')[2] || ',',
               ',' || replace({sel}, '|', '') || ',') AS s,
             c
      FROM v{i}
    )"""
        )
    return ",\n    ".join(parts)


def _train_oracle(n_merges: int = BPE_MERGES) -> str:
    rows = "\n      UNION ALL ".join(
        f"SELECT {i} AS merge_rank, string_split(pr, '|')[1] AS lft, "
        f"string_split(pr, '|')[2] AS rgt, replace(pr, '|', '') AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
    WITH {_oracle_chain(n_merges)}
    SELECT * FROM (
      {rows}
    ) ORDER BY merge_rank
    """


_TRAIN_SCHEMA = T.StructType(
    [
        T.StructField("merge_rank", T.IntegerType()),
        T.StructField("lft", T.StringType()),
        T.StructField("rgt", T.StringType()),
        T.StructField("merged", T.StringType()),
        T.StructField("pair_count", T.LongType()),
    ]
)


@register(
    "text_bpe_train",
    oracle=_train_oracle(),
    doc="BPE merge trainer (Sennrich et al. 2016): the first "
    f"{BPE_MERGES} learned merge rules with their pair counts. Plan: "
    "one corpus scan builds the word-count table (explode + hash agg "
    "with map-side partials); each iteration aggregates adjacent-pair "
    "counts over that Heaps'-bounded cached table and collects exactly "
    "one argmax row to the driver (ties break count DESC, pair ASC); "
    "merge application is a narrow wrapped-symbol replace — greedy "
    "left-to-right semantics proved against an independent Python "
    "implementation in tests/test_pipeline12.py.",
    tags=("text", "pipeline"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = bpe_train_state(spark, sf_dir)
    return spark.createDataFrame(merges, _TRAIN_SCHEMA).orderBy("merge_rank")


_FERTILITY_ORACLE = f"""
    WITH {_oracle_chain()},
    np AS (
      SELECT tok, len({_SYMS_DUCK}) AS np FROM v{BPE_MERGES + 1}
    ),
    corp AS (
      SELECT source, unnest({_TOKENS_SQL_DUCK}) AS tok FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(np.np) AS BIGINT) AS n_pieces,
           {pround_sql('SUM(np.np) * 1.0 / COUNT(*)')} AS fertility
    FROM corp JOIN np USING (tok)
    GROUP BY source ORDER BY source
    """


@register(
    "text_bpe_fertility",
    oracle=_FERTILITY_ORACLE,
    doc="Subword fertility audit of the learned BPE vocabulary: per "
    "source, word tokens, BPE pieces after applying the learned merges, "
    "and pieces-per-token fertility (high fertility = the shard's text "
    "fragments under the vocabulary, i.e. domain mismatch). Plan: the "
    "trainer's final vocab table maps word->piece-count (dimension-"
    "sized, size-capped broadcast); the corpus token stream joins it "
    "map-side and aggregates per source — one corpus scan, no "
    "corpus-sized shuffle.",
    tags=("text", "pipeline"),
)
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, vocab = bpe_train_state(spark, sf_dir)
    np_df = vocab.select(
        "tok", F.size(F.expr(_SYMS_SPARK)).cast("bigint").alias("np")
    )
    corp = docs(spark, sf_dir).select(
        "source", F.explode(tokens_col()).alias("tok")
    )
    return (
        corp.join(maybe_broadcast(np_df), "tok")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("np").cast("bigint").alias("n_pieces"),
            pround(F.sum("np") * 1.0 / F.count("*")).alias("fertility"),
        )
        .orderBy("source")
    )


# --- artifact-served BPE: build once per corpus snapshot -------------------


def bpe_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build-once BPE artifact for ``sf_dir``: the learned merge table
    (merges.json — N rows, KB-scale) plus the post-merge vocab parquet
    (tok, s, c) that tokenization/fertility consumers join against.
    Cache key is the content-addressed corpus snapshot, so a refreshed
    corpus retrains automatically. At 100 TB this is how a tokenizer
    actually ships: train once per corpus snapshot, serve the merge
    table everywhere."""
    import json

    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir

    src = os.path.join(sf_dir, "documents.parquet")
    out = snapshot_cache_dir(src, f"bpe-m{BPE_MERGES}-v1")

    def _ready(d: str) -> bool:
        return os.path.exists(os.path.join(d, "_BPE_READY"))

    def _build(tmp: str) -> None:
        merges, vocab = bpe_train_state(spark, sf_dir)
        vocab.write.mode("overwrite").parquet(os.path.join(tmp, "vocab"))
        with open(os.path.join(tmp, "merges.json"), "w") as f:
            json.dump(merges, f)
        open(os.path.join(tmp, "_BPE_READY"), "w").close()

    return build_once(out, _ready, _build)


@register(
    "text_bpe_train_served",
    oracle=_train_oracle(),
    doc="Same result contract as text_bpe_train (identical oracle), "
    "served from the build-once bpe-m8-v1 artifact: the merge table is "
    "a KB-scale driver read, so a consumer (tokenizer worker, fertility "
    "audit, data card) pays zero training jobs per call. The iterative "
    "trainer runs once per corpus snapshot — the deploy shape of every "
    "production tokenizer.",
    tags=("text", "pipeline", "artifact"),
)
def text_bpe_train_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    layout = bpe_layout(spark, sf_dir)
    with open(os.path.join(layout, "merges.json")) as f:
        merges = [tuple(m) for m in json.load(f)]
    return spark.createDataFrame(merges, _TRAIN_SCHEMA).orderBy("merge_rank")


@register(
    "text_bpe_fertility_served",
    oracle=_FERTILITY_ORACLE,
    doc="Same result contract as text_bpe_fertility (identical oracle), "
    "but the word->piece-count side comes from the artifact's vocab "
    "parquet instead of retraining: one corpus token scan + a size-"
    "capped broadcast join, zero training jobs per call.",
    tags=("text", "pipeline", "artifact"),
)
def text_bpe_fertility_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    layout = bpe_layout(spark, sf_dir)
    vocab = spark.read.parquet(os.path.join(layout, "vocab"))
    np_df = vocab.select(
        "tok", F.size(F.expr(_SYMS_SPARK)).cast("bigint").alias("np")
    )
    corp = docs(spark, sf_dir).select(
        "source", F.explode(tokens_col()).alias("tok")
    )
    return (
        corp.join(maybe_broadcast(np_df), "tok")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("np").cast("bigint").alias("n_pieces"),
            pround(F.sum("np") * 1.0 / F.count("*")).alias("fertility"),
        )
        .orderBy("source")
    )


def _encode_oracle() -> str:
    """Per-doc encode oracle: the same map-side construction — wrapped
    token stream, the 8 learned merges applied as nested replaces (the
    merge table comes from the shared m{i} CTEs), then the readable
    piece sequence is split back out and hashed."""
    base = (
        "array_to_string(list_transform(t, tok -> ',' || "
        f"array_to_string(list_append(string_split(tok, ''), '{EOW}'), ',,')"
        " || ','), ' ')"
    )
    expr = base
    for i in range(1, BPE_MERGES + 1):
        sel = f"(SELECT pr FROM m{i})"
        pat = (
            f"',' || string_split({sel}, '|')[1] || ',,' || "
            f"string_split({sel}, '|')[2] || ','"
        )
        rep = f"',' || replace({sel}, '|', '') || ','"
        expr = f"replace({expr}, {pat}, {rep})"
    return f"""
    WITH {_oracle_chain()},
    enc AS (
      SELECT doc_id,
             list_filter(string_split_regex({expr}, '[, ]+'), x -> x <> '')
               AS pieces
      FROM (SELECT doc_id, {_TOKENS_SQL_DUCK} AS t FROM documents)
      WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(len(pieces) AS BIGINT) AS n_pieces,
           MD5(array_to_string(pieces, ' ')) AS piece_hash
    FROM enc ORDER BY doc_id
    """


@register(
    "text_bpe_encode",
    oracle=_encode_oracle(),
    doc="The tokenization pass itself: every document encoded into its "
    "BPE piece sequence under the learned merge table (per-doc piece "
    "count + an md5 over the ordered pieces, so a wrong merge order or "
    "a boundary-crossing merge hash-mismatches). Plan: MAP-SIDE ONLY — "
    "the merge table is 8 driver-side rows from the bpe-m8-v1 artifact "
    "inlined as replace literals, each doc's token stream is wrapped "
    "and rewritten in a single narrow projection: FileScan + Project, "
    "zero shuffle, zero join (space separators between tokens cannot "
    "match any ',l,,r,' pattern, so merges never cross word "
    "boundaries). At 100 TB this is the shape you want for the most "
    "corpus-intensive pass in the pipeline: embarrassingly parallel, "
    "no vocab-sized state per executor beyond 8 literals.",
    tags=("text", "pipeline", "artifact"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    layout = bpe_layout(spark, sf_dir)
    with open(os.path.join(layout, "merges.json")) as f:
        merges = json.load(f)
    t = tokens_col()
    wrapped = F.array_join(
        F.transform(
            t,
            lambda tok: F.concat(
                F.lit(","),
                F.array_join(
                    F.concat(
                        F.filter(F.split(tok, ""), lambda x: F.length(x) > 0),
                        F.array(F.lit(EOW)),
                    ),
                    ",,",
                ),
                F.lit(","),
            ),
        ),
        " ",
    )
    s = wrapped
    for _rank, lft, rgt, merged, _cnt in merges:
        s = F.replace(s, F.lit(f",{lft},,{rgt},"), F.lit(f",{merged},"))
    pieces = F.filter(F.split(s, "[, ]+"), lambda x: F.length(x) > 0)
    # no orderBy: the correctness compare is order-insensitive, and a
    # presentation sort would cost a range exchange on the single pure
    # map-side pass in the registry
    return (
        docs(spark, sf_dir)
        .filter(F.size(t) > 0)
        .select(
            "doc_id",
            F.size(pieces).cast("bigint").alias("n_pieces"),
            F.md5(F.array_join(pieces, " ")).alias("piece_hash"),
        )
    )


# --- Delta MERGE end-to-end gate -------------------------------------------

_MERGE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]


def _merged_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-once Delta artifact: a base table from ``orders`` plus ONE
    MERGE commit exercising all three clauses (update, delete, insert)
    through the copy-on-write writer. The registered query reads the
    post-merge table back through the pure-Python delta source, so the
    oracle row checks writer DML + log commit + reader replay end to
    end."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.sinks.delta import merge_delta, write_delta

    src = os.path.join(sf_dir, "orders.parquet")
    out = snapshot_cache_dir(src, "deltamerge-v1")

    def ready(d: str) -> bool:
        return os.path.isfile(
            os.path.join(d, "_delta_log", f"{1:020d}.json")
        )

    def build(tmp: str) -> None:
        orders = spark.read.parquet(src)
        base = orders.filter("o_orderkey % 4 = 0").select(_MERGE_COLS)
        write_delta(base, tmp, mode="overwrite")
        source = (
            orders.filter("o_orderkey % 8 = 0 OR o_orderkey % 4 = 1")
            .select(_MERGE_COLS)
            .withColumn("o_orderstatus", F.lit("N"))
        )
        merge_delta(
            spark,
            tmp,
            source,
            on=["o_orderkey"],
            when_matched_update={
                "o_totalprice": "s.o_totalprice * 2",
                "o_orderstatus": "'U'",
            },
            when_matched_delete="t.o_orderkey % 16 = 0",
            when_not_matched_insert=True,
        )

    return build_once(out, ready, build)


@register(
    "q_delta_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 4 = 0
    ), src AS (
      SELECT o_orderkey, o_custkey, o_totalprice, 'N' AS o_orderstatus
      FROM orders WHERE o_orderkey % 8 = 0 OR o_orderkey % 4 = 1
    ), merged AS (
      SELECT b.o_orderkey, b.o_custkey,
             CASE WHEN s.o_orderkey IS NOT NULL
                  THEN b.o_totalprice * 2 ELSE b.o_totalprice
             END AS o_totalprice,
             CASE WHEN s.o_orderkey IS NOT NULL
                  THEN 'U' ELSE b.o_orderstatus
             END AS o_orderstatus
      FROM base b LEFT JOIN src s USING (o_orderkey)
      WHERE NOT (s.o_orderkey IS NOT NULL AND b.o_orderkey % 16 = 0)
      UNION ALL
      SELECT s.* FROM src s ANTI JOIN base b USING (o_orderkey)
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="End-to-end gate for Delta row-level DML: a MERGE with matched-"
    "update (price doubled, status 'U'), matched-delete (every 16th "
    "key), and not-matched-insert (status 'N') committed copy-on-write "
    "by sinks/delta.merge_delta, then read back through the pure-Python "
    "log replay and aggregated by status. The oracle replicates the "
    "MERGE relationally, so a wrong rewrite (lost rows, double-applied "
    "updates, resurrected deletes) hash-mismatches. Plan: serve path is "
    "one FileScan of the build-once artifact + a 3-group agg; the merge "
    "itself rewrites only files containing matched keys (provenance "
    "semi-join), the scale-correct copy-on-write shape.",
    tags=("sql", "delta"),
)
def q_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources.delta import to_dataframe

    path = _merged_orders_table(spark, sf_dir)
    ts = TableSource(name="_merged", uri=path, format="delta", option={})
    return (
        to_dataframe(spark, ts)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q_delta_time_travel",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 4 = 0
    ), src AS (
      SELECT o_orderkey, o_custkey, o_totalprice, 'N' AS o_orderstatus
      FROM orders WHERE o_orderkey % 8 = 0 OR o_orderkey % 4 = 1
    ), merged AS (
      SELECT b.o_orderkey,
             CASE WHEN s.o_orderkey IS NOT NULL
                  THEN b.o_totalprice * 2 ELSE b.o_totalprice
             END AS o_totalprice
      FROM base b LEFT JOIN src s USING (o_orderkey)
      WHERE NOT (s.o_orderkey IS NOT NULL AND b.o_orderkey % 16 = 0)
      UNION ALL
      SELECT s.o_orderkey, s.o_totalprice
      FROM src s ANTI JOIN base b USING (o_orderkey)
    ),
    v0 AS (SELECT CAST(0 AS BIGINT) AS version,
                  CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sum_cents
           FROM base),
    v1 AS (SELECT CAST(1 AS BIGINT) AS version,
                  CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sum_cents
           FROM merged)
    SELECT * FROM v0 UNION ALL SELECT * FROM v1 ORDER BY version
    """,
    doc="Time travel under the driver gate: the post-MERGE Delta "
    "artifact is read BOTH at version=0 (the pre-merge base) and at "
    "HEAD through the pure-Python log replay, and each snapshot is "
    "summarized (row count + exact-integer cent sum). The oracle "
    "reconstructs both states relationally from orders, so a replay "
    "that leaks post-merge files into the v0 snapshot (or vice versa) "
    "hash-mismatches. Plan: two FileScans over disjoint snapshot file "
    "lists + two global aggs + a 2-row union — snapshot resolution is "
    "driver-side log replay, bounded by log size, never a data scan.",
    tags=("sql", "delta"),
)
def q_delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources.delta import to_dataframe

    path = _merged_orders_table(spark, sf_dir)

    def snap(version: int | None, tag: int) -> DataFrame:
        opt = {} if version is None else {"version": str(version)}
        ts = TableSource(name=f"_tt{tag}", uri=path, format="delta", option=opt)
        return (
            to_dataframe(spark, ts)
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
                ).cast("bigint").alias("sum_cents"),
            )
            .select(
                F.lit(tag).cast("bigint").alias("version"),
                "n_rows",
                "sum_cents",
            )
        )
    return snap(0, 0).unionAll(snap(None, 1)).orderBy("version")


def _checkpointed_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-once Delta artifact exercising checkpoint-seeded replay:
    base slice (v0), append (v1), classic parquet checkpoint at v1,
    then a post-checkpoint append (v2). Readers must seed from the
    checkpoint (columnar harvest, sources/delta._checkpoint_file_state)
    and replay only v2's json on top."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.sinks.delta import write_checkpoint, write_delta

    src = os.path.join(sf_dir, "orders.parquet")
    out = snapshot_cache_dir(src, "deltackpt-v1")

    def ready(d: str) -> bool:
        return os.path.isfile(
            os.path.join(d, "_delta_log", "_last_checkpoint")
        ) and os.path.isfile(os.path.join(d, "_delta_log", f"{2:020d}.json"))

    def build(tmp: str) -> None:
        orders = spark.read.parquet(src).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        write_delta(orders.filter("o_orderkey % 3 = 0"), tmp, mode="overwrite")
        write_delta(orders.filter("o_orderkey % 3 = 1"), tmp, mode="append")
        write_checkpoint(tmp)
        write_delta(orders.filter("o_orderkey % 3 = 2"), tmp, mode="append")

    return build_once(out, ready, build)


@register(
    "q_delta_checkpoint_read",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders
    """,
    doc="Checkpoint-seeded replay under the driver gate: the artifact "
    "has a classic parquet checkpoint at v1 (written by "
    "sinks/delta.write_checkpoint) plus a post-checkpoint json commit; "
    "the reader seeds its active set from the checkpoint via the "
    "columnar struct-field harvest and replays only v2 on top. The "
    "oracle is the full orders table (the three slices partition it), "
    "so a checkpoint that drops/duplicates adds, or a replay that "
    "re-applies pre-checkpoint commits, hash-mismatches. Plan: one "
    "FileScan over the snapshot file list + global agg; checkpoint "
    "parsing is driver-side and columnar (0.23 s at 100k adds, "
    "docs/SCALE.md round-9).",
    tags=("sql", "delta"),
)
def q_delta_checkpoint_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.config import TableSource
    from roapi_spark.sources.delta import to_dataframe

    path = _checkpointed_orders_table(spark, sf_dir)
    ts = TableSource(name="_ckpt", uri=path, format="delta", option={})
    return to_dataframe(spark, ts).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_cust"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
        ).cast("bigint").alias("sum_cents"),
    )


def _zordered_orders_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-once Delta artifact: orders written UNCLUSTERED across 8
    hash-partitioned files, then OPTIMIZE ZORDER BY (o_custkey,
    o_totalprice) — the two-dimensional clustering whose per-file
    min/max stats make selective predicates on either column prune
    files (measured 16x file-skip in tools/zorder_audit.py)."""
    from roapi_spark.functions.snapshot import build_once, snapshot_cache_dir
    from roapi_spark.sinks.delta import compact, write_delta

    src = os.path.join(sf_dir, "orders.parquet")
    out = snapshot_cache_dir(src, "deltazorder-v1")

    def ready(d: str) -> bool:
        return os.path.isfile(
            os.path.join(d, "_delta_log", f"{1:020d}.json")
        )

    def build(tmp: str) -> None:
        orders = spark.read.parquet(src).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        write_delta(orders.repartition(8), tmp, mode="overwrite")
        compact(spark, tmp, target_partitions=8,
                zorder_by=["o_custkey", "o_totalprice"])

    return build_once(out, ready, build)


_ZORDER_CK = (100, 400)
_ZORDER_TP = (50_000.0, 150_000.0)


@register(
    "q_delta_zorder",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE o_custkey BETWEEN {_ZORDER_CK[0]} AND {_ZORDER_CK[1]}
      AND o_totalprice BETWEEN {_ZORDER_TP[0]} AND {_ZORDER_TP[1]}
    """,
    doc="End-to-end gate for OPTIMIZE ZORDER + stats-based file "
    "skipping: orders is written unclustered, Morton-clustered by "
    "(o_custkey, o_totalprice) via sinks/delta.compact, and the serve "
    "path resolves the file list through "
    "sources/delta.snapshot_adds_pruned — ONLY files whose add.stats "
    "min/max overlap the two-column range predicate are handed to the "
    "parquet scan. The oracle runs the same predicate over the raw "
    "orders table, so a skip of a file that held matching rows (stats "
    "written wrong, pruning too eager) hash-mismatches, and sum_cents "
    "is exact-integer so the check is engine-independent. Plan: one "
    "FileScan over the pruned candidates + global agg; at 100 TB the "
    "pruning shrinks the FILE LIST before any footer is opened — "
    "measured 4/64 files, 5.4/90 MB on an independent-uniform 2M-row "
    "table (tools/zorder_audit.py, docs/SCALE.md round-9).",
    tags=("sql", "delta"),
)
def q_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from roapi_spark.sources.delta import snapshot_adds_pruned

    path = _zordered_orders_table(spark, sf_dir)
    cand, _skipped, _cb, _tb = snapshot_adds_pruned(
        path,
        {"o_custkey": _ZORDER_CK, "o_totalprice": _ZORDER_TP},
    )
    return (
        spark.read.parquet(*sorted(cand))
        .filter(
            (F.col("o_custkey").between(*_ZORDER_CK))
            & (F.col("o_totalprice").between(*_ZORDER_TP))
        )
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
            ).cast("bigint").alias("sum_cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


# --- fixed-point logistic-regression quality classifier --------------------
#
# Distributed full-batch gradient descent, bit-exact across engines: the
# sigmoid is the "hard sigmoid" (clamped line — pure arithmetic, no
# exp()), weights live on an integer grid (scale LR_S), every per-row
# quantity is integer, and every gradient is an exact BIGINT sum. The
# only floats are x/const divisions of exact integers below 2^53, which
# IEEE754 defines identically everywhere — the same trick the k-means /
# PQ family uses for bit-for-bit oracles. Fixed-point training itself is
# standard practice (quantized/embedded ML); here it buys a DuckDB
# oracle that replays the ENTIRE training trajectory exactly.
#
# The task is CCNet-style quality-classifier distillation: cheap surface
# features (length, mean word length, stopword hits, alpha ratio — all
# centered at fixed constants) against a held rule label. At 100 TB each
# GD iteration is ONE scan of the cached feature projection (map-side
# partial sums, D+1=5 BIGINTs to the driver), T iterations total —
# the treeAggregate shape of MLlib's own linear trainers, made
# deterministic.

LR_S = 1024       # weight / probability fixed-point scale
LR_HALF = LR_S // 2
LR_T = 8          # GD iterations (unrolled in the oracle)
LR_DIV = 8.0      # learning-rate divisor: step = floor(g / (n * LR_DIV))
LR_SIG = 4.0      # hard-sigmoid slope divisor
LR_CLAMP = 16384  # weight clamp (16 * LR_S)
LR_D = 5          # features: bias + 4 surface stats

_LR_STOP_DUCK = "'the','a','and','of','to','in','is','it'"

_LR_FEAT_DUCK = f"""lrf AS MATERIALIZED (
      SELECT source,
             CASE WHEN 2 * sh + ml >= 12 THEN 1 ELSE 0 END AS y,
             CAST(1 AS BIGINT) AS x0,
             LEAST(CAST(FLOOR(nt / 16.0) AS BIGINT), 15) - 4 AS x1,
             LEAST(ml, 15) - 5 AS x2,
             LEAST(sh, 15) - 2 AS x3,
             LEAST(ar, 10) - 7 AS x4
      FROM (
        SELECT LEN(t) AS nt,
               CAST(FLOOR(LIST_SUM(LIST_TRANSFORM(t, w -> LENGTH(w))) * 1.0
                          / GREATEST(LEN(t), 1)) AS BIGINT) AS ml,
               CAST(LEN(LIST_FILTER(t, w -> w IN ({_LR_STOP_DUCK}))) AS BIGINT) AS sh,
               CAST(FLOOR(LENGTH(REGEXP_REPLACE(LOWER(text), '[^a-z]', '', 'g'))
                          * 10.0 / GREATEST(LENGTH(text), 1)) AS BIGINT) AS ar,
               source
        FROM (SELECT text, source, {_TOKENS_SQL_DUCK} AS t FROM documents)
      )
    )"""


def _lr_chain(n_iters: int = LR_T) -> str:
    """Shared oracle CTE chain: lrf features, w0..w{n} weight states,
    s0..s{n} per-iteration gradient/accuracy aggregates."""
    zeros = ", ".join(f"CAST(0 AS BIGINT) AS w{j}" for j in range(LR_D))
    parts = [_LR_FEAT_DUCK, f"w0 AS MATERIALIZED (SELECT {zeros})"]
    for i in range(n_iters + 1):
        u = " + ".join(f"(SELECT w{j} FROM w{i}) * x{j}" for j in range(LR_D))
        yhat = (
            f"LEAST({LR_S}, GREATEST(0, {LR_HALF} + "
            f"CAST(FLOOR(({u}) / {LR_SIG}) AS BIGINT)))"
        )
        gsums = ", ".join(
            f"CAST(SUM(({yhat} - y * {LR_S}) * x{j}) AS BIGINT) AS g{j}"
            for j in range(LR_D)
        )
        parts.append(
            f"""s{i} AS MATERIALIZED (
      SELECT COUNT(*) AS n, {gsums},
             SUM(CASE WHEN (CASE WHEN {yhat} >= {LR_HALF} THEN 1 ELSE 0 END) = y
                      THEN 1 ELSE 0 END) AS ok
      FROM lrf)"""
        )
        if i < n_iters:
            upd = ", ".join(
                f"GREATEST(-{LR_CLAMP}, LEAST({LR_CLAMP}, "
                f"(SELECT w{j} FROM w{i}) - CAST(FLOOR(g{j} / (n * {LR_DIV})) AS BIGINT)))"
                f" AS w{j}"
                for j in range(LR_D)
            )
            parts.append(f"w{i + 1} AS MATERIALIZED (SELECT {upd} FROM s{i})")
    return ",\n    ".join(parts)


def lr_feature_frame(base: DataFrame, extra_cols: list[str]) -> DataFrame:
    """The lrf feature projection over any frame carrying a ``text``
    column: (extra_cols..., y, x0..x4), all integer. Shared verbatim by
    the batch trainer and the streaming quality screen so the two paths
    can never drift."""
    from roapi_spark.functions.text import STOPWORDS_EN, stopword_hits

    t = tokens_col()
    nt = F.size(t)
    ml = F.floor(
        F.aggregate(
            F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
        )
        * 1.0
        / F.greatest(nt, F.lit(1))
    ).cast("bigint")
    sh = stopword_hits(t, STOPWORDS_EN).cast("bigint")
    ar = F.floor(
        F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
        * 10.0
        / F.greatest(F.length(F.col("text")), F.lit(1))
    ).cast("bigint")
    mid = base.select(
        *extra_cols,
        nt.cast("bigint").alias("nt"),
        ml.alias("ml"),
        sh.alias("sh"),
        ar.alias("ar"),
    )
    return mid.select(
        *extra_cols,
        F.when(2 * F.col("sh") + F.col("ml") >= 12, 1).otherwise(0).alias("y"),
        F.lit(1).cast("bigint").alias("x0"),
        (F.least(F.floor(F.col("nt") / 16.0).cast("bigint"), F.lit(15)) - 4).alias("x1"),
        (F.least(F.col("ml"), F.lit(15)) - 5).alias("x2"),
        (F.least(F.col("sh"), F.lit(15)) - 2).alias("x3"),
        (F.least(F.col("ar"), F.lit(10)) - 7).alias("x4"),
    )


def lr_score_cols(weights: list[int]) -> tuple[F.Column, F.Column]:
    """(yh, keep) columns for a feature frame under fixed-point weights
    — the serve-side scoring expression, shared by q_quality_lr_eval
    and the streaming screen."""
    u = sum((F.col(f"x{j}") * F.lit(int(weights[j]))) for j in range(LR_D))
    yh = F.least(
        F.lit(LR_S),
        F.greatest(F.lit(0), LR_HALF + F.floor(u / LR_SIG).cast("bigint")),
    )
    return yh, yh >= LR_HALF


def _lr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the lrf CTE: (source, y, x0..x4), all integer."""
    return lr_feature_frame(docs(spark, sf_dir), ["source"])


def lr_train_state(
    spark: SparkSession, sf_dir: str, n_iters: int = LR_T
) -> list[tuple]:
    """Run the fixed-point GD; returns one row per weight state:
    (it, w0..w4, acc_num, n) with acc measured under that state's
    weights. Driver holds LR_D ints per iteration; each iteration is
    one aggregate over the cached feature projection."""
    import math

    path = os.path.join(sf_dir, "documents.parquet")
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(path),
        os.path.getmtime(path),
        "lr",
        n_iters,
    )
    hit = _MEMO.get(key)
    if hit is not None:
        return hit

    f = _lr_features(spark, sf_dir).cache()
    w = [0] * LR_D
    rows: list[tuple] = []
    for it in range(n_iters + 1):
        u = sum((F.col(f"x{j}") * F.lit(int(w[j]))) for j in range(LR_D))
        yhat = F.least(
            F.lit(LR_S),
            F.greatest(F.lit(0), LR_HALF + F.floor(u / LR_SIG).cast("bigint")),
        )
        aggs = [F.count("*").alias("n")] + [
            F.sum((yhat - F.col("y") * LR_S) * F.col(f"x{j}"))
            .cast("bigint")
            .alias(f"g{j}")
            for j in range(LR_D)
        ] + [
            F.sum(
                F.when(
                    (F.when(yhat >= LR_HALF, 1).otherwise(0)) == F.col("y"), 1
                ).otherwise(0)
            ).alias("ok")
        ]
        s = f.agg(*aggs).collect()[0]
        rows.append((it, *[int(x) for x in w], int(s["ok"]), int(s["n"])))
        if it < n_iters:
            w = [
                max(
                    -LR_CLAMP,
                    min(
                        LR_CLAMP,
                        w[j] - math.floor(int(s[f"g{j}"]) / (int(s["n"]) * LR_DIV)),
                    ),
                )
                for j in range(LR_D)
            ]
    _MEMO[key] = rows
    return rows


_LR_SCHEMA = T.StructType(
    [T.StructField("it", T.IntegerType())]
    + [T.StructField(f"w{j}", T.LongType()) for j in range(LR_D)]
    + [T.StructField("ok", T.LongType()), T.StructField("n", T.LongType())]
)


def _lr_train_oracle() -> str:
    rows = "\n      UNION ALL ".join(
        f"SELECT {i} AS it, "
        + ", ".join(f"(SELECT w{j} FROM w{i}) AS w{j}" for j in range(LR_D))
        + f", (SELECT CAST(ok AS BIGINT) FROM s{i}) AS ok"
        + f", (SELECT CAST(n AS BIGINT) FROM s{i}) AS n"
        + f", (SELECT {pround_sql('ok * 1.0 / n')} FROM s{i}) AS acc"
        for i in range(LR_T + 1)
    )
    return f"""
    WITH {_lr_chain()}
    SELECT * FROM ({rows}) ORDER BY it
    """


@register(
    "q_quality_lr_train",
    oracle=_lr_train_oracle(),
    doc="Distributed quality-classifier training (CCNet-style "
    "distillation of a rule label into a linear head): full-batch "
    "gradient descent on fixed-point integer weights with a hard-"
    f"sigmoid link, {LR_T} iterations, one row per weight state with "
    "its training accuracy — the whole trajectory is bit-exact across "
    "engines (integer gradients, IEEE-defined float division of exact "
    "ints), so the oracle replays training, not just the final state. "
    "Plan: per iteration ONE aggregate over the cached integer feature "
    "projection (map-side partials, 5 BIGINT sums to the driver) — "
    "MLlib's treeAggregate shape, deterministic.",
    tags=("text", "pipeline", "ml"),
)
def q_quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = lr_train_state(spark, sf_dir)
    out = spark.createDataFrame(
        [(it, *ws_ok_n) for (it, *ws_ok_n) in rows], _LR_SCHEMA
    )
    return out.select(
        "it",
        *[F.col(f"w{j}") for j in range(LR_D)],
        "ok",
        "n",
        pround(F.col("ok") * 1.0 / F.col("n")).alias("acc"),
    ).orderBy("it")


@register(
    "q_quality_lr_eval",
    oracle=f"""
    WITH {_lr_chain()}
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {pround_sql('AVG(CASE WHEN yh >= ' + str(LR_HALF) + ' THEN 1.0 ELSE 0.0 END)')}
             AS pred_pos_rate,
           {pround_sql('AVG(CASE WHEN (CASE WHEN yh >= ' + str(LR_HALF) + ' THEN 1 ELSE 0 END) = y THEN 1.0 ELSE 0.0 END)')}
             AS agreement
    FROM (
      SELECT source, y,
             LEAST({LR_S}, GREATEST(0, {LR_HALF} + CAST(FLOOR((
               {' + '.join(f'(SELECT w{j} FROM w{LR_T}) * x{j}' for j in range(LR_D))}
             ) / {LR_SIG}) AS BIGINT))) AS yh
      FROM lrf
    )
    GROUP BY source ORDER BY source
    """,
    doc="Serve side of the trained quality head: per source, the "
    "predicted-positive rate and agreement with the rule label under "
    "the FINAL trained weights — the shard-level quality report a "
    "curation run reads before setting sampling rates. Plan: one scan "
    "of the feature projection with the weight vector inlined as "
    "literals (broadcast-free: 5 ints), one source-keyed agg.",
    tags=("text", "pipeline", "ml"),
)
def q_quality_lr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = lr_train_state(spark, sf_dir)
    w = list(rows[-1][1 : 1 + LR_D])
    f = _lr_features(spark, sf_dir)
    _yh, keep = lr_score_cols(w)
    pred = F.when(keep, 1).otherwise(0)
    return (
        f.select("source", "y", pred.alias("p"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            pround(F.avg(F.when(F.col("p") == 1, 1.0).otherwise(0.0))).alias(
                "pred_pos_rate"
            ),
            pround(
                F.avg(F.when(F.col("p") == F.col("y"), 1.0).otherwise(0.0))
            ).alias("agreement"),
        )
        .orderBy("source")
    )


# --- sequence packing under the REAL tokenizer -----------------------------

PACK_PIECES = 512  # pieces per packed training sequence


@register(
    "text_seq_pack_bpe",
    oracle=f"""
    WITH {_oracle_chain()},
    np AS (
      SELECT tok, len({_SYMS_DUCK}) AS np FROM v{BPE_MERGES + 1}
    ),
    dnp AS (
      SELECT d.doc_id, d.source, COALESCE(s.np, 0) AS n_pieces
      FROM documents d LEFT JOIN (
        SELECT doc_id, CAST(SUM(np.np) AS BIGINT) AS np
        FROM (SELECT doc_id, unnest({_TOKENS_SQL_DUCK}) AS tok FROM documents) t
        JOIN np USING (tok)
        GROUP BY doc_id
      ) s USING (doc_id)
    ),
    c AS (
      SELECT doc_id, source, n_pieces,
             COALESCE(SUM(n_pieces) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM dnp
    )
    SELECT doc_id, source, CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST(FLOOR(cb / {PACK_PIECES}.0) AS BIGINT) AS pack_id,
           CAST(cb % {PACK_PIECES} AS BIGINT) AS pack_offset
    FROM c ORDER BY source, doc_id
    """,
    doc="GPT-style sequence packing under the TRAINED tokenizer: every "
    "document's length is its BPE piece count (from the bpe-m8-v1 "
    "vocab), and docs pack greedily into "
    f"{PACK_PIECES}-piece training sequences per source — the packing a "
    "training job actually runs, where budget is measured in the "
    "tokenizer's units, not whitespace words (text_seq_pack's "
    "approximation drifts exactly where fertility > 1). Plan: piece "
    "counts via one size-capped broadcast join of the artifact vocab "
    "onto the token stream + a doc-keyed agg; the cumulative pack "
    "assignment is a per-source running sum (same window pattern as "
    "text_seq_pack; the distributed-prefix-sum variant for sources "
    "bigger than a partition is q_token_budget_shards' documented "
    "pattern).",
    tags=("text", "pipeline", "artifact"),
)
def text_seq_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    layout = bpe_layout(spark, sf_dir)
    vocab = spark.read.parquet(os.path.join(layout, "vocab"))
    np_df = vocab.select(
        "tok", F.size(F.expr(_SYMS_SPARK)).cast("bigint").alias("np")
    )
    per_doc = (
        docs(spark, sf_dir)
        .select("doc_id", F.explode(tokens_col()).alias("tok"))
        .join(maybe_broadcast(np_df), "tok")
        .groupBy("doc_id")
        .agg(F.sum("np").cast("bigint").alias("np"))
    )
    dnp = (
        docs(spark, sf_dir)
        .select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id", "source", F.coalesce("np", F.lit(0)).alias("n_pieces")
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = dnp.select(
        "doc_id",
        "source",
        "n_pieces",
        F.coalesce(F.sum("n_pieces").over(w), F.lit(0)).alias("cb"),
    )
    return c.select(
        "doc_id",
        "source",
        F.col("n_pieces").cast("bigint").alias("n_pieces"),
        F.floor(F.col("cb") / float(PACK_PIECES)).cast("bigint").alias("pack_id"),
        (F.col("cb") % PACK_PIECES).cast("bigint").alias("pack_offset"),
    ).orderBy("source", "doc_id")
