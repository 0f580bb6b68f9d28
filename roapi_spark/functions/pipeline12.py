"""Training-pipeline batch 12 (round 8): a distributed BPE merge
trainer — the tokenizer-construction step of an LLM data pipeline —
plus the end-to-end gate for the Delta writer's new row-level DML
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


@register(
    "text_bpe_fertility",
    oracle=f"""
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
    """,
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
