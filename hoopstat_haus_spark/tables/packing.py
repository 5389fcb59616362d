"""Sequence packing: tokenized documents → fixed-length training
sequences, the final stage of an LLM training-data build.

Docs are concatenated in a deterministic order and split into
``seq_len``-token sequences. Packing is inherently sequential, so a
global concatenation would be a one-reducer job; the scale design is
the standard sharded pack: each doc routes to a deterministic shard
(closed-form multiplicative hash of its doc number — the same family
``token_table.synthetic`` uses, so DuckDB reproduces it), packing runs
independently per (source, shard), and each shard drops at most one
partial tail sequence. Waste is bounded by ``n_shards · (seq_len−1)``
tokens — at 100 TB with 4096 shards of 2048-token sequences that is
< 32 MB, i.e. zero.

Plan shape (the part that must survive 100×): ONE shuffle of the token
payload, on (source, shard). The offset window, the boundary split
(``explode`` over the 1–2 sequences a doc spans), and the final
assemble-aggregation all share that clustering, so Spark reuses the
exchange — ``tests/test_packing.py`` pins exactly one Exchange in the
physical plan. Assembly is ``sort_array(collect_list(struct(off,
piece)))`` + ``flatten`` per sequence: group state is seq_len tokens
plus O(docs-per-sequence) struct overhead, bounded.

Reference analog: the bronze→silver batching in
``libs/hoopstat-data/hoopstat_data/transformation.py`` batches rows for
load; packing is the token-level equivalent a training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hoopstat_haus_spark.tables.token_table import _MULT

_SHARD_PRIME = 982451653
# (d*M) mod P == ((d mod P)*(M mod P)) mod P — reducing both factors first
# keeps every shard assignment identical while bounding the int64 product
# at (P-1)*(M mod P) ≈ 6.8e17, ANSI-safe for ANY doc number (the bare
# d*M form overflowed past doc numbers ≈ 3.47e9).
_MULT_RED = _MULT % _SHARD_PRIME


def _doc_num(col: str = "doc_id") -> Column:
    """The numeric suffix of 'doc-%0Nd' ids — int64."""
    return F.substring(F.col(col), 5, 12).cast("long")


def shard_expr(n_shards: int) -> Column:
    """Deterministic shard in [0, n_shards): multiplicative hash of the
    doc number, reproducible in ANSI SQL (mirrored in
    :func:`packed_sequences_sql`); overflow-safe for any int64 doc
    number via factor reduction mod :data:`_SHARD_PRIME`."""
    return F.pmod(
        (F.pmod(_doc_num(), F.lit(_SHARD_PRIME)) * F.lit(_MULT_RED)) % F.lit(_SHARD_PRIME),
        F.lit(n_shards),
    )


def pack_sequences(
    tokens_df: DataFrame, seq_len: int, n_shards: int = 64, pad_id: int | None = None
) -> DataFrame:
    """Pack the token table into fixed-length sequences.

    Returns (seq_id string, source, shard int, seq_idx long,
    tokens array<int> of EXACTLY ``seq_len``, n_docs int — how many
    documents contributed, doc_spans array<struct<pos:int, n:int>> —
    each contributing doc's offset and length within the sequence, in
    order, covering it exactly: the boundary metadata an attention
    mask / loss mask needs to stop cross-document attention after
    packing). Output is a pure function of
    (input content, seq_len, n_shards): docs order by doc_id within
    their shard, so re-runs and different cluster sizes produce
    byte-identical sequences — required for reproducible training data.

    Each shard's trailing partial sequence is dropped (bounded waste,
    see module docstring); pass ``pad_id`` to keep it instead, padded to
    ``seq_len`` (its true length is recoverable from ``doc_spans`` —
    span positions/lengths never cover the padding).

    Size ``n_shards`` so a shard's token payload fits one task
    comfortably (~64–256 MB); the default 64 suits test/bench scale.
    """
    if seq_len < 1 or n_shards < 1:
        raise ValueError("seq_len and n_shards must be >= 1")
    L = F.lit(seq_len)
    d = (
        tokens_df.filter(F.col("n_tok") > 0)  # empty docs span no sequence
        .select("doc_id", "tokens", F.col("n_tok").cast("long").alias("n_tok"), "source")
        .withColumn("shard", shard_expr(n_shards))
    )
    # one explicit shuffle on the packing keys; window + groupBy below
    # reuse this exchange (plan-asserted)
    d = d.repartition("source", "shard")
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("off", F.sum("n_tok").over(w) - F.col("n_tok"))
    # a doc spans sequences floor(off/L) .. floor((off+n_tok-1)/L);
    # explode that (usually 1-2 element) range and slice its piece
    # integer DIV keeps the boundary math exact (no double rounding)
    d = d.withColumn(
        "seq_idx",
        F.explode(
            F.sequence(
                F.expr(f"off DIV {seq_len}"), F.expr(f"(off + n_tok - 1) DIV {seq_len}")
            )
        ),
    )
    piece_start = F.greatest(F.col("seq_idx") * L - F.col("off"), F.lit(0))  # 0-based within doc
    piece_end = F.least((F.col("seq_idx") + 1) * L, F.col("off") + F.col("n_tok")) - F.col("off")
    pos_in_seq = F.greatest(F.col("off") - F.col("seq_idx") * L, F.lit(0))  # 0-based within seq
    d = d.select(
        "source",
        "shard",
        "seq_idx",
        "off",
        F.slice("tokens", (piece_start + 1).cast("int"), (piece_end - piece_start).cast("int")).alias("piece"),
        pos_in_seq.cast("int").alias("pos"),
        (piece_end - piece_start).cast("int").alias("n"),
    )
    assembled = F.sort_array(F.collect_list(F.struct("off", "piece", "pos", "n")))
    seqs = (
        d.groupBy("source", "shard", "seq_idx")
        .agg(
            F.flatten(assembled.piece).alias("tokens"),
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.transform(assembled, lambda x: F.struct(x.pos.alias("pos"), x.n.alias("n"))).alias(
                "doc_spans"
            ),
        )
    )
    if pad_id is None:
        seqs = seqs.filter(F.size("tokens") == seq_len)  # drop each shard's partial tail
    else:
        # keep the tail, padded to seq_len; complete sequences pad zero
        # elements (array_repeat with a non-positive count is empty)
        seqs = seqs.withColumn(
            "tokens",
            F.concat(
                "tokens",
                F.array_repeat(F.lit(int(pad_id)).cast("int"), seq_len - F.size("tokens")),
            ),
        )
    return seqs.select(
        F.format_string("%s-%05d-%08d", "source", "shard", "seq_idx").alias("seq_id"),
        "source",
        F.col("shard").cast("int").alias("shard"),
        "seq_idx",
        "tokens",
        "n_docs",
        "doc_spans",
    )


def packing_report(tokens_df: DataFrame, seq_len: int, n_shards: int = 64) -> DataFrame:
    """Per-source packing yield WITHOUT running the pack: a shard group
    drops exactly ``total_tokens % seq_len`` (the invariant
    ``tests/test_packing.py`` pins), so the report is a skinny
    (doc_id, n_tok, source) aggregate — no token payload read.

    Returns (source, total_tokens, packed_tokens, waste_tokens,
    n_sequences, n_shards_used). Check ``waste_tokens/total_tokens``
    before packing a small corpus with many shards — the repo's
    no-silent-caps rule: the tail drop is bounded but NOT zero, and
    over-sharding a tiny corpus can eat a large fraction."""
    L = seq_len
    per_shard = (
        tokens_df.filter(F.col("n_tok") > 0)
        .select("source", F.col("n_tok").cast("long").alias("n_tok"), shard_expr(n_shards).alias("shard"))
        .groupBy("source", "shard")
        .agg(F.sum("n_tok").alias("t"))
    )
    return (
        per_shard.groupBy("source")
        .agg(
            F.sum("t").alias("total_tokens"),
            F.sum(F.expr(f"(t DIV {L}) * {L}")).alias("packed_tokens"),
            F.sum(F.expr(f"t % {L}")).alias("waste_tokens"),
            F.sum(F.expr(f"t DIV {L}")).alias("n_sequences"),
            F.count(F.lit(1)).cast("int").alias("n_shards_used"),
        )
        .orderBy("source")
    )


def shuffle_sequences(seqs: DataFrame, n_out_shards: int, salt: str = "shuf") -> DataFrame:
    """Deterministic global shuffle of packed sequences for training
    order: every sequence gets a content-keyed u64 sort key
    (``xxhash64(seq_id, salt-hash)``), routes to output shard
    ``key % n_out_shards``, and sorts by key within its shard — reading
    the shards in order yields a fixed pseudo-random permutation of the
    corpus (same multiset, reproducible across runs and cluster sizes).

    Packing groups sequences by (source, shard); training must NOT see
    that order (a whole source in a row = catastrophic curriculum
    skew). One shuffle on ``_out_shard`` + a post-shuffle sort — no
    global ``orderBy`` (whose range sampler would re-execute the child;
    see CLAUDE.md), and shard sizes are uniform to within sampling
    noise, so downstream readers load-balance."""
    if n_out_shards < 1:
        raise ValueError("n_out_shards must be >= 1")
    key = F.xxhash64(F.col("seq_id"), F.lit(_salt_seed(salt)))
    return (
        seqs.withColumn("_shuffle_key", key)
        .withColumn("_out_shard", F.pmod(F.col("_shuffle_key"), F.lit(n_out_shards)).cast("int"))
        .repartition(n_out_shards, "_out_shard")
        .sortWithinPartitions("_out_shard", "_shuffle_key", "seq_id")
        # _out_shard stays (it IS the shard identity a reader needs);
        # the key is pure recomputable noise — written verbatim by the
        # corpus CLI it would add 8 dead bytes per training sequence.
        # The projection is deterministic, so the sorted order survives.
        .drop("_shuffle_key")
    )


def _salt_seed(salt: str) -> int:
    """Stable int64 seed from a salt string (md5 head, sign-safe)."""
    import hashlib

    return int.from_bytes(hashlib.md5(salt.encode()).digest()[:8], "big", signed=True)


def packed_sequences_sql(seq_len: int, n_shards: int, tok_inner: str) -> str:
    """DuckDB SQL producing the same rows as :func:`pack_sequences` over
    the same token table (``tok_inner`` = a derived-table SQL string,
    e.g. ``documents_token_sql()``). Used by the parity tests; splice
    into ``SELECT ... FROM {packed_sequences_sql(...)} p``."""
    return f"""(
      WITH d AS (
        SELECT doc_id, tokens, CAST(n_tok AS BIGINT) AS n_tok, source,
               (((CAST(substring(doc_id, 5, 12) AS BIGINT) % {_SHARD_PRIME}) * {_MULT_RED}) % {_SHARD_PRIME}) % {n_shards} AS shard
        FROM {tok_inner}
      ), o AS (
        -- DuckDB windowed SUM(BIGINT) yields HUGEINT; pin BIGINT
        SELECT *, CAST(SUM(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS off
        FROM d
      ), pieces AS (
        SELECT source, shard, seq_idx, off,
               list_slice(tokens,
                          CAST(GREATEST(seq_idx * {seq_len} - off, 0) + 1 AS BIGINT),
                          CAST(LEAST((seq_idx + 1) * {seq_len}, off + n_tok) - off AS BIGINT)) AS piece,
               CAST(GREATEST(off - seq_idx * {seq_len}, 0) AS INT) AS pos,
               CAST(LEAST((seq_idx + 1) * {seq_len}, off + n_tok)
                    - GREATEST(seq_idx * {seq_len}, off) AS INT) AS n
        FROM o, UNNEST(range(off // {seq_len}, (off + n_tok - 1) // {seq_len} + 1)) AS t(seq_idx)
      )
      SELECT printf('%s-%05d-%08d', source, CAST(shard AS INT), seq_idx) AS seq_id,
             source, CAST(shard AS INT) AS shard, seq_idx,
             flatten(list(piece ORDER BY off)) AS tokens,
             CAST(COUNT(*) AS INT) AS n_docs,
             list(struct_pack(pos := pos, n := n) ORDER BY off) AS doc_spans
      FROM pieces
      GROUP BY source, shard, seq_idx
      HAVING len(flatten(list(piece ORDER BY off))) = {seq_len}
    )"""
