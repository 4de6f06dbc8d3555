#!/usr/bin/env python
"""Scale the driver's sf0.1 testdata by an integer factor (default 10) to an
sf1-equivalent directory, preserving join cardinality ratios and dup/near-dup
structure (VERDICT r6 "Next round" #1: prove the 2x target at 10x scale).

Scaling model — each scaled table is the union of F copies with per-copy key
remapping so foreign keys stay consistent and per-key densities match TPC-H's
own scaling behavior:

* region/nation: fixed (TPC-H keeps them constant across SF).
* customer/supplier/part/orders/lineitem: primary + foreign keys offset by
  copy * span(table) so orders⋈customer, lineitem⋈orders/part/supplier all
  keep exactly the sf0.1 fan-outs.
* events: event_id/user_id offset (per-user event density unchanged — the
  realistic scaling for sessionization); ts window unchanged (denser stream).
* documents: doc_id offset; copy c>0 applies a per-copy Caesar shift to the
  text's letters. Within a copy the corpus's duplicate/near-duplicate
  structure is preserved exactly (dedup pair count scales linearly, as a
  real 10x corpus would); across copies every word — hence every word
  shingle (operators/dedup.py:73) — differs, so no artificial cross-copy
  near-dups inflate LSH band buckets superlinearly. Length/whitespace
  statistics are untouched, so text_stats sees identical per-row work.
* embeddings: vec_id offset; copies get a deterministic per-element jitter
  (~1e-3 relative) so vectors are distinct but the distribution — and
  therefore top-k pruning behavior — is unchanged.

Everything runs JVM-side (pure Catalyst expressions, one write per table);
no row data touches the driver.
"""

from __future__ import annotations

import argparse
import os
import string
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES_FIXED = ("region", "nation")
# table -> (primary key col, span) filled at runtime; fk remaps reference it.
KEYED = ("customer", "supplier", "part", "orders")


def _span(df: DataFrame, key: str) -> int:
    # max+1 keeps offsets collision-free even with sparse key spaces
    return int(df.agg(F.max(key)).first()[0]) + 1


def _copies(spark: SparkSession, factor: int) -> DataFrame:
    return spark.range(factor).select(F.col("id").cast("long").alias("_copy"))


def _caesar_maps(copy: int) -> tuple[str, str]:
    """translate() mapping for a per-copy letter substitution (identity at
    c=0). A seeded full permutation, NOT a rotation: the old ``copy % 25``
    shift made copies c and c+25 identical, so factor>=26 runs carried
    cross-copy exact duplicates that inflated dedup pair counts (caught by
    the r8 factor-30 probe, SCALE_AUDIT_r8.json). Length/whitespace
    statistics are still untouched."""
    import random

    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    if copy == 0:
        return lower + upper, lower + upper
    perm = list(lower)
    random.Random(copy).shuffle(perm)
    # a shuffle can fix points, but two copies colliding on the whole
    # 26-letter permutation is ~1/26! — no cross-copy dup structure
    mapped = "".join(perm)
    return lower + upper, mapped + mapped.upper()


def scale(spark: SparkSession, sf_dir: str, out_dir: str, factor: int,
          tables: set | None = None) -> None:
    """``tables`` restricts generation (probe runs that only touch a few
    tables skip the heavy lineitem/orders copies); None = all."""
    want = (lambda t: True) if tables is None else (lambda t: t in tables)
    os.makedirs(out_dir, exist_ok=True)
    read = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
    pk = {"customer": "c_custkey", "supplier": "s_suppkey",
          "part": "p_partkey", "orders": "o_orderkey"}
    spans = {t: _span(read(t), pk[t]) for t in KEYED}
    copies = _copies(spark, factor)

    def off(col: str, table: str) -> F.Column:
        return (F.col(col) + F.col("_copy") * F.lit(spans[table])).alias(col)

    def write(df: DataFrame, name: str, parts: int) -> None:
        # single flat file per table to mirror the driver's layout
        tmp = f"{out_dir}/_tmp_{name}"
        df.repartition(parts).write.mode("overwrite").parquet(tmp)
        import glob as _g
        import shutil

        files = sorted(_g.glob(f"{tmp}/part-*.parquet"))
        if len(files) == 1:
            shutil.move(files[0], f"{out_dir}/{name}.parquet")
            shutil.rmtree(tmp)
        else:  # keep as directory; spark.read.parquet handles both
            dest = f"{out_dir}/{name}.parquet"
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            shutil.move(tmp, dest)
        print(f"  wrote {name} x{factor}")

    for t in TABLES_FIXED:
        if want(t):
            write(read(t), t, 1)

    if want('customer'):
        cust = read("customer").crossJoin(copies)
        write(
            cust.select(off("c_custkey", "customer"), "c_name", "c_nationkey",
                        "c_acctbal", "c_mktsegment"),
            "customer", 1,
        )
    if want('supplier'):
        sup = read("supplier").crossJoin(copies)
        write(
            sup.select(off("s_suppkey", "supplier"), "s_name", "s_nationkey",
                       "s_acctbal"),
            "supplier", 1,
        )
    if want('part'):
        part = read("part").crossJoin(copies)
        write(
            part.select(off("p_partkey", "part"), "p_name", "p_brand", "p_type",
                        "p_size", "p_retailprice"),
            "part", 1,
        )
    if want('orders'):
        orders = read("orders").crossJoin(copies)
        write(
            orders.select(off("o_orderkey", "orders"), off("o_custkey", "customer"),
                          "o_orderstatus", "o_totalprice", "o_orderdate",
                          "o_orderpriority"),
            "orders", 2,
        )
    if want('lineitem'):
        li = read("lineitem").crossJoin(copies)
        write(
            li.select(off("l_orderkey", "orders"), off("l_partkey", "part"),
                      off("l_suppkey", "supplier"), "l_linenumber", "l_quantity",
                      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                      "l_linestatus", "l_shipdate"),
            "lineitem", 8,
        )

    if want('events'):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").crossJoin(copies)
        ev_span_e = int(ev.agg(F.max("event_id")).first()[0]) + 1
        ev_span_u = int(ev.agg(F.max("user_id")).first()[0]) + 1
        write(
            ev.select(
                (F.col("event_id") + F.col("_copy") * F.lit(ev_span_e)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("_copy") * F.lit(ev_span_u)).alias("user_id"),
                "event_type", "value", "props",
            ),
            "events", 2,
        )

    if want('documents'):
        docs = read("documents")
        doc_span = int(docs.agg(F.max("doc_id")).first()[0]) + 1
        shifted = None
        for c in range(factor):
            src, dst = _caesar_maps(c)
            piece = docs.select(
                (F.col("doc_id") + F.lit(c * doc_span)).alias("doc_id"),
                (F.col("text") if c == 0 else F.translate("text", src, dst)).alias("text"),
                "lang", "source", "n_chars",
            )
            shifted = piece if shifted is None else shifted.unionAll(piece)
        write(shifted, "documents", 1)

    if want('embeddings'):
        emb = read("embeddings")
        emb_span = int(emb.agg(F.max("vec_id")).first()[0]) + 1
        emb10 = emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("_copy") * F.lit(emb_span)).alias("vec_id"),
            F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(
                F.expr(
                    "transform(embedding, (x, i) -> cast(x * (1.0d + "
                    "(pmod(xxhash64(vec_id, _copy, i), 2001) - 1000) * 1.0e-6) as float))"
                )
            ).alias("embedding"),
            "label",
        )
        write(emb10, "embeddings", 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--tables", default="",
                    help="comma list to restrict generation (default: all)")
    args = ap.parse_args()

    from datafusion_spatial_spark.session import get_spark

    spark = get_spark(app_name="scale_data")
    scale(spark, args.sf_dir, args.out, args.factor,
          tables=set(args.tables.split(",")) if args.tables else None)
    spark.stop()


if __name__ == "__main__":
    main()
