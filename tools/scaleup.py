#!/usr/bin/env python3
"""Driver-side scale-up tool: clone an sf directory N× with key
remapping (TPC-H-style "database cloning") so the full gauntlet can be
proven at sf1+ without regenerating the corpus.

Usage: python3 tools/scaleup.py <srcDir> <dstDir> <copies>

Fidelity rules (what makes the clone an honest scale-up rather than a
degenerate one):
- Fact/dim keys get a per-copy offset with strides far above the source
  maxima, so referential integrity (orders->customer,
  lineitem->orders/part/supplier) holds and per-copy key distributions
  are preserved. region/nation keep a single copy: their key domains
  (0-4 / 0-24) are closed vocabularies every copy must share.
- documents.text would otherwise yield N exact copies of every doc,
  scaling near-dup PAIR counts x N^2 instead of x N. Copies >0 get a
  per-copy vocabulary tag on non-stopword words (w -> w || chr(97+i)),
  which keeps length/stopword/quality statistics while making
  cross-copy shingle overlap ~zero, so dup structure scales linearly
  like a real corpus. n_chars is recomputed from the tagged text.
- embeddings get a per-copy circular rotation of dimensions
  (shift = 7*i mod dim): exact, norm-preserving, intra-copy cosine
  structure identical, cross-copy cosine decorrelated.
- events.ts must stay parquet TIMESTAMP(NANOS) (the engine's reader
  exercises the nanos path deliberately), so events is written through
  pyarrow with an explicit timestamp('ns') schema; everything else goes
  through DuckDB COPY.
"""
import sys
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

# Mirrors graft.operators.TextAnalysis stop lists (union of en/fr/de/es).
STOP = sorted({
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
    "le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans",
    "der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit",
    "el", "y", "es", "por", "con",
})

CUST, SUPP, PART, ORD, EVT, USR, DOC, VEC = (
    1_000_000, 1_000_000, 1_000_000, 10_000_000, 10_000_000,
    1_000_000, 1_000_000, 1_000_000)


def main(src: str, dst: str, n: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    stop_sql = "[" + ",".join(f"'{w}'" for w in STOP) + "]"

    def clone(table: str, select: str) -> None:
        q = (f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet') t, "
             f"range({n}) c(i) ORDER BY c.i) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        con.execute(q)
        print(f"[scaleup] {table}: x{n}")

    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                    f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"[scaleup] {t}: single copy (closed key domain)")

    clone("customer",
          f"c_custkey + c.i*{CUST} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    clone("supplier",
          f"s_suppkey + c.i*{SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    clone("part",
          f"p_partkey + c.i*{PART} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    clone("orders",
          f"o_orderkey + c.i*{ORD} AS o_orderkey, o_custkey + c.i*{CUST} AS o_custkey, "
          f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    clone("lineitem",
          f"l_orderkey + c.i*{ORD} AS l_orderkey, l_partkey + c.i*{PART} AS l_partkey, "
          f"l_suppkey + c.i*{SUPP} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
          f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    clone("documents",
          f"doc_id + c.i*{DOC} AS doc_id, "
          f"array_to_string(list_transform(string_split(text, ' '), "
          f"  w -> CASE WHEN c.i = 0 OR list_contains({stop_sql}, w) THEN w "
          f"       ELSE w || chr((97 + c.i)::INTEGER) END), ' ') AS text, "
          f"lang, source, 0::BIGINT AS n_chars")
    con.execute(f"""
        COPY (SELECT doc_id, text, lang, source, length(text)::BIGINT AS n_chars
              FROM read_parquet('{dst}/documents.parquet'))
        TO '{dst}/documents.tmp.parquet' (FORMAT PARQUET)""")
    import shutil
    shutil.move(f"{dst}/documents.tmp.parquet", f"{dst}/documents.parquet")
    clone("embeddings",
          f"vec_id + c.i*{VEC} AS vec_id, "
          f"CAST(list_slice(embedding, (7*c.i) % len(embedding) + 1, len(embedding)) "
          f"  || list_slice(embedding, 1, (7*c.i) % len(embedding)) AS FLOAT[]) AS embedding, "
          f"label")

    # events: go through pyarrow to keep ts as parquet TIMESTAMP(NANOS).
    ev = con.execute(
        f"SELECT event_id + c.i*{EVT} AS event_id, epoch_ns(ts)::BIGINT AS ts_ns, "
        f"user_id + c.i*{USR} AS user_id, event_type, value, props "
        f"FROM read_parquet('{src}/events.parquet') t, range({n}) c(i) ORDER BY c.i"
    ).fetch_arrow_table()
    schema = pa.schema([
        pa.field("event_id", pa.int64()),
        pa.field("ts", pa.timestamp("ns")),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
        pa.field("props", pa.string()),
    ])
    out = pa.table({
        "event_id": ev.column("event_id"),
        "ts": ev.column("ts_ns").cast(pa.timestamp("ns")),
        "user_id": ev.column("user_id"),
        "event_type": ev.column("event_type"),
        "value": ev.column("value"),
        "props": ev.column("props"),
    }, schema=schema)
    pq.write_table(out, f"{dst}/events.parquet",
                   coerce_timestamps=None, row_group_size=200_000)
    print(f"[scaleup] events: x{n} (ts kept TIMESTAMP_NS)")
    print("[scaleup] done")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
